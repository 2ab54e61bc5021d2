"""EvalHook contract (reference defrcn/engine/hooks.py:15-83
EvalHookDeFRCN): fires every `period` iterations and at the final
iteration, dumps flattened metrics to inference/iter_*.json and
res_final.json."""

import json
import os

from fewshotobjectdetection_imporove_via_text_feature_tpu.engine.hooks import (
    EvalHook,
    _flatten,
)


def _run(hook, max_iter):
    for it in range(max_iter):
        hook(it, params=None)


def test_eval_hook_period_and_final(tmp_path):
    calls = []

    def eval_fn(params):
        calls.append(1)
        return {"ds": {"bbox": {"AP50": 42.0, "AP": 21.0}}}

    hook = EvalHook(5, 12, str(tmp_path), eval_fn)
    _run(hook, 12)
    # periods at iterations 4 and 9 ((it+1) % 5 == 0), final at 11
    assert len(calls) == 3
    inf = tmp_path / "inference"
    names = sorted(os.listdir(inf))
    assert names == ["iter_0000004.json", "iter_0000009.json",
                     "res_final.json"]
    rec = json.load(open(inf / "res_final.json"))
    assert rec == {"ds/bbox/AP50": 42.0, "ds/bbox/AP": 21.0}


def test_eval_hook_period_zero_fires_final_only(tmp_path):
    calls = []
    hook = EvalHook(
        0, 8, str(tmp_path), lambda p: calls.append(1) or {"a": 1.0}
    )
    _run(hook, 8)
    assert len(calls) == 1
    assert os.listdir(tmp_path / "inference") == ["res_final.json"]


def test_eval_hook_period_boundary_no_double_fire(tmp_path):
    # final iteration also on the period boundary: one eval, named final
    calls = []
    hook = EvalHook(
        5, 10, str(tmp_path), lambda p: calls.append(1) or {"a": 1.0}
    )
    _run(hook, 10)
    assert len(calls) == 2  # iter 4 + final iter 9
    assert sorted(os.listdir(tmp_path / "inference")) == [
        "iter_0000004.json", "res_final.json",
    ]


def test_flatten_skips_non_numeric():
    flat = _flatten(
        {"a": {"b": 1, "c": "copypaste-string"}, "d": 2.5, "e": None}
    )
    assert flat == {"a/b": 1.0, "d": 2.5}
