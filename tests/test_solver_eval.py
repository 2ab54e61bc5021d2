"""Solver schedule/masking tests and evaluator golden cases."""

import numpy as np
import jax
import jax.numpy as jnp

from fewshotobjectdetection_imporove_via_text_feature_tpu.config import get_cfg
from fewshotobjectdetection_imporove_via_text_feature_tpu.solver import (
    build_lr_scheduler,
    build_optimizer,
)
from fewshotobjectdetection_imporove_via_text_feature_tpu.evaluation.voc_eval import (
    voc_ap,
    voc_eval_class,
)
from fewshotobjectdetection_imporove_via_text_feature_tpu.evaluation.coco_eval import (
    evaluate_coco_detections,
)


def test_warmup_multistep_schedule():
    cfg = get_cfg()
    cfg.SOLVER.BASE_LR = 0.02
    cfg.SOLVER.STEPS = (100, 200)
    cfg.SOLVER.GAMMA = 0.1
    cfg.SOLVER.WARMUP_ITERS = 10
    cfg.SOLVER.WARMUP_FACTOR = 0.001
    sched = jax.jit(build_lr_scheduler(cfg))
    vals = [float(sched(jnp.asarray(i))) for i in (0, 5, 50, 150, 250)]
    assert np.isclose(vals[0], 0.02 * 0.001, rtol=1e-3)
    assert vals[1] < 0.02
    assert np.isclose(vals[2], 0.02)
    assert np.isclose(vals[3], 0.002)
    assert np.isclose(vals[4], 0.0002, rtol=1e-5)


def test_optimizer_freezes_bn_and_frozen_stages():
    cfg = get_cfg()
    cfg.MODEL.BACKBONE.FREEZE_AT = 2
    params = {
        "backbone": {
            "stem_conv1": {"kernel": jnp.ones((3, 3, 3, 8))},
            "stem_bn1": {
                "weight": jnp.ones(8),
                "bias": jnp.zeros(8),
                "running_mean": jnp.zeros(8),
                "running_var": jnp.ones(8),
            },
            "res2": {"block0": {"conv1": {"kernel": jnp.ones((1, 1, 8, 8))}}},
            "res3": {"block0": {"conv1": {"kernel": jnp.ones((1, 1, 8, 8))}}},
        },
        "rpn_head": {"conv": {"kernel": jnp.ones((3, 3, 8, 8)), "bias": jnp.zeros(8)}},
    }
    tx, _ = build_optimizer(cfg, params)
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    # frozen: stem (freeze_at>=1), res2 (>=2), all bn
    assert float(jnp.abs(updates["backbone"]["stem_conv1"]["kernel"]).sum()) == 0
    assert float(jnp.abs(updates["backbone"]["stem_bn1"]["weight"]).sum()) == 0
    assert float(jnp.abs(updates["backbone"]["res2"]["block0"]["conv1"]["kernel"]).sum()) == 0
    # live: res3, rpn
    assert float(jnp.abs(updates["backbone"]["res3"]["block0"]["conv1"]["kernel"]).sum()) > 0
    assert float(jnp.abs(updates["rpn_head"]["conv"]["kernel"]).sum()) > 0


def test_voc_ap_formulas():
    rec = np.array([0.5, 1.0])
    prec = np.array([1.0, 1.0])
    assert np.isclose(voc_ap(rec, prec, use_07_metric=False), 1.0)
    # 11-point: t=0..1 all have max prec 1 -> 1.0
    assert np.isclose(voc_ap(rec, prec, use_07_metric=True), 1.0)
    # a case where the two conventions DIFFER, so a swapped/ignored
    # use_07_metric cannot pass: recall stops at 0.5 with precision 1
    rec = np.array([0.5])
    prec = np.array([1.0])
    assert np.isclose(voc_ap(rec, prec, use_07_metric=False), 0.5)
    # 11-point: t in {0, .1, ..., .5} see max prec 1, the rest 0 -> 6/11
    assert np.isclose(voc_ap(rec, prec, use_07_metric=True), 6.0 / 11.0)


def test_voc_eval_class_perfect_and_difficult():
    gt = {
        "img1": {
            "bbox": np.array([[10.0, 10.0, 50.0, 50.0], [60.0, 60.0, 90.0, 90.0]]),
            "difficult": np.array([False, True]),
        }
    }
    dets = [("img1", 0.9, 10.0, 10.0, 50.0, 50.0)]
    rec, prec, ap = voc_eval_class(dets, gt, 0.5, use_07_metric=False)
    assert np.isclose(ap, 1.0)  # difficult GT doesn't count toward npos

    # detection on difficult GT: neither tp nor fp -> still perfect
    dets2 = dets + [("img1", 0.8, 60.0, 60.0, 90.0, 90.0)]
    _, _, ap2 = voc_eval_class(dets2, gt, 0.5, use_07_metric=False)
    assert np.isclose(ap2, 1.0)

    # plain false positive halves precision at rank 1 but AP stays 1 since
    # the TP comes first
    dets3 = dets + [("img1", 0.1, 200.0, 200.0, 300.0, 300.0)]
    _, _, ap3 = voc_eval_class(dets3, gt, 0.5, use_07_metric=False)
    assert np.isclose(ap3, 1.0)

    # duplicate detection ranked between two TPs is a FP and lowers AP
    gt2 = {
        "img1": {
            "bbox": np.array([[10.0, 10.0, 50.0, 50.0]]),
            "difficult": np.array([False]),
        },
        "img2": {
            "bbox": np.array([[10.0, 10.0, 50.0, 50.0]]),
            "difficult": np.array([False]),
        },
    }
    dets4 = [
        ("img1", 0.9, 10.0, 10.0, 50.0, 50.0),
        ("img1", 0.85, 11.0, 11.0, 51.0, 51.0),  # duplicate -> FP
        ("img2", 0.8, 10.0, 10.0, 50.0, 50.0),
    ]
    _, _, ap4 = voc_eval_class(dets4, gt2, 0.5, use_07_metric=False)
    assert np.isclose(ap4, 0.5 * 1.0 + 0.5 * (2.0 / 3.0))


def test_coco_eval_perfect():
    gt = {
        "a": [{"bbox": [10, 10, 60, 60], "category_id": 0, "iscrowd": 0}],
        "b": [{"bbox": [20, 20, 100, 120], "category_id": 1, "iscrowd": 0}],
    }
    dets = {
        "a": (np.array([[10.0, 10, 60, 60]]), np.array([0.9]), np.array([0])),
        "b": (np.array([[20.0, 20, 100, 120]]), np.array([0.8]), np.array([1])),
    }
    res = evaluate_coco_detections(gt, dets, [0, 1])
    assert np.isclose(res["AP"], 100.0)
    assert np.isclose(res["AP50"], 100.0)


def test_coco_eval_localization_threshold():
    # det with IoU ~0.6: counts at IoU<=0.6 thresholds only
    gt = {"a": [{"bbox": [0, 0, 100, 100], "category_id": 0, "iscrowd": 0}]}
    dets = {
        "a": (np.array([[0.0, 0, 100, 60]]), np.array([0.9]), np.array([0]))
    }
    res = evaluate_coco_detections(gt, dets, [0])
    assert np.isclose(res["AP50"], 100.0)
    assert np.isclose(res["AP75"], 0.0)
    assert 0 < res["AP"] < 100.0


def test_coco_json_dump_is_xywh(tmp_path):
    """coco_instances_results.json must use the COCO XYWH convention
    (reference dumps via d2 instances_to_coco_json; our visualizer and any
    pycocotools consumer rely on it)."""
    import json
    import os

    import numpy as np

    from fewshotobjectdetection_imporove_via_text_feature_tpu.evaluation.coco_eval import (
        COCOEvaluator,
    )

    class _Meta:
        thing_classes = ["a", "b"]

        def get(self, key, default=None):
            return {7: 0, 9: 1} if key == "thing_dataset_id_to_contiguous_id" else default

    ev = COCOEvaluator.__new__(COCOEvaluator)
    ev._meta = _Meta()
    ev._gt_by_image = {
        "img1": [{"bbox": [10, 20, 50, 80], "category_id": 0, "iscrowd": 0}]
    }
    ev._output_dir = str(tmp_path)
    ev.reset()
    ev.process_detections(
        ["img1"],
        np.asarray([[[10.0, 20.0, 50.0, 80.0]]]),
        np.asarray([[0.9]]),
        np.asarray([[1]]),
        np.asarray([[True]]),
    )
    ev.evaluate()
    dump = json.load(open(os.path.join(tmp_path, "coco_instances_results.json")))
    assert dump == [
        {
            "image_id": "img1",
            "category_id": 9,  # contiguous 1 -> dataset id 9
            "bbox": [10.0, 20.0, 40.0, 60.0],  # XYWH
            "score": 0.9,
        }
    ]


def test_trainer_test_method(tmp_path, monkeypatch):
    """DefaultTrainer.test parity: trainer.test() evaluates DATASETS.TEST."""
    import sys

    sys.path.insert(0, ".")
    from test_end_to_end import setup_dataset, tiny_cfg

    setup_dataset(str(tmp_path))
    cfg = tiny_cfg(tmp_path)
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    from fewshotobjectdetection_imporove_via_text_feature_tpu.engine import (
        Trainer,
    )

    tr = Trainer(cfg)
    tr.train()
    res = tr.test()
    assert "e2e_voc_2007_test_all1" in res
    assert "AP50" in res["e2e_voc_2007_test_all1"]["bbox"]


def test_optimizer_freeze_switches_match_novel_finetune_recipe():
    """The few-shot fine-tune freeze contract (novel configs set
    MODEL.BACKBONE.FREEZE + MODEL.RPN.FREEZE + MODEL.ROI_HEADS.FREEZE_FEAT,
    ref rcnn.py:38-50 requires_grad=False): rpn_head and roi_heads/res5
    receive exactly zero updates; the box predictor still trains."""
    cfg = get_cfg()
    cfg.MODEL.BACKBONE.FREEZE = True
    cfg.MODEL.RPN.FREEZE = True
    cfg.MODEL.ROI_HEADS.FREEZE_FEAT = True
    params = {
        "backbone": {
            "res4": {"block0": {"conv1": {"kernel": jnp.ones((1, 1, 8, 8))}}},
        },
        "rpn_head": {
            "conv": {"kernel": jnp.ones((3, 3, 8, 8)), "bias": jnp.zeros(8)},
        },
        "roi_heads": {
            "res5": {"res5": {"block0": {"conv1": {"kernel": jnp.ones((1, 1, 8, 8))}}}},
            "box_predictor": {
                "cls_score": {"kernel": jnp.ones((8, 5)), "bias": jnp.zeros(5)},
            },
        },
        "affine_rcnn": {"weight": jnp.ones(8), "bias": jnp.zeros(8)},
    }
    tx, _ = build_optimizer(cfg, params)
    updates, _ = tx.update(
        jax.tree_util.tree_map(jnp.ones_like, params), tx.init(params), params
    )

    def tot(t):
        return float(
            sum(jnp.abs(v).sum() for v in jax.tree_util.tree_leaves(t))
        )

    assert tot(updates["backbone"]) == 0          # BACKBONE.FREEZE -> all
    assert tot(updates["rpn_head"]) == 0          # RPN.FREEZE
    assert tot(updates["roi_heads"]["res5"]) == 0  # FREEZE_FEAT
    assert tot(updates["roi_heads"]["box_predictor"]) > 0
    assert tot(updates["affine_rcnn"]) > 0        # GDL affine stays live


def test_norm_params_get_weight_decay_norm_group():
    """d2 build_optimizer puts norm-module params (weight AND bias) in the
    WEIGHT_DECAY_NORM group at plain BASE_LR (ref solver/build.py:94-128):
    with zero gradients, decay alone drives the update — zero for norm
    params (WEIGHT_DECAY_NORM=0.0) and nonzero for regular/bias params."""
    import optax

    cfg = get_cfg()
    cfg.MODEL.BACKBONE.FREEZE_AT = 0
    cfg.SOLVER.WARMUP_ITERS = 0
    params = {
        "roi_heads": {
            "attention": {
                "ffn": {
                    "linear1": {
                        "kernel": jnp.ones((4, 4)), "bias": jnp.ones((4,))
                    },
                    "norm3": {
                        "scale": jnp.ones((4,)), "bias": jnp.ones((4,))
                    },
                },
            },
        },
    }
    tx, _ = build_optimizer(cfg, params)
    state = tx.init(params)
    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    upd, _ = tx.update(zeros, state, params)
    ffn = upd["roi_heads"]["attention"]["ffn"]
    # regular weight + bias decay (5e-5 each by default)
    assert float(jnp.abs(ffn["linear1"]["kernel"]).sum()) > 0
    assert float(jnp.abs(ffn["linear1"]["bias"]).sum()) > 0
    # LayerNorm scale AND bias: WEIGHT_DECAY_NORM = 0.0 -> no update
    assert float(jnp.abs(ffn["norm3"]["scale"]).sum()) == 0
    assert float(jnp.abs(ffn["norm3"]["bias"]).sum()) == 0


def test_clip_each_param_norm_is_per_tensor():
    """CLIP_TYPE 'norm' clips each parameter's gradient norm independently
    (the reference registers every param as its own group, so
    clip_grad_norm_ acts per tensor) — NOT a global-norm rescale."""
    from fewshotobjectdetection_imporove_via_text_feature_tpu.solver.build import (
        _clip_each_param_norm,
    )

    tx = _clip_each_param_norm(1.0, 2.0)
    g = {
        "small": jnp.asarray([0.06, 0.08]),       # norm 0.1 -> untouched
        "big": jnp.asarray([3.0, 4.0]),           # norm 5.0 -> scaled to 1
    }
    out, _ = tx.update(g, tx.init(g))
    np.testing.assert_allclose(np.asarray(out["small"]), [0.06, 0.08])
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out["big"])), 1.0, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out["big"]) / np.asarray([3.0, 4.0]),
        [0.2, 0.2], rtol=1e-4,
    )


def test_config_bool_coercion_and_type_mismatch():
    """yacs-style type safety: lowercase 'false' parses to False instead
    of becoming a truthy string; garbage for a typed value raises."""
    import pytest

    cfg = get_cfg()
    cfg.merge_from_list(["MODEL.RPN.FREEZE", "false"])
    assert cfg.MODEL.RPN.FREEZE is False
    cfg.merge_from_list(["MODEL.RPN.FREEZE", "True"])
    assert cfg.MODEL.RPN.FREEZE is True
    with pytest.raises(ValueError):
        cfg.merge_from_list(["MODEL.RPN.FREEZE", "maybe"])
    with pytest.raises(ValueError):
        cfg.merge_from_list(["SOLVER.BASE_LR", "fast"])
