"""Trace-profile the flagship model on the TPU and aggregate device time.

Usage:
    python tools/profile_step.py [--train] [--trace-dir /tmp/fsodtf_trace]

Runs the same program as bench.py (inference batch 8) or the production
train step (batch 16) under jax.profiler, then parses the chrome trace and
aggregates ``args.device_duration_ps`` by model stage (``args.tf_op``
prefix) and by ``args.hlo_category``. This is the recipe (NOTES.md) that
found the ROIAlign gather storm in round 1.

No reference analog (the reference has no profiler integration,
SURVEY.md §5.1); this is a TPU-native observability tool.
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_and_trace(train: bool, trace_dir: str, iters: int = 3) -> None:
    import jax
    import numpy as np

    import bench

    if train:
        from fewshotobjectdetection_imporove_via_text_feature_tpu.config import (
            get_cfg,
        )
        from fewshotobjectdetection_imporove_via_text_feature_tpu.engine.trainer import (
            make_train_step,
        )
        from fewshotobjectdetection_imporove_via_text_feature_tpu.models import (
            build_model,
        )
        from fewshotobjectdetection_imporove_via_text_feature_tpu.solver import (
            build_optimizer,
        )
        from fewshotobjectdetection_imporove_via_text_feature_tpu.structures import (
            GTInstances,
        )

        cfg = get_cfg()
        cfg.MODEL.ROI_HEADS.NUM_CLASSES = 20
        cfg.SOLVER.IMS_PER_BATCH = 16
        model = build_model(cfg)
        images = bench.make_inputs(16)
        rng = np.random.RandomState(0)
        g = cfg.TPU.MAX_GT
        boxes = rng.uniform(0, 400, (16, g, 4)).astype(np.float32)
        boxes = np.concatenate(
            [boxes[..., :2], boxes[..., :2] + 32 + boxes[..., 2:] * 0.2], -1
        )
        gt = GTInstances(
            boxes=boxes,
            classes=rng.randint(0, 20, (16, g)).astype(np.int32),
            valid=np.ones((16, g), bool),
        )
        variables = jax.jit(lambda r, i, t: model.init(r, i, t, train=True))(
            {
                "params": jax.random.PRNGKey(0),
                "sampling": jax.random.PRNGKey(1),
                "dropout": jax.random.PRNGKey(2),
            },
            images,
            gt,
        )
        params = variables["params"]
        tx, _ = build_optimizer(cfg, params)
        opt_state = tx.init(params)
        # donate like the real trainer (trainer.py) — without donation the
        # profile doubles params+momentum in HBM and shows allocation
        # behavior production never has
        step_fn = jax.jit(make_train_step(model, tx), donate_argnums=(0, 1))
        key = jax.random.PRNGKey(0)

        def run(i):
            nonlocal params, opt_state
            params, opt_state, losses = step_fn(
                params, opt_state, images, gt, key, i
            )
            jax.block_until_ready(losses)

    else:
        model = bench.build()
        images = bench.make_inputs(bench.BATCH)
        variables = jax.jit(lambda r, i: model.init(r, i, train=False))(
            {"params": jax.random.PRNGKey(0)}, images
        )
        apply_fn = jax.jit(lambda v, i: model.apply(v, i, train=False))

        def run(i):
            jax.block_until_ready(apply_fn(variables, images))

    run(0)  # compile
    run(1)  # warmup
    jax.profiler.start_trace(trace_dir)
    for i in range(iters):
        run(2 + i)
    jax.profiler.stop_trace()


def analyze(trace_dir: str, top: int = 25) -> None:
    paths = sorted(
        glob.glob(
            os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True
        ),
        key=os.path.getmtime,
    )
    if not paths:
        raise SystemExit(f"no trace under {trace_dir}")
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)

    by_stage = collections.Counter()
    by_cat = collections.Counter()
    by_op = collections.Counter()
    program_span = 0
    total = 0
    for ev in trace.get("traceEvents", []):
        args = ev.get("args") or {}
        ps = args.get("device_duration_ps")
        if ps is None:
            continue
        ps = int(ps)
        tf_op = args.get("tf_op")
        if tf_op is None and ev.get("name", "").startswith("jit"):
            # the enclosing whole-program event — the authoritative
            # device time per run (it is NOT other tenants' work; under
            # contention it grows to include preemption slices)
            program_span += ps
            continue
        total += ps
        if tf_op is None:
            tf_op = "?"
        # stage = first two scope components, e.g. "rcnn/backbone"
        stage = "/".join(tf_op.split("/")[:3])
        by_stage[stage] += ps
        by_cat[args.get("hlo_category", "?")] += ps
        by_op[tf_op] += ps
    print(
        f"program span: {program_span/1e12*1e3:.2f} ms device "
        f"(op-attributed total below excludes it)"
    )

    def show(title, counter, n):
        print(f"\n== {title} (total {total/1e12*1e3:.2f} ms device) ==")
        for k, v in counter.most_common(n):
            print(f"  {v/1e12*1e3:8.3f} ms  {100*v/total:5.1f}%  {k}")

    show("by hlo_category", by_cat, 12)
    show("by stage", by_stage, top)
    show("by tf_op", by_op, top)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--train", action="store_true")
    ap.add_argument("--trace-dir", default="/tmp/fsodtf_trace")
    ap.add_argument("--analyze-only", action="store_true")
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()
    if not args.analyze_only:
        run_and_trace(args.train, args.trace_dir, args.iters)
    analyze(args.trace_dir)
