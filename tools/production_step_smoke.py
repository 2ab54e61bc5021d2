"""One production-scale train step of any model family on the TPU.

Usage:
    python tools/production_step_smoke.py [--family flagship|text|semantic|distill]

Builds the R-101 config at 800x1344 batch 8 with synthetic data and a
synthetic 300-d class-embedding bank, runs one compiled step plus 5 timed
steps, and asserts every loss is finite. Hardware-validation matrix
(2026-08-17, quiet chip): flagship ~70 ms (batch 8 inference) / text
teacher+student 157.5 ms / semantic cross-output 140.2 ms / distillated
RPN 158.8 ms per train step.

Reference families covered (SURVEY.md §2.1): Res5ROIHeads,
TextRes5ROIHeads (+teacher/student distill), SematicRes5ROIHeadsCrossOutput
(+FastRCNNAttentionOutputLayers), GeneralizedDistillatedRCNN.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# honor FSODTF_PLATFORM (e.g. =cpu) BEFORE any jax backend init -- env
# vars alone cannot override the container's axon default (NOTES.md)
if os.environ.get("FSODTF_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["FSODTF_PLATFORM"])

# persistent jit-compilation cache (shared with the CLI; see
# cli._setup_compilation_cache): repeat validation runs skip the
# 20-40 s remote compiles of unchanged programs
from fewshotobjectdetection_imporove_via_text_feature_tpu.cli import (
    _setup_compilation_cache,
)

_setup_compilation_cache()

import numpy as np


FAMILIES = {
    "flagship": dict(meta="GeneralizedRCNN", head="Res5ROIHeads"),
    "text": dict(
        meta="GeneralizedRCNN", head="TextRes5ROIHeads",
        opts=dict(TEACHER_TRAINING=True, STUDENT_TRAINING=True,
                  DISTILLATE=True, L2=True, KL=True),
    ),
    "semantic": dict(
        meta="GeneralizedRCNN", head="SematicRes5ROIHeadsCrossOutput",
        output_layer="FastRCNNAttentionOutputLayers",
    ),
    "distill": dict(
        meta="GeneralizedDistillatedRCNN", head="SematicRes5ROIHeadsCrossOutput",
        output_layer="FastRCNNAttentionOutputLayers",
    ),
}


def main(family: str, batch: int = 8, eval_mode: bool = False) -> None:
    import jax

    import bench
    from fewshotobjectdetection_imporove_via_text_feature_tpu.config import (
        get_cfg,
    )
    from fewshotobjectdetection_imporove_via_text_feature_tpu.engine.trainer import (
        make_train_step,
    )
    from fewshotobjectdetection_imporove_via_text_feature_tpu.models.build import (
        _common_kwargs,
    )
    from fewshotobjectdetection_imporove_via_text_feature_tpu.solver import (
        build_optimizer,
    )
    from fewshotobjectdetection_imporove_via_text_feature_tpu.structures import (
        GTInstances,
    )

    spec = FAMILIES[family]
    cfg = get_cfg()
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 20
    cfg.MODEL.META_ARCHITECTURE = spec["meta"]
    cfg.MODEL.ROI_HEADS.NAME = spec["head"]
    if "output_layer" in spec:
        cfg.MODEL.ROI_HEADS.OUTPUT_LAYER = spec["output_layer"]
    for k, v in spec.get("opts", {}).items():
        setattr(cfg.MODEL.ROI_HEADS, k, v)
    if spec["meta"] == "GeneralizedDistillatedRCNN":
        cfg.MODEL.DISTILLATION.TEACHER_TRAINING = True
    cfg.SOLVER.IMS_PER_BATCH = batch
    # _common_kwargs resolves an embedding bank from DATASETS.TRAIN for
    # non-plain families (and raises loudly if it can't); the synthetic
    # bank below overrides it either way
    cfg.DATASETS.TRAIN = ("voc_2007_trainval_all1",)

    rngb = np.random.RandomState(0)
    bank = rngb.randn(20, 300).astype(np.float32)
    bank /= np.linalg.norm(bank, axis=1, keepdims=True)
    kw = _common_kwargs(cfg)
    if spec["head"] != "Res5ROIHeads" or spec["meta"] != "GeneralizedRCNN":
        kw["class_embed"] = bank
        kw["bg_embed"] = bank.mean(0, keepdims=True)
    if spec["meta"] == "GeneralizedDistillatedRCNN":
        from fewshotobjectdetection_imporove_via_text_feature_tpu.models.text_heads import (
            GeneralizedDistillatedRCNN as cls,
        )

        kw["semantic_dim"] = bank.shape[1]
    else:
        from fewshotobjectdetection_imporove_via_text_feature_tpu.models.meta_arch import (
            GeneralizedRCNN as cls,
        )
    model = cls(**kw)

    images = jax.device_put(bench.make_inputs(batch))
    rng = np.random.RandomState(0)
    g = cfg.TPU.MAX_GT
    boxes = rng.uniform(0, 400, (batch, g, 4)).astype(np.float32)
    boxes = np.concatenate(
        [boxes[..., :2], boxes[..., :2] + 32 + boxes[..., 2:] * 0.2], -1
    )
    gt = jax.device_put(
        GTInstances(
            boxes=boxes,
            classes=rng.randint(0, 20, (batch, g)).astype(np.int32),
            valid=np.ones((batch, g), bool),
        )
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

    if eval_mode:
        # inference path (text heads run the student-only branch — the
        # reference's inference branch crashes, PARITY.md deviation 3)
        apply_fn = jax.jit(
            lambda v, i: model.apply({"params": v}, i, train=False)
        )
        det = jax.device_get(apply_fn(params, images))
        nval = int(np.asarray(det.valid).sum())
        assert np.isfinite(np.asarray(det.scores)[np.asarray(det.valid)]).all()
        t0 = time.perf_counter()
        for _ in range(3):
            det = apply_fn(params, images)
            np.asarray(det.scores)
        dt = (time.perf_counter() - t0) / 3
        print(
            f"{family} (eval): {dt*1e3:.1f} ms/step batch {batch}, "
            f"{nval} valid detections, scores finite"
        )
        return
    tx, _ = build_optimizer(cfg, params)
    opt_state = tx.init(params)
    step_fn = jax.jit(make_train_step(model, tx), donate_argnums=(0, 1))
    key = jax.random.PRNGKey(0)

    params, opt_state, losses = step_fn(params, opt_state, images, gt, key, 0)
    float(jax.device_get(losses["total_loss"]))  # compile + force
    t0 = time.perf_counter()
    n = 5
    for i in range(n):
        params, opt_state, losses = step_fn(
            params, opt_state, images, gt, key, i + 1
        )
    out = {k: float(v) for k, v in jax.device_get(losses).items()}
    dt = (time.perf_counter() - t0) / n
    assert all(np.isfinite(list(out.values()))), out
    print(f"{family}: {dt*1e3:.1f} ms/step batch {batch}")
    print("  losses:", {k: round(v, 3) for k, v in out.items()})


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", default="flagship", choices=sorted(FAMILIES))
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--eval", action="store_true")
    args = ap.parse_args()
    main(args.family, args.batch, args.eval)
