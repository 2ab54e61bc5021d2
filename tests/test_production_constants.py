"""The reference's PRODUCTION solver constants in an asserting context
(VERDICT r4 task 6): the base-stage recipe
(/root/reference/configs/voc/defrcn_det_r101_base1.yaml:20-26 +
Base-RCNN.yaml) runs BASE_LR 0.02, GAMMA 0.1, WARMUP 100 iters at factor
1/1000, STEPS (10000, 13300) of MAX_ITER 15000. The held-out gate trains
at lr 0.01 (0.02 is a convergence coin-flip at tiny synthetic scale —
NOTES round-3 calibration), so until round 5 the exact constants were
exercised only by non-asserting smokes. Two asserts close that:

  * the full production schedule (all 15000 iters) against an
    INDEPENDENT numpy transcription of detectron2's WarmupMultiStepLR
    (linear warmup factor*(1-a)+a, gamma**bisect_right(steps, it));
  * a short-horizon CLI run at the REAL constants (BASE_LR 0.02,
    production warmup/step proportions scaled 100x) on the learnable
    gate dataset: every logged lr matches the formula AND total_loss
    decreases — the 0.02 path demonstrably trains.
"""

import bisect
import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# the reference's production base-stage constants
BASE_LR = 0.02
GAMMA = 0.1
WARMUP_ITERS = 100
WARMUP_FACTOR = 1.0 / 1000


def _d2_lr(it, steps, base_lr=BASE_LR, warmup_iters=WARMUP_ITERS):
    """Independent transcription of d2 WarmupMultiStepLR semantics."""
    if warmup_iters > 0 and it < warmup_iters:
        alpha = it / warmup_iters
        factor = WARMUP_FACTOR * (1 - alpha) + alpha
    else:
        factor = 1.0
    return base_lr * factor * GAMMA ** bisect.bisect_right(list(steps), it)


def test_production_schedule_matches_d2_formula_over_all_iters():
    import jax
    import jax.numpy as jnp

    from fewshotobjectdetection_imporove_via_text_feature_tpu.config import (
        get_cfg,
    )
    from fewshotobjectdetection_imporove_via_text_feature_tpu.solver import (
        build_lr_scheduler,
    )

    cfg = get_cfg()
    cfg.SOLVER.BASE_LR = BASE_LR
    cfg.SOLVER.STEPS = (10000, 13300)
    cfg.SOLVER.MAX_ITER = 15000
    cfg.SOLVER.GAMMA = GAMMA
    cfg.SOLVER.WARMUP_ITERS = WARMUP_ITERS
    cfg.SOLVER.WARMUP_FACTOR = WARMUP_FACTOR
    sched = jax.jit(build_lr_scheduler(cfg))
    its = jnp.arange(15000)
    ours = np.asarray(jax.vmap(sched)(its))
    ref = np.array([_d2_lr(i, (10000, 13300)) for i in range(15000)])
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=0)
    # boundary semantics: the drop happens AT the step iter (bisect_right)
    assert np.isclose(ours[9999], 0.02) and np.isclose(ours[10000], 0.002)


def test_short_horizon_training_at_production_constants(tmp_path):
    data_root = tmp_path / "datasets"
    subprocess.run(
        [sys.executable, "tools/_make_generalization_voc.py",
         "--root", str(data_root), "--train-2007", "32", "--train-2012",
         "8", "--val", "8", "--shots", "1", "--seed", "0"],
        cwd=REPO, check=True, capture_output=True, text=True,
    )
    out_dir = tmp_path / "run"
    # production constants, step proportions scaled 100x:
    # (10000, 13300) / 15000 -> (100, 133) / 150
    tiny = """MODEL.RESNETS.DEPTH 14 MODEL.RESNETS.STEM_OUT_CHANNELS 8
MODEL.RESNETS.RES2_OUT_CHANNELS 16 MODEL.RESNETS.WIDTH_PER_GROUP 4
MODEL.BACKBONE.FREEZE_AT 0
MODEL.RPN.PRE_NMS_TOPK_TRAIN 256 MODEL.RPN.POST_NMS_TOPK_TRAIN 64
MODEL.RPN.PRE_NMS_TOPK_TEST 256 MODEL.RPN.POST_NMS_TOPK_TEST 64
MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE 32
TPU.IMAGE_BUCKETS ((288,384),) TPU.MAX_GT 10
TPU.MAX_DETECTIONS_PRE_NMS 128 TPU.COMPUTE_DTYPE float32
INPUT.MIN_SIZE_TRAIN (288,) INPUT.MAX_SIZE_TRAIN 384
INPUT.MIN_SIZE_TEST 288 INPUT.MAX_SIZE_TEST 384
SOLVER.IMS_PER_BATCH 8 SOLVER.CHECKPOINT_PERIOD 0 SEED 5""".split()
    env = dict(os.environ, FSODTF_PLATFORM="cpu",
               FSODTF_DATASETS=str(data_root))
    env.pop("JAX_PLATFORMS", None)
    r = subprocess.run(
        [sys.executable, "main.py", "--config-file",
         "configs/voc/defrcn_det_r101_base1.yaml", "--opts",
         "MODEL.WEIGHTS", "", "SOLVER.MAX_ITER", "150",
         "SOLVER.STEPS", "(100,133)", "SOLVER.BASE_LR", str(BASE_LR),
         "SOLVER.WARMUP_ITERS", str(WARMUP_ITERS),
         "TEST.EVAL_PERIOD", "0", "OUTPUT_DIR", str(out_dir)] + tiny,
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1800,
    )
    assert r.returncode == 0, (r.stdout + r.stderr)[-4000:]

    recs = [
        json.loads(l)
        for l in open(out_dir / "metrics.json")
        if "total_loss" in l
    ]
    assert len(recs) >= 7  # every 20 iters over 150
    # every logged lr matches the independent d2 formula at its iteration
    for rec in recs:
        want = _d2_lr(rec["iteration"], (100, 133))
        np.testing.assert_allclose(
            rec["lr"], want, rtol=1e-5,
            err_msg=f"lr at iter {rec['iteration']}",
        )
    # the warmup region and the post-step region were both logged
    assert any(r["iteration"] < WARMUP_ITERS for r in recs)
    assert any(r["iteration"] >= 133 for r in recs)
    # short-horizon learning signal at lr 0.02: loss strictly decreased
    first = np.mean([r["total_loss"] for r in recs[:2]])
    last = np.mean([r["total_loss"] for r in recs[-2:]])
    assert last < first, (first, last)
    assert last < 0.8 * first, (
        f"loss barely moved at the production constants: "
        f"{first:.3f} -> {last:.3f}"
    )
