# Two-stage teacher->student distillation overfit check.
#
# The reference's distillation recipe (run_text_train_Student.sh:26-33,
# commented-out "train student model" block + run_text_train_teacher.sh)
# distills FROM A TRAINED TEACHER: a base-trained checkpoint initializes the
# model, then TEACHER_TRAINING+STUDENT_TRAINING+DISTILLATE+L2+KL all train
# together. Joint distillation from scratch does not converge (NOTES.md
# round-2 log) -- that is a property of the method, not a bug.
#
# This tool validates the full two-stage pipeline end to end on the visual
# overfit set (tools/overfit_map_check.py's colored-rectangle VOC data):
#
#   stage 1  TextRes5ROIHeads, DISTILLATE False: teacher (teacher-forced LV
#            attention) and student both CE-train to convergence ->
#            model_final.ckpt.
#   stage 2  fresh Trainer, MODEL.WEIGHTS = stage-1 ckpt (exercising the
#            checkpoint import path), then the student branch
#            (stu_box_predictor + mlp_adapter) is RE-RANDOMIZED and training
#            resumes with DISTILLATE True, L2 True, KL on (the reference's
#            distillation combo). The re-randomized student must re-converge
#            under CE + KL(teacher logits, T^2-scaled) + L2 feature pull,
#            and the KL/L2 losses must shrink -- proving the distillation
#            losses steer a cold student toward a trained teacher.
#
# Inference runs the student path (the reference's usable branch), so the
# final recall/AP measure the DISTILLED STUDENT, not the teacher.
#
# Run on CPU (tiny model, default) or --production for R-101 on TPU.
import os
import sys
import tempfile
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

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

from overfit_map_check import make_visual_voc


def _tiny_cfg(cfg):
    cfg.MODEL.RESNETS.DEPTH = 14
    cfg.MODEL.RESNETS.STEM_OUT_CHANNELS = 8
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 16
    cfg.MODEL.RESNETS.WIDTH_PER_GROUP = 4
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 32
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 256
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 64
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 256
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 64
    cfg.TPU.IMAGE_BUCKETS = ((256, 384),)
    cfg.TPU.MAX_GT = 10
    cfg.TPU.MAX_DETECTIONS_PRE_NMS = 128
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.INPUT.MIN_SIZE_TRAIN = (256,)
    cfg.INPUT.MAX_SIZE_TRAIN = 384
    cfg.INPUT.MIN_SIZE_TEST = 256
    cfg.INPUT.MAX_SIZE_TEST = 384


def _production_cfg(cfg):
    cfg.MODEL.BACKBONE.FREEZE_AT = 0
    # teacher+student dual heads + full-backbone grads at 800x1344 sit near
    # the HBM ceiling on a time-shared chip: remat the backbone
    cfg.TPU.REMAT_BACKBONE = True
    cfg.TPU.IMAGE_BUCKETS = ((800, 1344),)
    cfg.INPUT.MIN_SIZE_TRAIN = (800,)
    cfg.INPUT.MAX_SIZE_TRAIN = 1333
    cfg.INPUT.MIN_SIZE_TEST = 800
    cfg.INPUT.MAX_SIZE_TEST = 1333


def _base_cfg(get_cfg, production):
    cfg = get_cfg()
    cfg.MODEL.BACKBONE.FREEZE_AT = 0
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 20
    cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST = 0.05
    cfg.MODEL.ROI_HEADS.NAME = "TextRes5ROIHeads"
    cfg.MODEL.ADDITION.NAME = "glove"
    cfg.MODEL.ROI_HEADS.TEACHER_TRAINING = True
    cfg.MODEL.ROI_HEADS.STUDENT_TRAINING = True
    cfg.MODEL.ROI_HEADS.KL_TEMP = 5
    (_production_cfg if production else _tiny_cfg)(cfg)
    cfg.SOLVER.IMS_PER_BATCH = 6
    cfg.SOLVER.BASE_LR = 0.01 if production else 0.02
    cfg.SOLVER.WARMUP_ITERS = 50
    cfg.SOLVER.CHECKPOINT_PERIOD = 0
    cfg.TEST.EVAL_PERIOD = 0
    cfg.DATASETS.TRAIN = ("voc_distof_all1_t_train",)
    cfg.DATASETS.TEST = ("voc_distof_all1_t_test",)
    cfg.SEED = int(os.environ.get("FSODTF_OVERFIT_SEED", "11"))
    return cfg


def _rerandomize_student(params, rng_seed=123):
    """Cold-student prep — shared with tools/model_surgery.py
    --method reset_student (checkpoint.surgery.surgery_reset_student)."""
    from fewshotobjectdetection_imporove_via_text_feature_tpu.checkpoint.surgery import (
        surgery_reset_student,
    )

    return surgery_reset_student(params, seed=rng_seed)


def main(production=False):
    from fewshotobjectdetection_imporove_via_text_feature_tpu.config import (
        get_cfg,
    )
    from fewshotobjectdetection_imporove_via_text_feature_tpu.data.builtin_meta import (
        _get_builtin_metadata,
    )
    from fewshotobjectdetection_imporove_via_text_feature_tpu.data.meta_voc import (
        register_meta_voc,
    )
    from fewshotobjectdetection_imporove_via_text_feature_tpu.engine import (
        Trainer,
    )
    from fewshotobjectdetection_imporove_via_text_feature_tpu.parallel import (
        replicate,
    )
    import main as cli

    root = tempfile.mkdtemp()
    d = make_visual_voc(root)
    meta = _get_builtin_metadata("voc_fewshot")
    for split in ("voc_distof_all1_t_train", "voc_distof_all1_t_test"):
        register_meta_voc(
            split, meta, d, "trainval", 2007, "base_novel_1", 1, root=root
        )

    t0 = time.time()

    # ---- stage 1: converge the teacher (and a CE student) ----
    cfg1 = _base_cfg(get_cfg, production)
    cfg1.MODEL.ROI_HEADS.DISTILLATE = False
    # lr 0.02 on the 6-image set can fall into an all-background
    # equilibrium depending on the init draw (seed 12 collapsed in
    # stage 1 itself, fg accuracy 0 at iter 399); halve the LR and give
    # it longer — convergence is then init-robust
    cfg1.SOLVER.BASE_LR = 0.005 if production else 0.01
    cfg1.SOLVER.WARMUP_ITERS = 100
    cfg1.SOLVER.MAX_ITER = 400 if production else 600
    cfg1.SOLVER.STEPS = (
        (300, 360) if production else (450, 540)
    )
    cfg1.OUTPUT_DIR = os.path.join(root, "stage1")
    tr1 = Trainer(cfg1)
    tr1.train()
    ckpt = os.path.join(cfg1.OUTPUT_DIR, "model_final.ckpt")
    assert os.path.exists(ckpt), ckpt
    print(f"[stage1] teacher trained, ckpt at {ckpt}  ({time.time()-t0:.0f}s)")

    # ---- stage 2: cold student distills from the trained teacher ----
    cfg2 = _base_cfg(get_cfg, production)
    cfg2.MODEL.ROI_HEADS.DISTILLATE = True
    cfg2.MODEL.ROI_HEADS.L2 = True
    cfg2.MODEL.ROI_HEADS.KL = True
    cfg2.MODEL.WEIGHTS = ckpt
    # the cold student needs longer than stage 1: its ranking (AP) keeps
    # calibrating well after recall saturates
    cfg2.SOLVER.MAX_ITER = 400 if production else 700
    cfg2.SOLVER.STEPS = (
        (300, 360) if production else (520, 620)
    )
    # Stage 2 runs under the reference's ACTUAL novel-fine-tune gradient
    # contract (defrcn_gfsod_r101_novelx_10shot_seedx.yaml:9-18): GDL
    # attenuation RPN lambda=0 / RCNN lambda=0.001 plus FREEZE_FEAT, so
    # the cold student's enormous early KL (x T^2 = 25) and adapter-L2
    # gradients cannot wreck the loaded backbone/RPN. Without these the
    # check sat on a knife edge (seed sweep 2026-08-17: full-backprop
    # stage 2 collapsed into an all-background equilibrium for seeds
    # 12/13 on every commit tried, and seed 11 flipped on a 1e-9/step
    # optimizer perturbation). The reference never fine-tunes a student
    # without this decoupling.
    cfg2.MODEL.RPN.BACKWARD_SCALE = 0.0
    cfg2.MODEL.ROI_HEADS.BACKWARD_SCALE = 0.001
    cfg2.MODEL.ROI_HEADS.FREEZE_FEAT = True
    cfg2.SOLVER.BASE_LR = 0.01
    # the ref novel recipe uses no warmup, but ITS student starts from the
    # surgery checkpoint (only predictor rows are cold); this check
    # re-randomizes the WHOLE student branch, and full LR at step 0 with
    # loss_kl ~ 13 NaN-diverges — ramp in over the KL collapse
    cfg2.SOLVER.WARMUP_ITERS = 100
    # T=2 keeps the same distillation mechanism while shrinking the
    # x T^2 loss scale 6x: at T=5 the cold student's KL shock (through
    # the always-live GDL affines) tips the 6-image set into its
    # all-background attractor for ~half the (seed, schedule) draws —
    # the production KL_TEMP=5 recipe is step-smoked by bench.py and
    # dryrun_multichip instead
    cfg2.MODEL.ROI_HEADS.KL_TEMP = 2
    cfg2.OUTPUT_DIR = os.path.join(root, "stage2")
    tr2 = Trainer(cfg2)

    import jax

    host_params = jax.device_get(tr2.params)
    host_params, n_reset = _rerandomize_student(host_params)
    tr2.params = replicate(tr2.mesh, host_params)
    # keep the freshly built opt_state (momentum zeros) -- stage 2 is a new
    # training run, mirroring surgery's reset_optimizer semantics
    print(f"[stage2] student branch re-randomized ({n_reset} tensors)")
    tr2.train()

    # distill-loss trajectory from the metrics log
    import json

    mpath = os.path.join(cfg2.OUTPUT_DIR, "metrics.json")
    rows = [json.loads(l) for l in open(mpath)]
    kl = [(r["iteration"], r["loss_kl"]) for r in rows if "loss_kl" in r]
    l2 = [
        (r["iteration"], r["loss_student_feat"])
        for r in rows
        if "loss_student_feat" in r
    ]
    head = lambda xs: np.mean([v for _, v in xs[:3]])
    tail = lambda xs: np.mean([v for _, v in xs[-3:]])
    print(
        f"[stage2] loss_kl {head(kl):.4f} -> {tail(kl):.4f}; "
        f"loss_student_feat {head(l2):.4f} -> {tail(l2):.4f}"
    )

    # evaluate: inference is the STUDENT path (no GT given)
    res = cli.do_test(cfg2, params=tr2.params, model=tr2.model)
    ap50 = res["voc_distof_all1_t_test"]["bbox"]["AP50"]

    dets = json.load(
        open(os.path.join(cfg2.OUTPUT_DIR, "coco_instances_results.json"))
    )
    from fewshotobjectdetection_imporove_via_text_feature_tpu.data import (
        MetadataCatalog,
    )
    from overfit_map_check import memorized_set_recall

    classes = MetadataCatalog.get("voc_distof_all1_t_test").thing_classes
    name_to_id = {n: i for i, n in enumerate(classes)}
    hit, total = memorized_set_recall(
        dets, os.path.join(d, "Annotations"), name_to_id
    )
    recall = hit / max(total, 1)
    print(
        f"wall {time.time()-t0:.0f}s  distilled-student AP50={ap50:.2f} "
        f"(perfect = 15.0)  recall@0.5: {hit}/{total}"
    )
    assert tail(kl) < head(kl), "KL distillation loss did not decrease"
    assert tail(l2) < head(l2), "L2 feature distillation loss did not decrease"
    assert recall >= 0.9, f"distilled student recall too low: {recall}"
    assert ap50 > 12.0, f"distilled student AP50 too low: {ap50}"
    print("DISTILL OVERFIT CHECK PASSED")


if __name__ == "__main__":
    main(production="--production" in sys.argv)
