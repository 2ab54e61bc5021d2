"""End-to-end integration: register a synthetic VOC dataset, run the full
Trainer loop (jit train step, checkpointing) for a few iterations, then the
full eval pipeline (inference -> VOC evaluator), then checkpoint surgery."""

import os
import pickle

import numpy as np
import pytest

from fewshotobjectdetection_imporove_via_text_feature_tpu.config import get_cfg
from fewshotobjectdetection_imporove_via_text_feature_tpu.data.builtin_meta import (
    _get_builtin_metadata,
)
from fewshotobjectdetection_imporove_via_text_feature_tpu.data.meta_voc import (
    register_meta_voc,
)
from tests.test_data_layer import make_voc

_REGISTERED = {}


def setup_dataset(tmp_root):
    """Register train/test synthetic VOC splits once per session.

    Guard via the DatasetCatalog itself — pytest can import this module
    twice under different names, so a module global is not enough.
    """
    from fewshotobjectdetection_imporove_via_text_feature_tpu.data import (
        DatasetCatalog,
    )

    if "e2e_voc_2007_trainval_all1" in DatasetCatalog:
        if "root" not in _REGISTERED:
            # registered by the other module instance; reuse its files by
            # probing the registered loader's first record
            rec = DatasetCatalog.get("e2e_voc_2007_trainval_all1")[0]
            import os

            _REGISTERED["root"] = os.path.dirname(
                os.path.dirname(os.path.dirname(rec["file_name"]))
            )
        return _REGISTERED["root"]
    d, ids = make_voc(tmp_root, n=6)
    meta = _get_builtin_metadata("voc_fewshot")
    register_meta_voc(
        "e2e_voc_2007_trainval_all1", meta, d, "trainval", 2007,
        "base_novel_1", 1, root=tmp_root,
    )
    register_meta_voc(
        "e2e_voc_2007_test_all1", meta, d, "trainval", 2007,
        "base_novel_1", 1, root=tmp_root,
    )
    _REGISTERED["done"] = True
    _REGISTERED["root"] = tmp_root
    return tmp_root


def tiny_cfg(tmp_path):
    cfg = get_cfg()
    cfg.MODEL.RESNETS.DEPTH = 14
    cfg.MODEL.RESNETS.STEM_OUT_CHANNELS = 8
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 16
    cfg.MODEL.RESNETS.WIDTH_PER_GROUP = 4
    cfg.MODEL.BACKBONE.FREEZE_AT = 0
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 20
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 16
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
    cfg.SOLVER.IMS_PER_BATCH = 2
    cfg.SOLVER.MAX_ITER = 3
    cfg.SOLVER.BASE_LR = 0.001
    cfg.SOLVER.WARMUP_ITERS = 0
    cfg.SOLVER.CHECKPOINT_PERIOD = 0
    cfg.DATASETS.TRAIN = ("e2e_voc_2007_trainval_all1",)
    cfg.DATASETS.TEST = ("e2e_voc_2007_test_all1",)
    cfg.SEED = 7
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    return cfg


@pytest.fixture(scope="module")
def shared_tmp(tmp_path_factory):
    return tmp_path_factory.mktemp("e2e")


def test_full_train_eval_surgery(shared_tmp):
    setup_dataset(str(shared_tmp))
    cfg = tiny_cfg(shared_tmp)

    from fewshotobjectdetection_imporove_via_text_feature_tpu.engine import (
        Trainer,
    )

    trainer = Trainer(cfg)
    params = trainer.train()

    # metrics written
    assert os.path.exists(os.path.join(cfg.OUTPUT_DIR, "metrics.json"))
    # final checkpoint exists and reloads
    ckpt = os.path.join(cfg.OUTPUT_DIR, "model_final.ckpt")
    assert os.path.exists(ckpt)
    with open(ckpt, "rb") as f:
        state = pickle.load(f)
    assert state["iteration"] == cfg.SOLVER.MAX_ITER - 1

    # --- evaluation path ---
    from fewshotobjectdetection_imporove_via_text_feature_tpu.data import (
        build_detection_test_loader,
    )
    from fewshotobjectdetection_imporove_via_text_feature_tpu.evaluation import (
        PascalVOCDetectionEvaluator,
        inference_on_dataset,
    )

    loader = build_detection_test_loader(
        cfg, cfg.DATASETS.TEST[0], batch_size=2
    )
    evaluator = PascalVOCDetectionEvaluator(cfg.DATASETS.TEST[0])
    results = inference_on_dataset(
        trainer.model, params, loader, evaluator
    )
    assert "bbox" in results
    assert {"AP", "AP50", "AP75", "bAP", "nAP"} <= set(results["bbox"])
    assert np.isfinite(results["bbox"]["AP50"])

    # --- surgery: 20-class head -> remove + randinit roundtrip ---
    from fewshotobjectdetection_imporove_via_text_feature_tpu.checkpoint.surgery import (
        surgery_randinit,
        surgery_remove,
    )

    import jax

    params_np = jax.device_get(params)
    removed = surgery_remove(params_np)
    assert "cls_score" not in removed["roi_heads"]["box_predictor"]

    expanded = surgery_randinit(params_np, 25, dataset="voc")
    k = expanded["roi_heads"]["box_predictor"]["cls_score"]["kernel"]
    assert k.shape[1] == 26
    # base rows preserved
    old = params_np["roi_heads"]["box_predictor"]["cls_score"]["kernel"]
    np.testing.assert_allclose(k[:, :20], old[:, :20])
    np.testing.assert_allclose(k[:, -1], old[:, -1])  # bg row

    # --- resume path ---
    trainer2 = Trainer(cfg)
    trainer2.resume_or_load(resume=True)
    assert trainer2.start_iter == cfg.SOLVER.MAX_ITER


def test_cli_end_to_end_with_log_contract(tmp_path):
    """Drive the real CLI (python main.py) on a synthetic dataset: train a
    few iters, eval, and verify the run artifacts — notably OUTPUT_DIR/
    log.txt (reference setup_logger parity) whose trailing lines are the
    copypaste rows tools/extract_results.py scrapes."""
    import subprocess
    import sys

    import shutil

    root = str(tmp_path / "data")
    make_voc(os.path.join(root), n=4)
    # the base1 config trains on voc_2007_trainval_base1 + tests on
    # voc_2007_test_base1; synthesize both years' trees and a test split
    make_voc(root, n=4, year="2012")
    for year in ("2007", "2012"):
        main_dir = os.path.join(root, f"VOC{year}", "ImageSets", "Main")
        shutil.copy(
            os.path.join(main_dir, "trainval.txt"),
            os.path.join(main_dir, "test.txt"),
        )
    out = str(tmp_path / "out")
    opts = [
        "MODEL.WEIGHTS", "",
        "MODEL.RESNETS.DEPTH", "14",
        "MODEL.RESNETS.STEM_OUT_CHANNELS", "8",
        "MODEL.RESNETS.RES2_OUT_CHANNELS", "16",
        "MODEL.RESNETS.WIDTH_PER_GROUP", "4",
        "MODEL.BACKBONE.FREEZE_AT", "0",
        "MODEL.RPN.PRE_NMS_TOPK_TRAIN", "128",
        "MODEL.RPN.POST_NMS_TOPK_TRAIN", "32",
        "MODEL.RPN.PRE_NMS_TOPK_TEST", "128",
        "MODEL.RPN.POST_NMS_TOPK_TEST", "32",
        "MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE", "8",
        "MODEL.ROI_HEADS.SCORE_THRESH_TEST", "0.0",
        "TPU.IMAGE_BUCKETS", "((192,256),)",
        "TPU.MAX_GT", "10",
        "TPU.MAX_DETECTIONS_PRE_NMS", "64",
        "TPU.COMPUTE_DTYPE", "float32",
        "INPUT.MIN_SIZE_TRAIN", "(192,)",
        "INPUT.MAX_SIZE_TRAIN", "256",
        "INPUT.MIN_SIZE_TEST", "192",
        "INPUT.MAX_SIZE_TEST", "256",
        "SOLVER.IMS_PER_BATCH", "2",
        "SOLVER.MAX_ITER", "2",
        "SOLVER.STEPS", "(1,)",
        "SOLVER.BASE_LR", "0.001",
        "SOLVER.WARMUP_ITERS", "0",
        "SOLVER.CHECKPOINT_PERIOD", "0",
        "SEED", "3",
        "OUTPUT_DIR", out,
    ]
    env = dict(os.environ, FSODTF_PLATFORM="cpu", FSODTF_DATASETS=root)
    env.pop("JAX_PLATFORMS", None)
    r = subprocess.run(
        [sys.executable, "main.py",
         "--config-file", "configs/voc/defrcn_det_r101_base1.yaml",
         "--opts", *opts],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, capture_output=True, text=True, timeout=900,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    # artifacts: config dump, metrics, native log with the scrape contract
    assert os.path.exists(os.path.join(out, "config.yaml"))
    assert os.path.exists(os.path.join(out, "metrics.json"))
    log = os.path.join(out, "log.txt")
    assert os.path.exists(log)
    lines = [l.strip() for l in open(log) if l.strip()]
    assert "copypaste" in lines[-1] and "copypaste" in lines[-2], lines[-3:]
    # the last line is the numeric row extract_results parses
    vals = lines[-1].split(":")[-1].split(",")
    assert all(float(v) >= 0.0 for v in vals)

    # --- restart workflow: main.py --resume must continue from the saved
    # iteration, not retrain from 0 (crash-and-resume recovery model,
    # ref engine/defaults.py:277-293). Same config/shapes -> warm
    # compile cache, so this leg is cheap.
    resume_opts = list(opts)
    resume_opts[resume_opts.index("SOLVER.MAX_ITER") + 1] = "4"
    resume_opts[resume_opts.index("SOLVER.STEPS") + 1] = "(3,)"
    r2 = subprocess.run(
        [sys.executable, "main.py",
         "--config-file", "configs/voc/defrcn_det_r101_base1.yaml",
         "--resume", "--opts", *resume_opts],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, capture_output=True, text=True, timeout=900,
    )
    assert r2.returncode == 0, r2.stderr[-3000:]
    log2 = [l.strip() for l in open(log) if "iter " in l]
    # leg 1 (MAX_ITER=2) logged iter 0 and 1; the resume leg starts at
    # iter 2 and must log 3 (= MAX_ITER-1) but never re-log iter 0
    leg2 = [l for l in log2 if "iter 3" in l]
    assert leg2, log2[-5:]
    assert sum("iter 0 " in l for l in log2) == 1, log2


def test_sigterm_preemption_checkpoints_and_resumes(shared_tmp, tmp_path):
    """Graceful preemption (beyond reference parity, SURVEY §5.3): SIGTERM
    mid-training saves a resumable checkpoint at the end of the current
    iteration, skips model_final, and a --resume restart continues from
    the saved iteration to completion."""
    import signal

    setup_dataset(str(shared_tmp))
    cfg = tiny_cfg(shared_tmp)
    cfg.OUTPUT_DIR = str(tmp_path / "preempt_out")
    cfg.SOLVER.MAX_ITER = 6

    from fewshotobjectdetection_imporove_via_text_feature_tpu.engine import (
        Trainer,
    )

    trainer = Trainer(cfg)

    def preempt_at_1(it, params):
        if it == 1:
            os.kill(os.getpid(), signal.SIGTERM)

    trainer.hooks.append(preempt_at_1)
    trainer.train()

    assert trainer.preempted
    # resumable checkpoint at the preempted iteration; NO model_final
    # (that name means "training completed" to the workflow scripts)
    assert os.path.exists(os.path.join(cfg.OUTPUT_DIR, "model_0000001.ckpt"))
    assert not os.path.exists(os.path.join(cfg.OUTPUT_DIR, "model_final.ckpt"))
    with open(os.path.join(cfg.OUTPUT_DIR, "model_0000001.ckpt"), "rb") as f:
        assert pickle.load(f)["iteration"] == 1
    # the default handler is restored after train() returns
    assert signal.getsignal(signal.SIGTERM) == signal.SIG_DFL

    # restart: resumes at iter 2, runs to completion, writes model_final
    trainer2 = Trainer(cfg)
    trainer2.resume_or_load(resume=True)
    assert trainer2.start_iter == 2
    trainer2.train()
    assert not trainer2.preempted
    final = os.path.join(cfg.OUTPUT_DIR, "model_final.ckpt")
    assert os.path.exists(final)
    with open(final, "rb") as f:
        assert pickle.load(f)["iteration"] == cfg.SOLVER.MAX_ITER - 1


def test_sigterm_handler_restored_when_train_raises(shared_tmp, tmp_path):
    """If the training loop raises and the caller catches, the SIGTERM
    handler must still be restored (else the process becomes
    non-terminable: future TERMs only set a flag on an abandoned trainer)
    and the async checkpoint writer drained (ADVICE r2 medium)."""
    import signal

    setup_dataset(str(shared_tmp))
    cfg = tiny_cfg(shared_tmp)
    cfg.OUTPUT_DIR = str(tmp_path / "raise_out")
    cfg.SOLVER.MAX_ITER = 6
    cfg.SOLVER.CHECKPOINT_PERIOD = 1  # queue async writes before the raise

    from fewshotobjectdetection_imporove_via_text_feature_tpu.engine import (
        Trainer,
    )

    trainer = Trainer(cfg)

    class Boom(RuntimeError):
        pass

    def explode_at_1(it, params):
        if it == 1:
            raise Boom()

    trainer.hooks.append(explode_at_1)
    try:
        trainer.train()
        raise AssertionError("hook exception did not propagate")
    except Boom:
        pass
    # handler restored on the exception path, writer drained (the iter-0
    # periodic checkpoint is durable on disk)
    assert signal.getsignal(signal.SIGTERM) == signal.SIG_DFL
    assert os.path.exists(os.path.join(cfg.OUTPUT_DIR, "model_0000000.ckpt"))
    assert trainer.checkpointer._pending is None


def test_train_with_input_crop(shared_tmp, tmp_path):
    """INPUT.CROP.ENABLED trains end to end (VERDICT r2 missing #2): the
    reference inserts T.RandomCrop before resize when enabled
    (dataset_mapper.py:83-87); no reference config enables it but the
    capability is live code there, so it must be live here."""
    setup_dataset(str(shared_tmp))
    cfg = tiny_cfg(shared_tmp)
    cfg.OUTPUT_DIR = str(tmp_path / "crop_out")
    cfg.INPUT.CROP.ENABLED = True
    cfg.INPUT.CROP.TYPE = "relative_range"
    cfg.INPUT.CROP.SIZE = (0.8, 0.8)
    cfg.SOLVER.MAX_ITER = 2

    from fewshotobjectdetection_imporove_via_text_feature_tpu.engine import (
        Trainer,
    )

    trainer = Trainer(cfg)
    params = trainer.train()
    assert params is not None
    # losses logged and finite
    metrics = os.path.join(cfg.OUTPUT_DIR, "metrics.json")
    assert os.path.exists(metrics)
    import json

    rows = [json.loads(l) for l in open(metrics)]
    assert rows and all(np.isfinite(r["total_loss"]) for r in rows)
