"""Device-preprocess training mode end-to-end: Trainer with
TPU.DEVICE_PREPROCESS=True runs the fused raw->resize->train step."""

import os

import numpy as np

from tests.test_end_to_end import setup_dataset, tiny_cfg


def test_trainer_device_preprocess(tmp_path_factory):
    shared = tmp_path_factory.mktemp("dp")
    setup_dataset(str(shared))
    cfg = tiny_cfg(shared)
    cfg.TPU.DEVICE_PREPROCESS = True
    cfg.TPU.RAW_BUCKETS = ((256, 384),)
    cfg.OUTPUT_DIR = str(shared / "out_dp")
    cfg.SOLVER.MAX_ITER = 2

    from fewshotobjectdetection_imporove_via_text_feature_tpu.engine import (
        Trainer,
    )

    trainer = Trainer(cfg)
    params = trainer.train()
    assert os.path.exists(os.path.join(cfg.OUTPUT_DIR, "metrics.json"))
    # losses recorded and finite
    import json

    with open(os.path.join(cfg.OUTPUT_DIR, "metrics.json")) as f:
        rec = json.loads(f.readline())
    assert np.isfinite(rec["total_loss"])


def test_trainer_device_preprocess_model_parallel(tmp_path_factory):
    """TPU.MODEL_PARALLEL x TPU.DEVICE_PREPROCESS: the per-bucket raw
    steps also go through Trainer._jit_step, so the fused
    resize+train program must keep the ZeRO layout pinned."""
    import jax
    import pytest

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    shared = tmp_path_factory.mktemp("dpmp")
    setup_dataset(str(shared))
    cfg = tiny_cfg(shared)
    cfg.TPU.DEVICE_PREPROCESS = True
    cfg.TPU.RAW_BUCKETS = ((256, 384),)
    cfg.TPU.MODEL_PARALLEL = 2
    cfg.OUTPUT_DIR = str(shared / "out_dpmp")
    cfg.SOLVER.MAX_ITER = 2

    from fewshotobjectdetection_imporove_via_text_feature_tpu.engine import (
        Trainer,
    )

    trainer = Trainer(cfg)
    params = trainer.train()
    specs = [
        leaf.sharding.spec
        for leaf in jax.tree_util.tree_leaves(params)
    ]
    assert any("model" in s for s in specs)
    import json

    with open(os.path.join(cfg.OUTPUT_DIR, "metrics.json")) as f:
        rec = json.loads(f.readline())
    assert np.isfinite(rec["total_loss"])


def test_eval_device_preprocess(tmp_path_factory):
    """Inference path with fused device preprocessing produces the same
    metrics structure as the host path."""
    shared = tmp_path_factory.mktemp("dpe")
    root = setup_dataset(str(shared))
    import pathlib

    cfg = tiny_cfg(pathlib.Path(root))
    cfg.TPU.DEVICE_PREPROCESS = True
    cfg.TPU.RAW_BUCKETS = ((256, 384),)
    cfg.OUTPUT_DIR = str(shared / "out_eval")
    cfg.SOLVER.MAX_ITER = 1

    from fewshotobjectdetection_imporove_via_text_feature_tpu.data import (
        build_detection_test_loader,
    )
    from fewshotobjectdetection_imporove_via_text_feature_tpu.engine import (
        Trainer,
    )
    from fewshotobjectdetection_imporove_via_text_feature_tpu.evaluation import (
        PascalVOCDetectionEvaluator,
        inference_on_dataset,
    )

    trainer = Trainer(cfg)
    params = trainer.train()
    loader = build_detection_test_loader(
        cfg, cfg.DATASETS.TEST[0], batch_size=2
    )
    evaluator = PascalVOCDetectionEvaluator(cfg.DATASETS.TEST[0])
    results = inference_on_dataset(trainer.model, params, loader, evaluator)
    assert "bbox" in results
    assert np.isfinite(results["bbox"]["AP50"])
