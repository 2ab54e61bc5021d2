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
