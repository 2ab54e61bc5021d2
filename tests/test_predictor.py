"""DefaultPredictor single-image API (ref engine/defaults.py:131-192):
BGR uint8 in, numpy detections in original coordinates out."""

import numpy as np

from fewshotobjectdetection_imporove_via_text_feature_tpu.config import get_cfg
from fewshotobjectdetection_imporove_via_text_feature_tpu.engine.predictor import (
    DefaultPredictor,
)


def _tiny_cfg():
    cfg = get_cfg()
    cfg.MODEL.WEIGHTS = ""
    cfg.MODEL.RESNETS.DEPTH = 14
    cfg.MODEL.RESNETS.STEM_OUT_CHANNELS = 8
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 16
    cfg.MODEL.RESNETS.WIDTH_PER_GROUP = 4
    cfg.MODEL.BACKBONE.FREEZE_AT = 0
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 5
    cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST = 0.0
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 64
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 16
    cfg.TPU.IMAGE_BUCKETS = ((192, 256),)
    cfg.TPU.MAX_DETECTIONS_PRE_NMS = 64
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.INPUT.MIN_SIZE_TEST = 192
    cfg.INPUT.MAX_SIZE_TEST = 256
    return cfg


def test_predictor_end_to_end():
    pred = DefaultPredictor(_tiny_cfg())
    rng = np.random.RandomState(0)
    image = rng.randint(0, 255, (230, 310, 3), dtype=np.uint8)  # BGR
    out = pred(image)
    assert set(out) == {"boxes", "scores", "classes"}
    n = len(out["boxes"])
    assert out["scores"].shape == (n,) and out["classes"].shape == (n,)
    if n:
        # boxes are in ORIGINAL image coordinates
        assert out["boxes"][:, 2].max() <= 310 + 1e-3
        assert out["boxes"][:, 3].max() <= 230 + 1e-3
        assert (out["boxes"][:, 2] >= out["boxes"][:, 0]).all()
        assert np.isfinite(out["scores"]).all()
        assert out["classes"].max() < 5
