"""Spatial partitioning (TPU.SPATIAL_PARTITION): one image's backbone
split over S chips along H — batch-1 latency scaling beyond the
reference's DDP (which only scales throughput). Detections must be
identical to the unsharded predictor (GSPMD halo exchange preserves conv
semantics; everything after res4 runs replicated)."""

import jax
import numpy as np
import pytest

from fewshotobjectdetection_imporove_via_text_feature_tpu.engine.predictor import (
    DefaultPredictor,
)
from tests.test_predictor import _tiny_cfg


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
def test_spatial_partition_matches_unsharded():
    rng = np.random.RandomState(1)
    image = rng.randint(0, 255, (230, 310, 3), dtype=np.uint8)  # BGR

    base = DefaultPredictor(_tiny_cfg())
    ref = base(image)

    cfg = _tiny_cfg()
    cfg.TPU.SPATIAL_PARTITION = 4
    sharded = DefaultPredictor(cfg, params=base.params)
    assert sharded.model.spatial_axis == "spatial"
    out = sharded(image)

    # f32 compute, identical params/input: only conv reassociation at the
    # halo boundaries can differ
    assert len(out["boxes"]) == len(ref["boxes"])
    np.testing.assert_allclose(out["scores"], ref["scores"], atol=1e-5)
    np.testing.assert_array_equal(out["classes"], ref["classes"])
    np.testing.assert_allclose(out["boxes"], ref["boxes"], atol=1e-3)

    # the backbone must ACTUALLY run partitioned — halo exchanges
    # (collective-permute) between convs, and the res4 gather must come
    # after most of the conv stack, not an input all-gather followed by a
    # replicated network (which would be equally correct and pointless)
    import re

    from fewshotobjectdetection_imporove_via_text_feature_tpu.engine.predictor import (
        preprocess_single_image,
    )

    batch = preprocess_single_image(cfg, image)
    with sharded._mesh:
        txt = sharded._apply.lower(
            {"params": sharded.params}, batch
        ).compile().as_text()
    assert txt.count("collective-permute") >= 4, (
        txt.count("collective-permute")
    )
    convs = [m.start() for m in re.finditer(r"convolution", txt)]
    ags = [m.start() for m in re.finditer(r"all-gather", txt)]
    assert ags, "no res4 gather found"
    n_before = sum(c < ags[0] for c in convs)
    assert n_before >= len(convs) * 0.6, (n_before, len(convs))


def test_spatial_partition_device_gate():
    cfg = _tiny_cfg()
    cfg.TPU.SPATIAL_PARTITION = 10_000
    with pytest.raises(ValueError, match="SPATIAL_PARTITION"):
        DefaultPredictor(cfg)


def test_spatial_partition_rejected_by_eval():
    """do_test must fail loudly, not silently evaluate unpartitioned
    (the knob is DefaultPredictor-serving-only)."""
    from fewshotobjectdetection_imporove_via_text_feature_tpu import cli

    cfg = _tiny_cfg()
    cfg.TPU.SPATIAL_PARTITION = 2
    with pytest.raises(ValueError, match="SPATIAL_PARTITION"):
        cli.do_test(cfg)
