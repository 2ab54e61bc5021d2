"""MXU-matmul ROIAlign vs the gather reference implementation."""

import numpy as np
import jax
import jax.numpy as jnp

from fewshotobjectdetection_imporove_via_text_feature_tpu.ops import roi_align
from fewshotobjectdetection_imporove_via_text_feature_tpu.ops.roi_align_mxu import (
    roi_align_mxu,
)


def _boxes():
    return np.array(
        [
            [0.0, 0.0, 160.0, 160.0],
            [35.0, 20.0, 300.0, 200.0],
            [100.0, 100.0, 140.0, 130.0],
            [-10.0, -10.0, 480.0, 330.0],
            [400.0, 200.0, 470.0, 310.0],  # near right/bottom edge
        ],
        np.float32,
    )


def test_mxu_matches_gather():
    rng = np.random.RandomState(0)
    feat = rng.randn(20, 30, 8).astype(np.float32)
    boxes = _boxes()
    ref = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(boxes), 7, 1 / 16.0, 2))
    got = np.asarray(
        roi_align_mxu(jnp.asarray(feat), jnp.asarray(boxes), 7, 1 / 16.0, 2)
    )
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_mxu_matches_gather_1x1_pcb():
    rng = np.random.RandomState(1)
    feat = rng.randn(10, 12, 4).astype(np.float32)
    boxes = np.array([[32.0, 32.0, 256.0, 192.0]], np.float32)
    ref = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(boxes), 1, 1 / 32.0, 2))
    got = np.asarray(
        roi_align_mxu(jnp.asarray(feat), jnp.asarray(boxes), 1, 1 / 32.0, 2)
    )
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_mxu_matches_gather_adaptive():
    """sampling_ratio=0 (adaptive): both backends share the geometry
    helper's masked-weight plan; outputs must agree on mixed ROI sizes
    incl. a degenerate-axis box (zero output)."""
    rng = np.random.RandomState(5)
    feat = rng.randn(20, 30, 8).astype(np.float32)
    boxes = np.concatenate(
        [_boxes(), np.array([[64.0, 64.0, 64.0, 200.0]], np.float32)]
    )
    ref = np.asarray(
        roi_align(jnp.asarray(feat), jnp.asarray(boxes), 7, 1 / 16.0, 0)
    )
    got = np.asarray(
        roi_align_mxu(jnp.asarray(feat), jnp.asarray(boxes), 7, 1 / 16.0, 0)
    )
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
    assert np.all(got[-1] == 0.0)

    # PCB mode: 1x1 @1/32 adaptive
    featp = rng.randn(10, 12, 4).astype(np.float32)
    boxesp = np.array(
        [[32.0, 32.0, 256.0, 192.0], [0.0, 0.0, 384.0, 320.0]], np.float32
    )
    refp = np.asarray(
        roi_align(jnp.asarray(featp), jnp.asarray(boxesp), 1, 1 / 32.0, 0)
    )
    gotp = np.asarray(
        roi_align_mxu(jnp.asarray(featp), jnp.asarray(boxesp), 1, 1 / 32.0, 0)
    )
    np.testing.assert_allclose(gotp, refp, rtol=1e-4, atol=1e-4)


def test_mxu_gradients_adaptive():
    feat = jnp.asarray(np.random.RandomState(6).randn(8, 8, 4), jnp.float32)
    boxes = jnp.asarray([[16.0, 16.0, 96.0, 96.0], [0.0, 0.0, 128.0, 128.0]])

    g1 = jax.grad(lambda f: roi_align(f, boxes, 7, 1 / 16.0, 0).sum())(feat)
    g2 = jax.grad(lambda f: roi_align_mxu(f, boxes, 7, 1 / 16.0, 0).sum())(feat)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), rtol=1e-4, atol=1e-4)
    assert float(jnp.abs(g1).sum()) > 0


def test_mxu_gradients():
    feat = jnp.asarray(np.random.RandomState(2).randn(8, 8, 4), jnp.float32)
    boxes = jnp.asarray([[16.0, 16.0, 96.0, 96.0]])

    g1 = jax.grad(lambda f: roi_align(f, boxes, 7, 1 / 16.0, 2).sum())(feat)
    g2 = jax.grad(lambda f: roi_align_mxu(f, boxes, 7, 1 / 16.0, 2).sum())(feat)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), rtol=1e-4, atol=1e-4)


def test_mxu_chunking_consistent():
    rng = np.random.RandomState(3)
    feat = rng.randn(16, 16, 4).astype(np.float32)
    boxes = np.tile(_boxes(), (60, 1))[:300]
    a = np.asarray(
        roi_align_mxu(jnp.asarray(feat), jnp.asarray(boxes), 7, 1 / 16.0, 2,
                      roi_chunk=128)
    )
    b = np.asarray(
        roi_align_mxu(jnp.asarray(feat), jnp.asarray(boxes), 7, 1 / 16.0, 2,
                      roi_chunk=0)
    )
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_mxu_portrait_and_landscape_orientations():
    """The MXU ROIAlign contracts the longer spatial axis first; both
    branches must match the gather reference on non-square feature maps."""
    from fewshotobjectdetection_imporove_via_text_feature_tpu.ops.roi_align import (
        roi_align,
    )

    rng = np.random.RandomState(7)
    for (h, w) in [(10, 24), (24, 10)]:
        feat = jnp.asarray(rng.randn(h, w, 8), jnp.float32)
        boxes = np.zeros((12, 4), np.float32)
        boxes[:, 0] = rng.uniform(0, w * 16 - 32, 12)
        boxes[:, 1] = rng.uniform(0, h * 16 - 32, 12)
        boxes[:, 2] = boxes[:, 0] + rng.uniform(8, 120, 12)
        boxes[:, 3] = boxes[:, 1] + rng.uniform(8, 120, 12)
        boxes = jnp.asarray(boxes)
        ref = roi_align(feat, boxes, 7, 1 / 16.0, 2)
        out = roi_align_mxu(feat, boxes, 7, 1 / 16.0, 2)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4,
            err_msg=f"orientation {h}x{w}",
        )
