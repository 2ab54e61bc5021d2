"""ROIAlign vs an independent numpy reference of the aligned=True formula;
GDL custom_vjp behavior."""

import numpy as np
import jax
import jax.numpy as jnp

from fewshotobjectdetection_imporove_via_text_feature_tpu.ops import (
    roi_align,
    decouple_layer,
)


def np_roi_align(feat, boxes, p, scale, s):
    """feat (H, W, C); independent per-sample bilinear implementation of
    the detectron2 ROIAlignV2 (aligned=True) CUDA loop. s > 0 = static
    SxS sub-grid; s == 0 = adaptive per-ROI per-axis
    g = ceil(roi_size / p) grid counts with count = max(gh * gw, 1)."""
    h, w, c = feat.shape
    r = len(boxes)
    out = np.zeros((r, p, p, c), np.float64)
    for ri in range(r):
        x1 = boxes[ri, 0] * scale - 0.5
        y1 = boxes[ri, 1] * scale - 0.5
        x2 = boxes[ri, 2] * scale - 0.5
        y2 = boxes[ri, 3] * scale - 0.5
        gh = s if s > 0 else int(np.ceil((y2 - y1) / p))
        gw = s if s > 0 else int(np.ceil((x2 - x1) / p))
        count = max(gh * gw, 1)
        bw = max(x2 - x1, 1e-6) / p
        bh = max(y2 - y1, 1e-6) / p
        for py in range(p):
            for px in range(p):
                acc = np.zeros(c)
                for iy in range(gh):
                    for ix in range(gw):
                        y = y1 + (py + (iy + 0.5) / gh) * bh
                        x = x1 + (px + (ix + 0.5) / gw) * bw
                        if y < -1 or y > h or x < -1 or x > w:
                            continue
                        y_ = min(max(y, 0), h - 1)
                        x_ = min(max(x, 0), w - 1)
                        y0, x0 = int(np.floor(y_)), int(np.floor(x_))
                        y1i, x1i = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
                        ly, lx = y_ - y0, x_ - x0
                        acc += (
                            feat[y0, x0] * (1 - ly) * (1 - lx)
                            + feat[y0, x1i] * (1 - ly) * lx
                            + feat[y1i, x0] * ly * (1 - lx)
                            + feat[y1i, x1i] * ly * lx
                        )
                out[ri, py, px] = acc / count
    return out


def test_roi_align_matches_numpy():
    rng = np.random.RandomState(0)
    feat = rng.randn(20, 30, 4).astype(np.float32)
    boxes = np.array(
        [
            [0.0, 0.0, 160.0, 160.0],
            [35.0, 20.0, 300.0, 200.0],
            [100.0, 100.0, 140.0, 130.0],  # small box
            [-10.0, -10.0, 480.0, 330.0],  # exceeds image
        ],
        np.float32,
    )
    got = np.asarray(
        roi_align(jnp.array(feat), jnp.array(boxes), 7, 1 / 16.0, 2)
    )
    ref = np_roi_align(feat, boxes, 7, 1 / 16.0, 2)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_roi_align_adaptive_matches_numpy():
    """sampling_ratio=0: per-ROI per-axis adaptive grid counts (the d2
    default every reference config runs), incl. a sub-bin-size box
    (g=1), a full-image box (g = the worst-case slot count), and a box
    degenerate along one axis (g=0 -> zero output, like the CUDA loop
    running zero iterations)."""
    rng = np.random.RandomState(3)
    feat = rng.randn(20, 30, 4).astype(np.float32)  # sy cap 3, sx cap 5
    boxes = np.array(
        [
            [0.0, 0.0, 480.0, 320.0],      # full image: gh=3, gw=5
            [35.0, 20.0, 300.0, 200.0],    # mid: gh=2, gw=3
            [100.0, 100.0, 140.0, 130.0],  # small: gh=gw=1
            [64.0, 64.0, 64.0, 200.0],     # zero width: gw=0 -> zeros
            [32.0, 48.0, 200.0, 90.0],     # thin: gh=1, gw=2
        ],
        np.float32,
    )
    got = np.asarray(
        roi_align(jnp.array(feat), jnp.array(boxes), 7, 1 / 16.0, 0)
    )
    ref = np_roi_align(feat, boxes, 7, 1 / 16.0, 0)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
    assert np.all(got[3] == 0.0)


def test_roi_align_adaptive_1x1_pcb_mode():
    """PCB's pooler is 1x1 @1/32 with sampling_ratio=0
    (calibration_layer.py:27): the whole ROI densely sampled, not a 2x2
    point probe — grid counts reach the full feature extent."""
    rng = np.random.RandomState(4)
    feat = rng.randn(10, 12, 3).astype(np.float32)
    boxes = np.array(
        [
            [32.0, 32.0, 256.0, 192.0],   # gh=5, gw=7
            [0.0, 0.0, 384.0, 320.0],     # full image: gh=10, gw=12
            [100.0, 90.0, 120.0, 110.0],  # sub-cell: gh=gw=1
        ],
        np.float32,
    )
    got = np.asarray(
        roi_align(jnp.array(feat), jnp.array(boxes), 1, 1 / 32.0, 0)
    )
    ref = np_roi_align(feat, boxes, 1, 1 / 32.0, 0)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_roi_align_1x1_pcb_mode():
    rng = np.random.RandomState(1)
    feat = rng.randn(10, 12, 3).astype(np.float32)
    boxes = np.array([[32.0, 32.0, 256.0, 192.0]], np.float32)
    got = np.asarray(roi_align(jnp.array(feat), jnp.array(boxes), 1, 1 / 32.0, 2))
    ref = np_roi_align(feat, boxes, 1, 1 / 32.0, 2)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
    assert got.shape == (1, 1, 1, 3)


def test_roi_align_gradients_flow():
    feat = jnp.ones((8, 8, 2))
    boxes = jnp.array([[16.0, 16.0, 96.0, 96.0]])

    def f(x):
        return roi_align(x, boxes, 7, 1 / 16.0, 2).sum()

    g = jax.grad(f)(feat)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_gdl_forward_identity_backward_scaled():
    x = jnp.arange(12.0).reshape(3, 4)

    def f(x, lam):
        return jnp.sum(decouple_layer(x, lam) ** 2)

    for lam in [0.0, 0.75, 0.01]:
        y = decouple_layer(x, lam)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x))
        g = jax.grad(f)(x, lam)
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(2 * x * lam), rtol=1e-6
        )
