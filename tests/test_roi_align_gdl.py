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
    """feat (H, W, C); independent per-sample bilinear implementation."""
    h, w, c = feat.shape
    r = len(boxes)
    out = np.zeros((r, p, p, c), np.float64)
    for ri in range(r):
        x1 = boxes[ri, 0] * scale - 0.5
        y1 = boxes[ri, 1] * scale - 0.5
        x2 = boxes[ri, 2] * scale - 0.5
        y2 = boxes[ri, 3] * scale - 0.5
        bw = max(x2 - x1, 1e-6) / p
        bh = max(y2 - y1, 1e-6) / p
        for py in range(p):
            for px in range(p):
                acc = np.zeros(c)
                for iy in range(s):
                    for ix in range(s):
                        y = y1 + (py + (iy + 0.5) / s) * bh
                        x = x1 + (px + (ix + 0.5) / s) * bw
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
                out[ri, py, px] = acc / (s * s)
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
