"""Device-side fused preprocessing vs the host PIL path."""

import numpy as np
import jax.numpy as jnp
from PIL import Image

from fewshotobjectdetection_imporove_via_text_feature_tpu.data.mapper import (
    resize_shortest_edge_size,
)
from fewshotobjectdetection_imporove_via_text_feature_tpu.data.xla_preprocess import (
    device_resize_batch,
    scale_boxes,
)


def smooth_image(h, w, seed=0):
    rng = np.random.RandomState(seed)
    small = rng.uniform(0, 255, (8, 8, 3))
    img = np.asarray(
        Image.fromarray(small.astype(np.uint8)).resize((w, h), Image.BILINEAR),
        np.float32,
    )
    return img


def test_device_resize_matches_host_sizes_and_values():
    h0, w0 = 220, 300
    img = smooth_image(h0, w0)
    short, max_size = 256, 384
    hh, ww = resize_shortest_edge_size(h0, w0, short, max_size)

    hs, ws = 256, 320  # source bucket
    raw = np.zeros((1, hs, ws, 3), np.float32)
    raw[0, :h0, :w0] = img
    out, new_hw = device_resize_batch(
        jnp.asarray(raw),
        jnp.asarray([[h0, w0]], jnp.int32),
        jnp.asarray([False]),
        short, max_size, (288, 416),
    )
    out = np.asarray(out[0])
    nh, nw = [int(v) for v in np.asarray(new_hw[0])]
    assert (nh, nw) == (hh, ww)

    ref = np.asarray(
        Image.fromarray(img.astype(np.uint8)).resize((ww, hh), Image.BILINEAR),
        np.float32,
    )
    got = out[:hh, :ww]
    # different bilinear conventions -> compare loosely on smooth content
    assert np.abs(got - ref).mean() < 3.0
    # padding region must be zero
    assert np.abs(out[hh:, :]).max() == 0
    assert np.abs(out[:, ww:]).max() == 0


def test_device_flip():
    h0, w0 = 64, 96
    img = np.zeros((h0, w0, 3), np.float32)
    img[:, :8] = 255.0  # bright strip at left edge
    raw = np.zeros((1, 128, 128, 3), np.float32)
    raw[0, :h0, :w0] = img
    out, new_hw = device_resize_batch(
        jnp.asarray(raw), jnp.asarray([[h0, w0]], jnp.int32),
        jnp.asarray([True]), 64, 128, (96, 128),
    )
    nh, nw = [int(v) for v in np.asarray(new_hw[0])]
    o = np.asarray(out[0])[:nh, :nw]
    # strip should now be at the right edge
    assert o[:, -4:].mean() > 200
    assert o[:, :4].mean() < 50


def test_resize_independent_of_source_padding():
    # Upscaling must not blend source-bucket zero padding into the last
    # valid row/col: the linear kernel's last output row taps the first
    # pad row (in-range for the padded canvas, so scale_and_translate
    # does NOT renormalize it away). The edge-replicating gather makes
    # the result identical to resizing the exact-size canvas.
    h0, w0 = 220, 300
    img = smooth_image(h0, w0, seed=7)
    short, max_size = 512, 800  # upscale: the case that taps the pad

    def run(hs, ws, fl):
        raw = np.zeros((1, hs, ws, 3), np.float32)
        raw[0, :h0, :w0] = img
        out, new_hw = device_resize_batch(
            jnp.asarray(raw),
            jnp.asarray([[h0, w0]], jnp.int32),
            jnp.asarray([fl]),
            short, max_size, (544, 736),
        )
        return np.asarray(out[0]), [int(v) for v in np.asarray(new_hw[0])]

    for fl in (False, True):
        exact, hw_e = run(h0, w0, fl)
        padded, hw_p = run(256, 384, fl)
        assert hw_e == hw_p
        np.testing.assert_allclose(padded, exact, atol=1e-3)
        # and the last valid row/col must carry real content, not a
        # zero-blended shadow (the original bug darkened it ~20%)
        nh, nw = hw_e
        interior = np.abs(padded[nh - 4, : nw]).mean()
        border = np.abs(padded[nh - 1, : nw]).mean()
        assert border > 0.5 * interior


def test_scale_boxes_matches_flip_convention():
    boxes = np.array([[10.0, 20.0, 50.0, 60.0]])
    out = scale_boxes(boxes, (100, 200), (50, 100), flip=True)
    # flip: x1 = 200-50=150, x2 = 200-10=190; then x0.5
    np.testing.assert_allclose(out, [[75.0, 10.0, 95.0, 30.0]])
