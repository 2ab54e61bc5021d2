"""Golden tests for box ops vs independent numpy references implementing the
detectron2 formulas (Box2BoxTransform / pairwise_iou / Boxes.clip)."""

import numpy as np
import jax.numpy as jnp

from fewshotobjectdetection_imporove_via_text_feature_tpu.ops import (
    pairwise_iou,
    encode_deltas,
    decode_deltas,
    clip_boxes,
    nonempty_mask,
)


def np_iou(a, b):
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None, :] - inter
    with np.errstate(divide="ignore", invalid="ignore"):
        out = np.where(union > 0, inter / np.where(union > 0, union, 1), 0.0)
    return out


def rand_boxes(rng, n, size=640):
    xy = rng.uniform(0, size, (n, 2))
    wh = rng.uniform(1, size / 2, (n, 2))
    return np.concatenate([xy, xy + wh], axis=1).astype(np.float32)


def test_pairwise_iou_matches_numpy():
    rng = np.random.RandomState(0)
    a = rand_boxes(rng, 13)
    b = rand_boxes(rng, 29)
    got = np.asarray(pairwise_iou(jnp.array(a), jnp.array(b)))
    np.testing.assert_allclose(got, np_iou(a, b), rtol=1e-5, atol=1e-6)


def test_iou_degenerate_boxes_zero():
    a = np.array([[10.0, 10.0, 10.0, 10.0]], np.float32)  # zero area
    b = np.array([[0.0, 0.0, 100.0, 100.0]], np.float32)
    got = np.asarray(pairwise_iou(jnp.array(a), jnp.array(b)))
    assert got[0, 0] == 0.0


def test_encode_decode_roundtrip():
    rng = np.random.RandomState(1)
    src = rand_boxes(rng, 40)
    tgt = rand_boxes(rng, 40)
    for weights in [(1.0, 1.0, 1.0, 1.0), (10.0, 10.0, 5.0, 5.0)]:
        d = encode_deltas(jnp.array(src), jnp.array(tgt), weights)
        back = decode_deltas(d, jnp.array(src), weights)
        np.testing.assert_allclose(np.asarray(back), tgt, rtol=1e-4, atol=1e-3)


def test_decode_matches_formula():
    # Hand-computed detectron2 apply_deltas example.
    src = jnp.array([[0.0, 0.0, 10.0, 20.0]])
    deltas = jnp.array([[0.1, -0.2, np.log(2.0), np.log(0.5)]])
    out = np.asarray(decode_deltas(deltas, src))
    # src: w=10 h=20 cx=5 cy=10 -> pred cx=6, cy=6, w=20, h=10
    np.testing.assert_allclose(out, [[-4.0, 1.0, 16.0, 11.0]], atol=1e-4)


def test_decode_scale_clamp():
    src = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    deltas = jnp.array([[0.0, 0.0, 100.0, 100.0]])  # would explode
    out = np.asarray(decode_deltas(deltas, src))
    assert np.isfinite(out).all()
    assert out[0, 2] - out[0, 0] <= 10.0 * 1000.0 / 16.0 * 1.01


def test_multiclass_decode_shape():
    src = jnp.array([[0.0, 0.0, 10.0, 20.0], [5.0, 5.0, 9.0, 9.0]])
    deltas = jnp.zeros((2, 8))  # K=2 classes
    out = decode_deltas(deltas, src)
    assert out.shape == (2, 8)
    np.testing.assert_allclose(np.asarray(out[:, :4]), np.asarray(src), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out[:, 4:]), np.asarray(src), atol=1e-5)


def test_clip_and_nonempty():
    boxes = jnp.array([[-5.0, -5.0, 50.0, 700.0], [3.0, 3.0, 3.0, 9.0]])
    clipped = clip_boxes(boxes, (600, 400))
    np.testing.assert_allclose(
        np.asarray(clipped), [[0, 0, 50, 600], [3, 3, 3, 9]], atol=1e-6
    )
    mask = np.asarray(nonempty_mask(clipped))
    assert mask.tolist() == [True, False]
