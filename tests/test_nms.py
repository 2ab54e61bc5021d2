"""Tiled TPU NMS vs an independent numpy greedy-NMS reference (torchvision
semantics: descending score, IoU > threshold suppresses, stable ties)."""

import numpy as np
import jax.numpy as jnp

from fewshotobjectdetection_imporove_via_text_feature_tpu.ops import (
    nms_fixed,
    batched_nms_fixed,
)
from tests.test_box_ops import np_iou, rand_boxes


def np_greedy_nms(boxes, scores, thresh):
    order = np.argsort(-scores, kind="stable")
    keep = np.zeros(len(boxes), bool)
    iou = np_iou(boxes, boxes)
    for i in order:
        suppressed = any(iou[j, i] > thresh for j in np.where(keep)[0])
        keep[i] = not suppressed
    return keep


def test_nms_matches_reference():
    rng = np.random.RandomState(0)
    boxes = rand_boxes(rng, 200, size=200)  # dense -> many overlaps
    scores = rng.uniform(0, 1, 200).astype(np.float32)
    valid = np.ones(200, bool)
    for thresh in [0.3, 0.5, 0.7]:
        keep, order = nms_fixed(
            jnp.array(boxes), jnp.array(scores), jnp.array(valid), thresh
        )
        ref = np_greedy_nms(boxes, scores, thresh)
        np.testing.assert_array_equal(np.asarray(keep), ref)


def test_nms_assume_sorted_identical():
    """assume_sorted (scores already descending, e.g. top_k output) must
    produce the identical keep set on both backends, including tied
    scores and invalid entries interspersed mid-sequence (the RPN
    min_size filter invalidates boxes at arbitrary sorted positions)."""
    from fewshotobjectdetection_imporove_via_text_feature_tpu.ops.nms_pallas import (
        nms_fixed_pallas,
    )

    rng = np.random.RandomState(7)
    n = 300
    boxes = rand_boxes(rng, n, size=200)
    scores = np.sort(rng.uniform(0, 1, n).astype(np.float32))[::-1].copy()
    scores[50:60] = scores[50]  # a tie run
    valid = rng.rand(n) > 0.1   # interspersed invalid entries
    args = (jnp.array(boxes), jnp.array(scores), jnp.array(valid), 0.5)

    ref_keep, _ = nms_fixed(*args)
    fast_keep, fast_order = nms_fixed(*args, assume_sorted=True)
    np.testing.assert_array_equal(np.asarray(fast_keep), np.asarray(ref_keep))
    np.testing.assert_array_equal(np.asarray(fast_order), np.arange(n))

    pk, _ = nms_fixed_pallas(*args, interpret=True, assume_sorted=True)
    np.testing.assert_array_equal(np.asarray(pk), np.asarray(ref_keep))


def test_nms_max_keep_prefix_exact():
    """max_keep early exit: keep flags are a prefix (in score order) of the
    full run's — every kept box is kept by the full run, the first
    max_keep kept boxes match exactly, and at least max_keep are kept
    whenever the full run keeps that many. Both backends, multi-tile
    inputs (multiple cross-tile sweep blocks), tile-boundary budgets."""
    from fewshotobjectdetection_imporove_via_text_feature_tpu.ops.nms_pallas import (
        nms_fixed_pallas,
    )

    rng = np.random.RandomState(11)
    n = 2048  # 16 tiles, 2 sweep blocks
    boxes = rand_boxes(rng, n, size=400)
    scores = np.sort(rng.uniform(0, 1, n).astype(np.float32))[::-1].copy()
    valid = rng.rand(n) > 0.05
    args = (jnp.array(boxes), jnp.array(scores), jnp.array(valid), 0.5)

    full, _ = nms_fixed(*args, assume_sorted=True)
    full = np.asarray(full)
    total_kept = int(full.sum())
    assert total_kept > 200  # the budgets below actually bite

    for mk in [1, 100, 128, 500, total_kept, n]:
        for backend in ("xla", "pallas"):
            if backend == "xla":
                keep, _ = nms_fixed(*args, assume_sorted=True, max_keep=mk)
            else:
                keep, _ = nms_fixed_pallas(
                    *args, interpret=True, assume_sorted=True, max_keep=mk
                )
            keep = np.asarray(keep)
            # subset of the full run, and a PREFIX of it in score order
            assert not (keep & ~full).any()
            kept_pos = np.where(keep)[0]
            full_pos = np.where(full)[0]
            np.testing.assert_array_equal(
                kept_pos, full_pos[: len(kept_pos)]
            )
            # budget honored: at least min(mk, total) kept
            assert keep.sum() >= min(mk, total_kept)


def test_nms_max_keep_unsorted_path():
    """max_keep composes with the argsort path (keep scattered back to the
    original order): the first-max_keep kept set matches the full run."""
    rng = np.random.RandomState(13)
    n = 640
    boxes = rand_boxes(rng, n, size=200)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    valid = np.ones(n, bool)
    args = (jnp.array(boxes), jnp.array(scores), jnp.array(valid), 0.5)
    full, order = nms_fixed(*args)
    lim, _ = nms_fixed(*args, max_keep=64)
    full, lim, order = map(np.asarray, (full, lim, order))
    assert not (lim & ~full).any()
    # in score order, lim's kept sequence is a prefix of full's
    np.testing.assert_array_equal(
        np.where(lim[order])[0], np.where(full[order])[0][: lim.sum()]
    )
    assert lim.sum() >= min(64, full.sum())


def test_nms_auto_explicit_pallas_on_cpu(monkeypatch):
    """FSODTF_NMS=pallas on a CPU backend must run the kernel in interpret
    mode (exact) instead of crashing in Mosaic lowering — the off-TPU way
    to drive the kernel's code path (e.g. CPU serving exports traced with
    the env var set)."""
    from fewshotobjectdetection_imporove_via_text_feature_tpu.ops.nms import (
        nms_auto,
    )

    rng = np.random.RandomState(5)
    n = 200
    boxes = rand_boxes(rng, n, size=200)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    valid = np.ones(n, bool)
    args = (jnp.array(boxes), jnp.array(scores), jnp.array(valid), 0.5)
    ref_keep, ref_order = nms_fixed(*args)
    monkeypatch.setenv("FSODTF_NMS", "pallas")
    keep, order = nms_auto(*args)
    np.testing.assert_array_equal(np.asarray(keep), np.asarray(ref_keep))
    np.testing.assert_array_equal(np.asarray(order), np.asarray(ref_order))


def test_nms_chain_revival():
    # A suppresses B, B suppresses C, A does not suppress C -> C survives.
    boxes = np.array(
        [[0, 0, 10, 10], [5, 0, 15, 10], [10.5, 0, 20.5, 10]], np.float32
    )
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    keep, _ = nms_fixed(
        jnp.array(boxes), jnp.array(scores), jnp.ones(3, bool), 0.3
    )
    assert np.asarray(keep).tolist() == [True, False, True]


def test_nms_respects_padding():
    rng = np.random.RandomState(1)
    boxes = rand_boxes(rng, 50, size=100)
    scores = rng.uniform(0, 1, 50).astype(np.float32)
    valid = np.ones(50, bool)
    valid[30:] = False
    keep, _ = nms_fixed(
        jnp.array(boxes), jnp.array(scores), jnp.array(valid), 0.5
    )
    keep = np.asarray(keep)
    assert not keep[30:].any()
    ref = np_greedy_nms(boxes[:30], scores[:30], 0.5)
    np.testing.assert_array_equal(keep[:30], ref)


def test_nms_cross_tile():
    # >TILE boxes to exercise the tiled cross-suppression path.
    rng = np.random.RandomState(2)
    boxes = rand_boxes(rng, 300, size=150)
    scores = rng.uniform(0, 1, 300).astype(np.float32)
    keep, _ = nms_fixed(
        jnp.array(boxes), jnp.array(scores), jnp.ones(300, bool), 0.5
    )
    ref = np_greedy_nms(boxes, scores, 0.5)
    np.testing.assert_array_equal(np.asarray(keep), ref)


def test_batched_nms_classes_dont_interact():
    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11]], np.float32)
    scores = np.array([0.9, 0.8], np.float32)
    # same class -> second suppressed; different class -> both kept
    keep_same, _ = batched_nms_fixed(
        jnp.array(boxes), jnp.array(scores), jnp.array([0, 0]),
        jnp.ones(2, bool), 0.5,
    )
    keep_diff, _ = batched_nms_fixed(
        jnp.array(boxes), jnp.array(scores), jnp.array([0, 1]),
        jnp.ones(2, bool), 0.5,
    )
    assert np.asarray(keep_same).tolist() == [True, False]
    assert np.asarray(keep_diff).tolist() == [True, True]
