"""Pallas NMS kernel vs the reference-exact nms_fixed (interpret mode on
CPU; the same kernel compiles with Mosaic on TPU)."""

import numpy as np
import jax.numpy as jnp

from fewshotobjectdetection_imporove_via_text_feature_tpu.ops import nms_fixed
from fewshotobjectdetection_imporove_via_text_feature_tpu.ops.nms_pallas import (
    nms_fixed_pallas,
)
from tests.test_box_ops import rand_boxes


def _compare(n, seed, thresh, valid_frac=1.0):
    rng = np.random.RandomState(seed)
    boxes = rand_boxes(rng, n, size=300)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    valid = rng.uniform(0, 1, n) < valid_frac
    keep_ref, _ = nms_fixed(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid), thresh
    )
    keep_pl, _ = nms_fixed_pallas(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid), thresh,
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(keep_pl), np.asarray(keep_ref))


def test_pallas_nms_matches_single_tile():
    _compare(100, 0, 0.5)


def test_pallas_nms_matches_multi_tile():
    _compare(300, 1, 0.7)


def test_pallas_nms_with_padding_and_invalid():
    _compare(200, 2, 0.5, valid_frac=0.7)


def test_pallas_nms_multi_block_cross_sweep():
    # N > BLK_TILES*TILE (1024) exercises the cross-tile sweep over
    # MULTIPLE earlier blocks (the production train-time configuration is
    # N=12000, i.e. 12 blocks) — the earlier_block loop bound
    # nblocks = (i*t + blkc - 1) // blkc and the overhang-contributes-
    # nothing invariant only matter here. Sorted-score order matches the
    # production caller (nms_fixed_pallas re-sorts internally either way).
    _compare(1400, 4, 0.5)
    _compare(2200, 5, 0.7, valid_frac=0.8)


def test_pallas_nms_dense_overlaps():
    rng = np.random.RandomState(3)
    # many heavy overlaps -> deep suppression chains
    base = rand_boxes(rng, 40, size=100)
    jitter = base[None] + rng.uniform(-8, 8, (8, 40, 4))
    boxes = jitter.reshape(-1, 4).astype(np.float32)
    scores = rng.uniform(0, 1, len(boxes)).astype(np.float32)
    valid = np.ones(len(boxes), bool)
    keep_ref, _ = nms_fixed(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid), 0.5
    )
    keep_pl, _ = nms_fixed_pallas(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid), 0.5,
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(keep_pl), np.asarray(keep_ref))
