"""Fixed-shape greedy NMS for TPU — tiled, jit-safe, vmap-able.

TPU-native replacement for the torchvision CUDA ``batched_nms`` the reference
uses at defrcn/modeling/roi_heads/fast_rcnn.py:125 and in RPN proposal
selection (vendored spec proposal_utils.py:105).

Exact greedy NMS is inherently sequential; the TPU design processes boxes in
score-descending tiles of ``TILE`` boxes:

  * cross-tile: boxes already kept by earlier tiles suppress the current tile
    in ONE vectorized IoU pass per tile (VPU-friendly (TILE, N) work),
  * within-tile: greedy suppression is computed as a monotone fixpoint with a
    ``while_loop`` (converges in a handful of iterations instead of TILE
    sequential steps).

Sequential step count is therefore ~N/TILE instead of N. Results are exactly
the greedy-NMS keep set with torchvision tie-breaking (stable score sort,
earlier index wins ties).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .box_ops import pairwise_iou

TILE = 128


def _self_suppress(iou_tile: jnp.ndarray, active: jnp.ndarray) -> jnp.ndarray:
    """Greedy suppression within one score-sorted tile.

    iou_tile: (T, T) IoU between tile boxes (score-descending order).
    active: (T,) candidates still alive entering the tile.

    Returns the exact greedy keep mask: box k kept iff active[k] and no kept
    j < k has IoU > 0 in the thresholded matrix (iou_tile is pre-thresholded
    to a boolean "suppresses" matrix by the caller).
    """
    t = iou_tile.shape[0]
    # upper[j, k] = True when j < k (only earlier boxes can suppress).
    rows = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
    sup = iou_tile & (rows < cols)  # (T, T) bool

    def cond(state):
        keep, changed = state
        return changed

    def body(state):
        keep, _ = state
        # A box is suppressed if any currently-kept earlier box overlaps it.
        suppressed = jnp.any(sup & keep[:, None], axis=0)
        new_keep = active & ~suppressed
        return new_keep, jnp.any(new_keep != keep)

    keep0 = active
    keep, _ = jax.lax.while_loop(cond, body, (keep0, jnp.bool_(True)))
    return keep


@partial(
    jax.jit, static_argnames=("iou_threshold", "assume_sorted", "max_keep")
)
def nms_fixed(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float,
    assume_sorted: bool = False,
    max_keep: int | None = None,
):
    """Greedy NMS over a fixed-size padded box set.

    Args:
        boxes: (N, 4) XYXY. N should be a multiple of TILE (padded by caller
            or internally here).
        scores: (N,) — invalid entries may hold any value.
        valid: (N,) bool — padding mask.
        iou_threshold: suppression threshold (strictly-greater comparison,
            matching torchvision: IoU > threshold suppresses).
        assume_sorted: caller guarantees ``scores`` of VALID entries are
            already descending in input order (e.g. straight out of
            ``top_k``) — skips the internal stable sort + scatter. The
            keep set is identical (invalid entries never suppress, so
            their positions don't matter); ``order`` is then the iota.
        max_keep: early-exit budget for callers that consume only the
            first ``max_keep`` kept boxes in score order (RPN post-NMS
            top-k, Fast R-CNN top-k). Greedy NMS is strictly forward
            (a box's fate depends only on higher-scored boxes), so once
            a whole tile boundary passes with >= max_keep boxes kept,
            later tiles cannot change those decisions — they are skipped
            and their keep flags stay False. The first max_keep kept
            boxes are EXACTLY those of the full run; flags beyond them
            may be missing. None = run every tile (full keep set).

    Returns:
        keep: (N,) bool in the ORIGINAL box order.
        order: (N,) int32 — score-descending order (stable) so
            ``order[keep[order]]`` enumerates kept boxes by score.
    """
    n = boxes.shape[0]
    pad = (-n) % TILE
    if pad:
        boxes = jnp.pad(boxes, ((0, pad), (0, 0)))
        scores = jnp.pad(scores, (0, pad))
        valid = jnp.pad(valid, (0, pad))
    np_ = boxes.shape[0]
    num_tiles = np_ // TILE

    if assume_sorted:
        order = jnp.arange(np_, dtype=jnp.int32)
        sboxes = boxes
        svalid = valid
    else:
        neg_inf = jnp.asarray(-jnp.inf, scores.dtype)
        sort_scores = jnp.where(valid, scores, neg_inf)
        order = jnp.argsort(-sort_scores, stable=True).astype(jnp.int32)
        sboxes = boxes[order]
        svalid = valid[order]

    def tile_step(i, keep):
        sl = i * TILE
        tb = jax.lax.dynamic_slice(sboxes, (sl, 0), (TILE, 4))
        tv = jax.lax.dynamic_slice_in_dim(svalid, sl, TILE)

        # Earlier kept boxes (strictly before this tile) suppress the tile.
        iou_all = pairwise_iou(tb, sboxes)  # (T, Np)
        idx = jax.lax.broadcasted_iota(jnp.int32, (np_,), 0)
        earlier_kept = keep & (idx < sl)
        suppressed = jnp.any(
            (iou_all > iou_threshold) & earlier_kept[None, :], axis=1
        )
        active = tv & ~suppressed

        # Exact greedy within the tile.
        iou_tile = pairwise_iou(tb, tb) > iou_threshold
        tile_keep = _self_suppress(iou_tile, active)

        return jax.lax.dynamic_update_slice_in_dim(keep, tile_keep, sl, axis=0)

    keep0 = jnp.zeros((np_,), jnp.bool_)
    if max_keep is None:
        keep_sorted = jax.lax.fori_loop(0, num_tiles, tile_step, keep0)
    else:
        # stop at the first tile boundary where max_keep boxes are kept;
        # identical tile results up to that boundary (see docstring)
        def cond(state):
            i, _, count = state
            return (i < num_tiles) & (count < max_keep)

        def body(state):
            i, keep, count = state
            keep = tile_step(i, keep)
            tile_keep = jax.lax.dynamic_slice_in_dim(keep, i * TILE, TILE)
            return i + 1, keep, count + jnp.sum(tile_keep.astype(jnp.int32))

        _, keep_sorted, _ = jax.lax.while_loop(
            cond, body, (jnp.int32(0), keep0, jnp.int32(0))
        )

    if assume_sorted:
        keep = keep_sorted
    else:
        keep = jnp.zeros((np_,), jnp.bool_).at[order].set(keep_sorted)
    return keep[:n], order[:n]


def nms_auto(boxes, scores, valid, iou_threshold, assume_sorted=False,
             max_keep=None):
    """Backend-aware NMS: the Pallas VMEM kernel on TPU (no per-tile XLA
    loop overhead), the XLA tiled version elsewhere (CPU tests, platforms
    without Mosaic). Override with FSODTF_NMS=xla|pallas. Both backends
    stop at the same tile boundary under ``max_keep``, so their keep sets
    stay bit-identical. An explicit FSODTF_NMS=pallas on a CPU backend
    runs the kernel in interpret mode (exact, slow) instead of crashing
    in Mosaic lowering — it exists so the kernel's code path can be
    driven off-TPU."""
    import os

    choice = os.environ.get("FSODTF_NMS", "auto")
    use_pallas = (
        choice == "pallas"
        or (choice == "auto" and jax.default_backend() not in ("cpu",))
    )
    if use_pallas:
        from .nms_pallas import nms_fixed_pallas

        return nms_fixed_pallas(
            boxes, scores, valid, iou_threshold, assume_sorted=assume_sorted,
            max_keep=max_keep,
            interpret=(jax.default_backend() == "cpu"),
        )
    return nms_fixed(
        boxes, scores, valid, iou_threshold, assume_sorted=assume_sorted,
        max_keep=max_keep,
    )


def batched_nms_fixed(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    idxs: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float,
    assume_sorted: bool = False,
    max_keep=None,
):
    """Class-aware NMS via the coordinate-offset trick (torchvision
    ``batched_nms``): boxes of different ``idxs`` never overlap.

    Boxes must be non-degenerate or masked invalid. The class offsets
    leave scores untouched, so ``assume_sorted``/``max_keep`` pass
    straight through.
    """
    if boxes.shape[0] == 0:
        return valid, jnp.zeros((0,), jnp.int32)
    max_coord = jnp.max(jnp.where(valid[:, None], boxes, 0.0)) + 1.0
    offsets = idxs.astype(boxes.dtype) * max_coord
    shifted = boxes + offsets[:, None]
    return nms_auto(
        shifted, scores, valid, iou_threshold, assume_sorted=assume_sorted,
        max_keep=max_keep,
    )
