"""Region Proposal Network — batched, fixed-shape, jit-compiled end to end.

Spec source: the reference's vendored detectron2 RPN copy, which documents
the architecture the live code builds via detectron2
(defrcn/modeling/proposal_generator/rpn.py — StandardRPNHead 3x3 conv +
1x1 objectness/deltas; label_and_sample_anchors at :269-325; losses at
:327-395; proposal selection spec in proposal_utils.py:14-120).

TPU re-design:
  * anchors are a compile-time constant per feature shape;
  * per-image matching/sampling is vmapped, not looped;
  * proposal selection = top-k (static) -> decode -> clip -> tiled NMS ->
    fixed POST_NMS slots with a validity mask.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops import (
    decode_deltas,
    encode_deltas,
    pairwise_iou,
    clip_boxes,
    nonempty_mask,
    match_proposals,
    subsample_labels,
    nms_fixed,
)
from ..structures import GTInstances, Proposals


def cell_anchors(
    sizes=(32, 64, 128, 256, 512), aspect_ratios=(0.5, 1.0, 2.0)
) -> np.ndarray:
    """(A, 4) zero-centered anchors; sizes outer x ratios inner."""
    cell = []
    for size in sizes:
        area = float(size) ** 2
        for ratio in aspect_ratios:
            w = np.sqrt(area / ratio)
            h = w * ratio
            cell.append([-w / 2.0, -h / 2.0, w / 2.0, h / 2.0])
    return np.asarray(cell, np.float32)


def generate_anchors(
    feat_hw: Tuple[int, int],
    stride: int = 16,
    sizes=(32, 64, 128, 256, 512),
    aspect_ratios=(0.5, 1.0, 2.0),
    offset: float = 0.0,
) -> np.ndarray:
    """Dense anchors, detectron2 DefaultAnchorGenerator layout.

    Cell anchors iterate sizes (outer) x ratios (inner); grid is row-major
    over (y, x); final index = (y * W + x) * A + a, matching the (N, H, W, A)
    flattening of the head outputs.

    Returns float32 (H*W*A, 4) — a numpy constant baked into the jit program.
    """
    cell = cell_anchors(sizes, aspect_ratios)  # (A, 4)

    h, w = feat_hw
    shift_x = (np.arange(w, dtype=np.float32) + offset) * stride
    shift_y = (np.arange(h, dtype=np.float32) + offset) * stride
    sx, sy = np.meshgrid(shift_x, shift_y)  # (H, W) row-major over y
    shifts = np.stack([sx, sy, sx, sy], axis=-1).reshape(-1, 1, 4)
    anchors = (shifts + cell[None]).reshape(-1, 4)
    return anchors


class RPNHead(nn.Module):
    """StandardRPNHead: shared 3x3 conv -> 1x1 objectness + 1x1 deltas."""

    num_anchors: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        t = nn.Conv(
            c, (3, 3), padding="SAME", dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=nn.initializers.normal(0.01), name="conv",
        )(x)
        t = nn.relu(t)
        logits = nn.Conv(
            self.num_anchors, (1, 1), dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=nn.initializers.normal(0.01), name="objectness_logits",
        )(t)
        deltas = nn.Conv(
            self.num_anchors * 4, (1, 1), dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=nn.initializers.normal(0.01), name="anchor_deltas",
        )(t)
        b, h, w, a = logits.shape
        logits = logits.reshape(b, h * w * a).astype(jnp.float32)
        deltas = deltas.reshape(b, h * w * a, 4).astype(jnp.float32)
        return logits, deltas


def label_and_sample_anchors(
    key,
    anchors: jnp.ndarray,
    gt: GTInstances,
    batch_size_per_image: int = 256,
    positive_fraction: float = 0.5,
    iou_thresholds=(0.3, 0.7),
):
    """Per-image anchor labels in {-1, 0, 1} and matched GT boxes.

    vmapped over the batch by the caller. Ref spec rpn.py:269-325.
    """
    iou = pairwise_iou(gt.boxes, anchors)  # (G, N)
    matched_idx, labels = match_proposals(
        iou, gt.valid, list(iou_thresholds), [0, -1, 1],
        allow_low_quality_matches=True,
    )
    labels = subsample_labels(
        key, labels, batch_size_per_image, positive_fraction, 0
    )
    # one-hot matmul instead of a row gather: gathering (N,) rows from the
    # tiny (G, 4) table costs ~6 ms/step on v5e; the (N, G) @ (G, 4) matmul
    # is ~1 ms and fuses with the iota compare.
    onehot = jax.nn.one_hot(matched_idx, gt.boxes.shape[0], dtype=jnp.float32)
    matched_boxes = onehot @ gt.boxes.astype(jnp.float32)  # (N, 4)
    return labels, matched_boxes


def rpn_losses(
    pred_logits: jnp.ndarray,   # (B, N)
    pred_deltas: jnp.ndarray,   # (B, N, 4)
    anchors: jnp.ndarray,       # (N, 4)
    gt_labels: jnp.ndarray,     # (B, N) in {-1, 0, 1}
    matched_boxes: jnp.ndarray,  # (B, N, 4)
    batch_size_per_image: int = 256,
    smooth_l1_beta: float = 0.0,
    bbox_reg_weights=(1.0, 1.0, 1.0, 1.0),
    loss_weight: float = 1.0,
    bbox_reg_loss_weight: float = 1.0,
):
    """Objectness BCE + smooth-L1 on positives, both normalized by
    B * batch_size_per_image (ref rpn.py:327-395). ``loss_weight``
    scales both losses (d2 RPN.LOSS_WEIGHT); ``bbox_reg_loss_weight``
    additionally scales the localization term."""
    b = pred_logits.shape[0]
    normalizer = float(b * batch_size_per_image)

    pos = gt_labels == 1
    valid = gt_labels >= 0

    gt_deltas = encode_deltas(
        anchors[None], matched_boxes, bbox_reg_weights
    )  # (B, N, 4)
    diff = pred_deltas - gt_deltas
    if smooth_l1_beta > 0:
        ad = jnp.abs(diff)
        loc = jnp.where(
            ad < smooth_l1_beta,
            0.5 * diff * diff / smooth_l1_beta,
            ad - 0.5 * smooth_l1_beta,
        )
    else:
        loc = jnp.abs(diff)
    loss_loc = jnp.sum(jnp.where(pos[..., None], loc, 0.0)) / normalizer

    # Binary cross entropy with logits over sampled anchors.
    labels_f = (gt_labels == 1).astype(jnp.float32)
    z = pred_logits
    bce = jnp.maximum(z, 0.0) - z * labels_f + jnp.log1p(jnp.exp(-jnp.abs(z)))
    loss_cls = jnp.sum(jnp.where(valid, bce, 0.0)) / normalizer

    return {
        "loss_rpn_cls": loss_cls * loss_weight,
        "loss_rpn_loc": loss_loc * loss_weight * bbox_reg_loss_weight,
    }


@partial(
    jax.jit,
    static_argnames=(
        "feat_hw", "stride", "pre_nms_topk", "post_nms_topk", "nms_thresh",
        "min_size", "bbox_reg_weights",
    ),
)
def select_top_proposals(
    pred_logits: jnp.ndarray,   # (B, N)
    pred_deltas: jnp.ndarray,   # (B, N, 4)
    cell: jnp.ndarray,          # (A, 4) cell anchors
    feat_hw: Tuple[int, int],
    stride: int,
    image_hw: jnp.ndarray,      # (B, 2)
    pre_nms_topk: int,
    post_nms_topk: int,
    nms_thresh: float = 0.7,
    min_size: float = 0.0,
    bbox_reg_weights: Tuple[float, float, float, float] = (1.0,) * 4,
) -> Proposals:
    """find_top_rpn_proposals, fixed-shape (spec proposal_utils.py:14-120):
    top-k by objectness -> decode -> clip -> drop empty -> NMS -> top
    post_nms_topk with validity mask. Single-level (C4).

    TPU note: anchor geometry is reconstructed ARITHMETICALLY from the
    top-k indices (grid position = idx // A decomposed by mod/div, shape
    from the (A, 4) cell table) — gathering rows of the dense (N, 4)
    anchor array costs ~28 ms on v5e, the arithmetic is free.
    """
    n = pred_logits.shape[1]
    k = min(pre_nms_topk, n)
    fh, fw = feat_hw
    num_a = cell.shape[0]
    dt = pred_logits.dtype
    # Anchor geometry over the dense (fh, fw, A) grid, arithmetically (no
    # anchor-table gather): broadcast the (A,) cell sizes over grid centers.
    cw = (cell[:, 2] - cell[:, 0]).astype(dt)  # (A,)
    ch = (cell[:, 3] - cell[:, 1]).astype(dt)
    acx = (jnp.arange(fw, dtype=dt) * stride)[None, :, None]   # (1, fw, 1)
    acy = (jnp.arange(fh, dtype=dt) * stride)[:, None, None]   # (fh, 1, 1)
    from ..ops.box_ops import SCALE_CLAMP

    def per_image(logits, deltas, hw):
        # Decode ALL anchors first (pure fused elementwise over the dense
        # grid), then a single row-gather at the top-k indices. The previous
        # formulation gathered the four delta components separately after
        # top_k; four scalar gathers cost more than decoding everything.
        d = deltas.reshape(fh, fw, num_a, 4)
        wx, wy, ww, wh = bbox_reg_weights  # static -> fused constants
        pcx = d[..., 0] / wx * cw + acx
        pcy = d[..., 1] / wy * ch + acy
        pw = jnp.exp(jnp.minimum(d[..., 2] / ww, SCALE_CLAMP)) * cw
        ph = jnp.exp(jnp.minimum(d[..., 3] / wh, SCALE_CLAMP)) * ch
        img_h = hw[0].astype(dt)
        img_w = hw[1].astype(dt)
        x1 = jnp.clip(pcx - 0.5 * pw, 0.0, img_w)
        y1 = jnp.clip(pcy - 0.5 * ph, 0.0, img_h)
        x2 = jnp.clip(pcx + 0.5 * pw, 0.0, img_w)
        y2 = jnp.clip(pcy + 0.5 * ph, 0.0, img_h)
        boxes_all = jnp.stack([x1, y1, x2, y2], axis=-1).reshape(n, 4)
        scores, idx = jax.lax.top_k(logits, k)
        # one batched-source row gather (4 per-plane gathers measure ~2x
        # slower in-context on this backend)
        boxes = boxes_all[idx]
        valid = (boxes[:, 2] - boxes[:, 0] > min_size) & (
            boxes[:, 3] - boxes[:, 1] > min_size
        )
        from ..ops.nms import nms_auto

        # scores come straight from top_k (descending): skip NMS's
        # internal stable re-sort + scatter (assume_sorted contract).
        # Only the first post_nms_topk kept boxes survive below, so NMS
        # may stop once that many are kept (max_keep early exit — exact,
        # see ops/nms.py)
        keep, order = nms_auto(
            boxes, scores, valid, nms_thresh, assume_sorted=True,
            max_keep=post_nms_topk,
        )
        # Enumerate kept boxes in score order, take first post_nms_topk.
        keep_sorted = keep[order]
        # positions of kept entries in sorted order
        rank = jnp.cumsum(keep_sorted) - 1  # rank among kept
        slot_of = jnp.where(keep_sorted, rank, post_nms_topk)  # overflow -> drop
        slot_of = jnp.minimum(slot_of, post_nms_topk)  # clamp to dump slot
        out_boxes = jnp.zeros((post_nms_topk + 1, 4), boxes.dtype)
        out_scores = jnp.full((post_nms_topk + 1,), -jnp.inf, scores.dtype)
        out_valid = jnp.zeros((post_nms_topk + 1,), bool)
        src_boxes = boxes[order]
        src_scores = scores[order]
        out_boxes = out_boxes.at[slot_of].set(src_boxes, mode="drop")
        out_scores = out_scores.at[slot_of].set(src_scores, mode="drop")
        out_valid = out_valid.at[slot_of].set(keep_sorted, mode="drop")
        return out_boxes[:post_nms_topk], out_scores[:post_nms_topk], out_valid[:post_nms_topk]

    boxes, scores, valid = jax.vmap(per_image)(
        pred_logits, pred_deltas, image_hw
    )
    return Proposals(boxes=boxes, objectness=scores, valid=valid)
