"""Fast R-CNN output layers, losses, and fixed-shape inference.

Spec source: defrcn/modeling/roi_heads/fast_rcnn.py —
FastRCNNOutputLayers (:364-417, incl. the ``att_x`` second input that routes
attended features to the cls head and the 0.8-rate cls dropout),
FastRCNNAttentionOutputLayers (:422-475, raw attended scores),
FastRCNNOutputs losses (:222-304) and inference (:90-134).

TPU re-design: losses are masked means/sums over a fixed (B, S) sample grid;
inference is a masked score-filter + class-offset tiled NMS over a static
candidate budget instead of dynamic nonzero gathers.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import decode_deltas, encode_deltas, clip_boxes
from ..ops.nms import batched_nms_fixed


class FastRCNNOutputLayers(nn.Module):
    """Linear cls(K+1) + box(4K or 4) heads.

    ``att_x`` (optional) replaces the classification input (ref
    fast_rcnn.py:403-417); cls dropout (p=DROPOUT_RATIO) applies to the cls
    input only, train-time only.
    """

    num_classes: int
    cls_agnostic_bbox_reg: bool = False
    cls_dropout: bool = False
    dropout_ratio: float = 0.8
    box_dim: int = 4
    attention_scores_as_logits: bool = False  # FastRCNNAttentionOutputLayers

    @nn.compact
    def __call__(self, x, att_x=None, *, train: bool = False):
        if x.ndim > 2:
            x = x.reshape(x.shape[0], -1)
        num_reg = 1 if self.cls_agnostic_bbox_reg else self.num_classes
        deltas = nn.Dense(
            num_reg * self.box_dim,
            kernel_init=nn.initializers.normal(0.001),
            bias_init=nn.initializers.zeros,
            name="bbox_pred",
        )(x)

        cls_in = x if att_x is None else att_x
        if self.cls_dropout and train:
            cls_in = nn.Dropout(rate=self.dropout_ratio, deterministic=False)(
                cls_in
            )
        if self.attention_scores_as_logits:
            scores = cls_in
        else:
            scores = nn.Dense(
                self.num_classes + 1,
                kernel_init=nn.initializers.normal(0.01),
                bias_init=nn.initializers.zeros,
                name="cls_score",
            )(cls_in)
        return scores, deltas


def fast_rcnn_losses(
    pred_logits: jnp.ndarray,      # (R, K+1)
    pred_deltas: jnp.ndarray,      # (R, K*4) or (R, 4)
    proposal_boxes: jnp.ndarray,   # (R, 4)
    gt_boxes: jnp.ndarray,         # (R, 4) matched GT box per sample
    gt_classes: jnp.ndarray,       # (R,) in [0, K] (K = background)
    valid: jnp.ndarray,            # (R,) sampled-slot mask
    num_classes: int,
    box_reg_weights=(10.0, 10.0, 5.0, 5.0),
    smooth_l1_beta: float = 0.0,
):
    """Softmax CE (mean over valid) + smooth-L1 on fg rows (sum / #valid).

    Ref fast_rcnn.py:222-304. Padded slots contribute nothing.
    """
    r = pred_logits.shape[0]
    nvalid = jnp.maximum(jnp.sum(valid), 1)

    # classification: cross entropy, mean over valid rows
    logp = jax.nn.log_softmax(pred_logits, axis=-1)
    safe_cls = jnp.clip(gt_classes, 0, num_classes)
    ce = -jnp.take_along_axis(logp, safe_cls[:, None], axis=1)[:, 0]
    loss_cls = jnp.sum(jnp.where(valid, ce, 0.0)) / nvalid

    # regression: only fg rows, class-specific delta columns
    fg = valid & (gt_classes >= 0) & (gt_classes < num_classes)
    gt_deltas = encode_deltas(proposal_boxes, gt_boxes, box_reg_weights)

    if pred_deltas.shape[-1] == 4:
        pd = pred_deltas
    else:
        pd = pred_deltas.reshape(r, num_classes, 4)
        cls_idx = jnp.clip(gt_classes, 0, num_classes - 1)
        pd = jnp.take_along_axis(pd, cls_idx[:, None, None], axis=1)[:, 0]

    diff = pd - gt_deltas
    if smooth_l1_beta > 0:
        ad = jnp.abs(diff)
        l1 = jnp.where(
            ad < smooth_l1_beta,
            0.5 * diff * diff / smooth_l1_beta,
            ad - 0.5 * smooth_l1_beta,
        )
    else:
        l1 = jnp.abs(diff)
    loss_box = jnp.sum(jnp.where(fg[:, None], l1, 0.0)) / nvalid

    return {"loss_cls": loss_cls, "loss_box_reg": loss_box}


def fast_rcnn_inference(
    pred_logits: jnp.ndarray,      # (P, K+1)
    pred_deltas: jnp.ndarray,      # (P, K*4) or (P, 4)
    proposal_boxes: jnp.ndarray,   # (P, 4)
    proposal_valid: jnp.ndarray,   # (P,)
    image_hw,                      # (2,) valid size in the network frame
    num_classes: int,
    score_thresh: float = 0.05,
    nms_thresh: float = 0.5,
    topk_per_image: int = 100,
    candidate_topk: int = 1024,
    box_reg_weights=(10.0, 10.0, 5.0, 5.0),
):
    """Single-image fixed-shape Fast R-CNN inference
    (ref fast_rcnn.py:90-134):

      softmax -> drop bg column -> threshold -> per-class NMS -> top-k.

    Dynamic nonzero gathers become a static ``candidate_topk`` budget: the
    best-scoring (proposal, class) pairs above threshold enter NMS.

    Returns (boxes (D,4), scores (D,), classes (D,), valid (D,)) with
    D = topk_per_image, in the network image frame.
    """
    p = pred_logits.shape[0]
    scores = jax.nn.softmax(pred_logits, axis=-1)[:, :-1]  # (P, K)

    if pred_deltas.shape[-1] == 4:
        boxes = decode_deltas(pred_deltas, proposal_boxes, box_reg_weights)
        boxes = jnp.broadcast_to(boxes[:, None, :], (p, num_classes, 4))
    else:
        boxes = decode_deltas(
            pred_deltas, proposal_boxes, box_reg_weights
        ).reshape(p, num_classes, 4)
    boxes = clip_boxes(
        boxes, (image_hw[0].astype(boxes.dtype), image_hw[1].astype(boxes.dtype))
    )

    cand_mask = (
        (scores > score_thresh)
        & proposal_valid[:, None]
    ).reshape(-1)
    flat_scores = jnp.where(cand_mask, scores.reshape(-1), -1.0)

    k = min(candidate_topk, flat_scores.shape[0])
    top_scores, top_idx = jax.lax.top_k(flat_scores, k)
    top_valid = top_scores > 0.0
    top_boxes = boxes.reshape(-1, 4)[top_idx]
    top_classes = (top_idx % num_classes).astype(jnp.int32)

    # top_scores are descending out of top_k (invalid = -1 fill sorts
    # last), so NMS can skip its internal stable re-sort; only the first
    # topk_per_image kept entries survive below, so it may also stop once
    # that many are kept (max_keep early exit — exact, see ops/nms.py)
    keep, order = batched_nms_fixed(
        top_boxes, top_scores, top_classes, top_valid, nms_thresh,
        assume_sorted=True, max_keep=topk_per_image,
    )
    keep_sorted = keep[order]
    d = topk_per_image
    rank = jnp.cumsum(keep_sorted) - 1
    slot = jnp.where(keep_sorted, jnp.minimum(rank, d), d)
    out_boxes = jnp.zeros((d + 1, 4), boxes.dtype).at[slot].set(
        top_boxes[order], mode="drop"
    )
    out_scores = jnp.zeros((d + 1,), scores.dtype).at[slot].set(
        top_scores[order], mode="drop"
    )
    out_classes = jnp.zeros((d + 1,), jnp.int32).at[slot].set(
        top_classes[order], mode="drop"
    )
    out_valid = jnp.zeros((d + 1,), bool).at[slot].set(
        keep_sorted & (rank < d), mode="drop"
    )
    return (
        out_boxes[:d],
        out_scores[:d],
        out_classes[:d],
        out_valid[:d],
    )


def rescale_detections(
    boxes: jnp.ndarray, image_hw, orig_hw
) -> jnp.ndarray:
    """detector_postprocess: scale boxes from the resized network frame back
    to original image coordinates and clip."""
    sy = orig_hw[0].astype(boxes.dtype) / image_hw[0].astype(boxes.dtype)
    sx = orig_hw[1].astype(boxes.dtype) / image_hw[1].astype(boxes.dtype)
    scaled = boxes * jnp.stack([sx, sy, sx, sy])
    return clip_boxes(
        scaled, (orig_hw[0].astype(boxes.dtype), orig_hw[1].astype(boxes.dtype))
    )
