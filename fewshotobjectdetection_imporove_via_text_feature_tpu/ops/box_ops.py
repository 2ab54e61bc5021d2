"""Box geometry ops — vectorized, fixed-shape, jit-safe.

TPU-native equivalents of the reference's detectron2 native ops:
  * pairwise IoU matrix          (ref: detectron2 ``pairwise_iou``, used at
    defrcn/modeling/roi_heads/roi_heads.py:200 and the vendored RPN spec
    defrcn/modeling/proposal_generator/rpn.py:301)
  * Box2BoxTransform encode/decode (ref: detectron2 ``Box2BoxTransform``,
    constructed at defrcn/modeling/roi_heads/roi_heads.py:114 with
    BBOX_REG_WEIGHTS, RPN spec rpn.py:234 with weights (1,1,1,1))
  * clip / area / nonempty       (ref: detectron2 ``Boxes`` methods used in
    proposal_utils.py and fast_rcnn.py:108-110)

All boxes are XYXY float arrays with shape (..., 4). Everything broadcasts and
works under vmap; nothing allocates data-dependent shapes.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

# detectron2 clamps predicted dw/dh so exp() cannot overflow:
# _DEFAULT_SCALE_CLAMP = log(1000.0 / 16).
SCALE_CLAMP = math.log(1000.0 / 16.0)


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    """Area of XYXY boxes; shape (..., 4) -> (...)."""
    return (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])


def pairwise_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """IoU matrix between two sets of boxes.

    Args:
        boxes1: (M, 4), boxes2: (N, 4) in XYXY.

    Returns:
        (M, N) IoU; rows with zero-area boxes yield 0 (matches detectron2,
        which computes inter/(a1+a2-inter) and gets 0/area2 = 0 for degenerate
        zero boxes as long as the denominator is nonzero; we guard /0).
    """
    area1 = box_area(boxes1)  # (M,)
    area2 = box_area(boxes2)  # (N,)

    lt = jnp.maximum(boxes1[:, None, :2], boxes2[None, :, :2])  # (M, N, 2)
    rb = jnp.minimum(boxes1[:, None, 2:], boxes2[None, :, 2:])  # (M, N, 2)
    wh = jnp.clip(rb - lt, 0.0, None)
    inter = wh[..., 0] * wh[..., 1]  # (M, N)

    union = area1[:, None] + area2[None, :] - inter
    return jnp.where(union > 0, inter / jnp.where(union > 0, union, 1.0), 0.0)


def encode_deltas(
    src_boxes: jnp.ndarray,
    target_boxes: jnp.ndarray,
    weights: tuple[float, float, float, float] = (1.0, 1.0, 1.0, 1.0),
) -> jnp.ndarray:
    """Box2BoxTransform.get_deltas: (dx, dy, dw, dh) from src to target.

    dx = wx * (tcx - scx) / sw, dw = ww * log(tw / sw), etc. Degenerate source
    boxes (w or h <= 0) are guarded to avoid inf/nan under padding; their
    deltas are meaningless and must be masked by the caller.
    """
    wx, wy, ww, wh = weights
    src_w = src_boxes[..., 2] - src_boxes[..., 0]
    src_h = src_boxes[..., 3] - src_boxes[..., 1]
    src_cx = src_boxes[..., 0] + 0.5 * src_w
    src_cy = src_boxes[..., 1] + 0.5 * src_h

    tgt_w = target_boxes[..., 2] - target_boxes[..., 0]
    tgt_h = target_boxes[..., 3] - target_boxes[..., 1]
    tgt_cx = target_boxes[..., 0] + 0.5 * tgt_w
    tgt_cy = target_boxes[..., 1] + 0.5 * tgt_h

    safe_w = jnp.where(src_w > 0, src_w, 1.0)
    safe_h = jnp.where(src_h > 0, src_h, 1.0)
    safe_tw = jnp.where(tgt_w > 0, tgt_w, 1.0)
    safe_th = jnp.where(tgt_h > 0, tgt_h, 1.0)

    dx = wx * (tgt_cx - src_cx) / safe_w
    dy = wy * (tgt_cy - src_cy) / safe_h
    dw = ww * jnp.log(safe_tw / safe_w)
    dh = wh * jnp.log(safe_th / safe_h)
    return jnp.stack([dx, dy, dw, dh], axis=-1)


def decode_deltas(
    deltas: jnp.ndarray,
    boxes: jnp.ndarray,
    weights: tuple[float, float, float, float] = (1.0, 1.0, 1.0, 1.0),
) -> jnp.ndarray:
    """Box2BoxTransform.apply_deltas.

    Args:
        deltas: (..., K*4) — K classes of deltas per box (K may be 1).
        boxes:  (..., 4) source boxes.

    Returns:
        (..., K*4) decoded XYXY boxes.
    """
    wx, wy, ww, wh = weights
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    cx = boxes[..., 0] + 0.5 * w
    cy = boxes[..., 1] + 0.5 * h

    shape = deltas.shape
    k4 = shape[-1]
    dx = deltas[..., 0::4] / wx  # (..., K)
    dy = deltas[..., 1::4] / wy
    dw = jnp.minimum(deltas[..., 2::4] / ww, SCALE_CLAMP)
    dh = jnp.minimum(deltas[..., 3::4] / wh, SCALE_CLAMP)

    pred_cx = dx * w[..., None] + cx[..., None]
    pred_cy = dy * h[..., None] + cy[..., None]
    pred_w = jnp.exp(dw) * w[..., None]
    pred_h = jnp.exp(dh) * h[..., None]

    out = jnp.stack(
        [
            pred_cx - 0.5 * pred_w,
            pred_cy - 0.5 * pred_h,
            pred_cx + 0.5 * pred_w,
            pred_cy + 0.5 * pred_h,
        ],
        axis=-1,
    )  # (..., K, 4)
    return out.reshape(*shape[:-1], k4)


def clip_boxes(boxes: jnp.ndarray, image_hw) -> jnp.ndarray:
    """Clip XYXY boxes to [0, w] x [0, h]. image_hw = (h, w) scalars/arrays."""
    h, w = image_hw[0], image_hw[1]
    x1 = jnp.clip(boxes[..., 0], 0.0, w)
    y1 = jnp.clip(boxes[..., 1], 0.0, h)
    x2 = jnp.clip(boxes[..., 2], 0.0, w)
    y2 = jnp.clip(boxes[..., 3], 0.0, h)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def nonempty_mask(boxes: jnp.ndarray, threshold: float = 0.0) -> jnp.ndarray:
    """Boxes.nonempty: width > threshold AND height > threshold."""
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    return (w > threshold) & (h > threshold)
