"""ROI heads — C4 Res5 head family, batched and fixed-shape.

Spec source: defrcn/modeling/roi_heads/roi_heads.py —
``ROIHeads.label_and_sample_proposals`` (:157-250, incl. appending GT boxes
to proposals), ``Res5ROIHeads`` (:280-386: ROIAlign 7x7 over res4 @1/16 ->
res5 -> global mean pool -> FastRCNN predictor). Text/semantic variants live
in text_heads.py.

TPU re-design: proposals+GT live in a fixed (P+G) slot grid per image;
matching/sampling is vmapped; the pooled ROI batch has static shape
(B, S, 7, 7, C) so res5 compiles to one big MXU-friendly conv stack.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import pairwise_iou, match_proposals, sample_proposals_fixed
from ..ops.roi_align import roi_align_auto
from ..structures import GTInstances, Proposals
from .backbone import Res5Stage
from .fast_rcnn import FastRCNNOutputLayers


def label_and_sample_proposals(
    key,
    proposals: Proposals,
    gt: GTInstances,
    batch_size_per_image: int = 512,
    positive_fraction: float = 0.25,
    num_classes: int = 20,
    iou_threshold: float = 0.5,
    append_gt: bool = True,
):
    """Match proposals+GT against GT, sample a fixed S-slot training set.

    All arrays are per-image (vmap over batch in the caller).

    Returns dict with boxes (S, 4), gt_classes (S,), gt_boxes (S, 4),
    valid (S,).
    """
    if append_gt:
        boxes = jnp.concatenate([proposals.boxes, gt.boxes], axis=0)
        valid = jnp.concatenate([proposals.valid, gt.valid], axis=0)
    else:
        boxes, valid = proposals.boxes, proposals.valid

    iou = pairwise_iou(gt.boxes, boxes)  # (G, P+G)
    # mask out padded proposal columns so they can't match
    iou = jnp.where(valid[None, :], iou, 0.0)
    matched_idx, matched_labels = match_proposals(
        iou, gt.valid, [iou_threshold], [0, 1], False
    )

    gt_classes = jnp.where(
        jnp.any(gt.valid),
        gt.classes[matched_idx],
        num_classes,
    )
    gt_classes = jnp.where(matched_labels == 0, num_classes, gt_classes)
    gt_classes = jnp.where(matched_labels == -1, -1, gt_classes)
    # padded proposal slots must never be sampled
    gt_classes = jnp.where(valid, gt_classes, -1)

    sampled_idx, sampled_valid = sample_proposals_fixed(
        key, gt_classes, batch_size_per_image, positive_fraction, num_classes
    )

    return {
        "boxes": boxes[sampled_idx],
        "gt_classes": jnp.where(
            sampled_valid, gt_classes[sampled_idx], num_classes
        ),
        "gt_boxes": gt.boxes[matched_idx[sampled_idx]],
        "valid": sampled_valid,
    }


class Res5ROIHeads(nn.Module):
    """C4 ROI head: ROIAlign(7x7, 1/16) -> res5 -> mean pool -> predictor."""

    num_classes: int
    pooler_resolution: int = 7
    pooler_scale: float = 1.0 / 16.0
    sampling_ratio: int = 0  # 0 = adaptive ceil(roi/bin) (d2 default)
    res2_out_channels: int = 256
    width_per_group: int = 64
    res5_blocks: int = 3
    cls_agnostic_bbox_reg: bool = False
    cls_dropout: bool = False
    dropout_ratio: float = 0.8
    roi_chunk: int = 256  # ROIs per image processed per unrolled chunk
    # OUTPUT_LAYER FastRCNNAttentionOutputLayers: attended scores become the
    # class logits directly (ref fast_rcnn.py:422-475)
    attention_output_layer: bool = False
    # Caffe/MSRA stride placement (cfg.MODEL.RESNETS.STRIDE_IN_1X1). With
    # the stride on block0's 1x1 conv (and on the 1x1 shortcut), the odd
    # rows/cols of the pooled PxP map are never read by res5 — so the
    # pooler emits only the even bins (ceil(P/2)²) and res5 runs block0 at
    # stride 1. Numerically identical outputs/gradients; cuts the ROIAlign
    # interpolation-matmul intermediate (the HBM-bandwidth bottleneck of
    # the pooled path) and res5's input traffic by ~(1 - ceil(P/2)²/P²).
    stride_in_1x1: bool = True
    elide_strided_bins: bool = True
    dtype: jnp.dtype = jnp.float32

    def _elide(self) -> bool:
        # only valid when block0's stride sits on the 1x1 convs: with
        # stride_in_1x1=False the 3x3 conv2 carries the stride and reads
        # every pooled position.
        return self.elide_strided_bins and self.stride_in_1x1

    def setup(self):
        self.res5 = Res5Stage(
            res2_out_channels=self.res2_out_channels,
            width_per_group=self.width_per_group,
            num_blocks=self.res5_blocks,
            stride_in_1x1=self.stride_in_1x1,
            first_stride=1 if self._elide() else 2,
            dtype=self.dtype,
        )
        self.box_predictor = FastRCNNOutputLayers(
            num_classes=self.num_classes,
            cls_agnostic_bbox_reg=self.cls_agnostic_bbox_reg,
            cls_dropout=self.cls_dropout,
            dropout_ratio=self.dropout_ratio,
            attention_scores_as_logits=self.attention_output_layer,
        )

    def pooled_features(self, features: jnp.ndarray, boxes: jnp.ndarray):
        """features (B, H, W, C); boxes (B, S, 4) -> (B*S, 2048) pooled.

        The ROIAlign -> res5 -> mean-pool pipeline is chunked over ROI
        blocks: chunk intermediates have disjoint liveness, so peak HBM is
        O(B * chunk * 7*7*C) instead of O(B * S * 7*7*C).
        """
        b, s = boxes.shape[:2]
        chunk = self.roi_chunk if self.roi_chunk > 0 else s
        chunk = min(chunk, s)
        bin_stride = 2 if self._elide() else 1
        outs = []
        for start in range(0, s, chunk):
            bx = boxes[:, start : start + chunk]
            pooled = jax.vmap(
                lambda f, bb: roi_align_auto(
                    f, bb, self.pooler_resolution, self.pooler_scale,
                    self.sampling_ratio, bin_stride,
                )
            )(features, bx)  # (B, c, P', P', C)
            pooled = pooled.reshape(
                b * bx.shape[1], *pooled.shape[2:]
            ).astype(self.dtype)
            x = self.res5(pooled)  # (B*c, 4, 4, 2048)
            # dtype=f32: accumulate the spatial mean in f32 WITHOUT
            # materializing an f32 copy of x first (x.astype(f32) wrote a
            # 524 MB intermediate at batch 8 inference, ~1 ms/step).
            # This reduce measures ~2.2x its HBM bound in traces; a
            # contraction-against-ones dot_general was A/B'd on-chip
            # (2026-08-19) and was NOT faster (17.6 vs 17.2 ms per 3-iter
            # batch-32 trace) — the cost is the sublane-spread spatial
            # layout, not the op. Don't retry.
            outs.append(
                jnp.mean(x, axis=(1, 2), dtype=jnp.float32).reshape(
                    b, bx.shape[1], -1
                )
            )
        out = jnp.concatenate(outs, axis=1)  # (B, S, 2048)
        return out.reshape(b * s, -1)

    def __call__(
        self,
        features,
        boxes,
        *,
        train: bool = False,
        gt_classes=None,
        valid=None,
    ):
        """Returns (scores, deltas, aux) — aux carries head-specific extra
        losses/outputs (empty for the plain Res5 head)."""
        feat = self.pooled_features(features, boxes)
        scores, deltas = self.box_predictor(feat, train=train)
        return scores, deltas, {}
