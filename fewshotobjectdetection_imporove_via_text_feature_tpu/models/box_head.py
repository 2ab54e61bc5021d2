"""ConvFC box head + StandardROIHeads.

Spec: defrcn/modeling/roi_heads/box_head.py:17-99 (n x [conv3x3+relu] then
n x [fc+relu]) and roi_heads.py:389-526 (StandardROIHeads: separate
box/cls ConvFC towers over the same pooled features, separate predictors —
cls tower drives logits, box tower drives deltas). Unused by the
committed configs but part of the reference surface.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .fast_rcnn import FastRCNNOutputLayers


class FastRCNNConvFCHead(nn.Module):
    num_conv: int = 0
    conv_dim: int = 256
    num_fc: int = 2
    fc_dim: int = 1024
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: (R, P, P, C)
        for i in range(self.num_conv):
            x = nn.Conv(
                self.conv_dim, (3, 3), padding="SAME", dtype=self.dtype,
                param_dtype=jnp.float32, name=f"conv{i+1}",
            )(x)
            x = nn.relu(x)
        x = x.reshape(x.shape[0], -1)
        for i in range(self.num_fc):
            x = nn.Dense(
                self.fc_dim, dtype=self.dtype, param_dtype=jnp.float32,
                name=f"fc{i+1}",
            )(x)
            x = nn.relu(x)
        return x.astype(jnp.float32)


class StandardROIHeads(nn.Module):
    """Separate cls/box towers (no res5 sharing)."""

    num_classes: int
    pooler_resolution: int = 7
    pooler_scale: float = 1.0 / 16.0
    sampling_ratio: int = 0  # 0 = adaptive ceil(roi/bin) (d2 default)
    num_conv: int = 0
    conv_dim: int = 256
    num_fc: int = 2
    fc_dim: int = 1024
    cls_agnostic_bbox_reg: bool = False
    cls_dropout: bool = False
    dropout_ratio: float = 0.8
    roi_chunk: int = 256  # bound HBM for the interp intermediates (ADVICE r1)
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.box_head = FastRCNNConvFCHead(
            num_conv=self.num_conv, conv_dim=self.conv_dim,
            num_fc=self.num_fc, fc_dim=self.fc_dim, dtype=self.dtype,
        )
        self.cls_head = FastRCNNConvFCHead(
            num_conv=self.num_conv, conv_dim=self.conv_dim,
            num_fc=self.num_fc, fc_dim=self.fc_dim, dtype=self.dtype,
        )
        self.box_predictor = FastRCNNOutputLayers(
            num_classes=self.num_classes,
            cls_agnostic_bbox_reg=self.cls_agnostic_bbox_reg,
        )
        self.cls_predictor = FastRCNNOutputLayers(
            num_classes=self.num_classes,
            cls_agnostic_bbox_reg=self.cls_agnostic_bbox_reg,
            cls_dropout=self.cls_dropout,
            dropout_ratio=self.dropout_ratio,
        )

    def __call__(self, features, boxes, *, train: bool = False,
                 gt_classes=None, valid=None):
        import jax

        from ..ops.roi_align import roi_align_auto

        b, s = boxes.shape[:2]
        pooled = jax.vmap(
            lambda f, bb: roi_align_auto(
                f, bb, self.pooler_resolution, self.pooler_scale,
                self.sampling_ratio, roi_chunk=self.roi_chunk,
            )
        )(features, boxes)
        pooled = pooled.reshape(b * s, *pooled.shape[2:]).astype(self.dtype)

        cls_feat = self.cls_head(pooled)
        scores, _ = self.cls_predictor(cls_feat, train=train)
        box_feat = self.box_head(pooled)
        _, deltas = self.box_predictor(box_feat, train=train)
        return scores, deltas, {}
