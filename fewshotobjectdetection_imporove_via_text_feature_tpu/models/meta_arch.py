"""Meta-architecture: GeneralizedRCNN — one jit-compiled program.

Spec source: defrcn/modeling/meta_arch/rcnn.py:21-115 — normalize ->
backbone -> (GDL + affine) -> RPN -> (GDL + affine) -> ROI heads; plus the
DeFRCN freeze switches. Text/semantic meta-arch variants are built in
text_heads.py on top of this skeleton.

TPU re-design: the whole forward (train or inference) is a single traced
function over fixed-shape batches. Per-image Python loops from the
reference (preprocess, postprocess, per-image RPN/ROI logic) are vmapped.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax.sharding import PartitionSpec

from ..ops.gdl import decouple_layer
from ..structures import Detections, GTInstances, ImageBatch
from .backbone import ResNetC4
from .fast_rcnn import fast_rcnn_inference, fast_rcnn_losses, rescale_detections
from .roi_heads import Res5ROIHeads, label_and_sample_proposals
from .rpn import (
    RPNHead,
    generate_anchors,
    label_and_sample_anchors,
    rpn_losses,
    select_top_proposals,
)


class AffineLayer(nn.Module):
    """Per-channel scale (+ optional bias) on a feature map
    (ref gdl.py:19-34)."""

    channels: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (self.channels,))
        out = x * w.astype(x.dtype)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.channels,))
            out = out + b.astype(x.dtype)
        return out


class GeneralizedRCNN(nn.Module):
    """DeFRCN-style Faster R-CNN C4 with gradient-decoupled branches."""

    num_classes: int = 20
    # GDL
    rpn_enable_decouple: bool = True
    rpn_backward_scale: float = 0.0
    roi_enable_decouple: bool = True
    roi_backward_scale: float = 0.75
    # backbone
    depth: int = 101
    stem_out_channels: int = 64
    res2_out_channels: int = 256
    width_per_group: int = 64
    stride_in_1x1: bool = True  # cfg.MODEL.RESNETS.STRIDE_IN_1X1
    elide_strided_bins: bool = True  # cfg.TPU.ELIDE_STRIDED_BINS
    remat_backbone: bool = False
    freeze_at: int = 3
    freeze_backbone: bool = False
    freeze_rpn: bool = False
    # RPN
    anchor_sizes: Tuple[int, ...] = (32, 64, 128, 256, 512)
    anchor_aspect_ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)
    anchor_stride: int = 16
    rpn_pre_nms_topk: Tuple[int, int] = (12000, 6000)  # (train, test)
    rpn_post_nms_topk: Tuple[int, int] = (2000, 1000)
    rpn_nms_thresh: float = 0.7
    rpn_batch_per_image: int = 256
    rpn_positive_fraction: float = 0.5
    # cfg.MODEL.RPN.{IOU_THRESHOLDS, SMOOTH_L1_BETA, BBOX_REG_WEIGHTS,
    # LOSS_WEIGHT, BBOX_REG_LOSS_WEIGHT} + PROPOSAL_GENERATOR.MIN_SIZE —
    # d2 defaults; every reference config leaves them untouched
    rpn_iou_thresholds: Tuple[float, float] = (0.3, 0.7)
    rpn_smooth_l1_beta: float = 0.0
    rpn_bbox_reg_weights: Tuple[float, float, float, float] = (1.0,) * 4
    rpn_loss_weight: float = 1.0
    rpn_bbox_reg_loss_weight: float = 1.0
    rpn_min_size: float = 0.0
    # ROI
    roi_batch_per_image: int = 512
    roi_positive_fraction: float = 0.25
    roi_iou_threshold: float = 0.5
    proposal_append_gt: bool = True  # cfg.MODEL.ROI_HEADS.PROPOSAL_APPEND_GT
    roi_chunk: int = 256
    # cfg.MODEL.ROI_BOX_HEAD.{POOLER_RESOLUTION, POOLER_SAMPLING_RATIO};
    # sampling_ratio 0 = adaptive ceil(roi/bin) (d2 default)
    pooler_resolution: int = 7
    sampling_ratio: int = 0
    # cfg.MODEL.ROI_BOX_HEAD.{NUM_CONV, CONV_DIM, NUM_FC, FC_DIM} — the
    # ConvFC tower; consumed only by StandardROIHeads
    box_convfc: Tuple[int, int, int, int] = (0, 256, 2, 1024)
    box_reg_weights: Tuple[float, float, float, float] = (10.0, 10.0, 5.0, 5.0)
    smooth_l1_beta: float = 0.0
    cls_agnostic_bbox_reg: bool = False
    cls_dropout: bool = False
    dropout_ratio: float = 0.8
    # test
    test_score_thresh: float = 0.05
    test_nms_thresh: float = 0.5
    test_topk_per_image: int = 100
    test_candidate_topk: int = 1024
    # pixel stats (BGR / Caffe2)
    pixel_mean: Tuple[float, float, float] = (103.530, 116.280, 123.675)
    pixel_std: Tuple[float, float, float] = (1.0, 1.0, 1.0)
    # ROI-heads selection (ref cfg.MODEL.ROI_HEADS.NAME) + text-branch knobs
    roi_heads_name: str = "Res5ROIHeads"
    output_layer: str = "FastRCNNOutputLayers"
    class_embed: Any = None      # np (C, sem_dim) bank for text heads
    bg_embed: Any = None         # np (1, sem_dim) for SematicProposalAttention
    l2_cosine: bool = False
    kl_temp: float = 1.0
    # text-head distillation gates (see build.py: DISTILLATE/L2 flags)
    distill_l2: bool = True
    distill_kl: bool = True
    # Spatial partitioning (SP) for low-latency serving: name of a mesh
    # axis to shard the image/feature H dimension over. The backbone runs
    # spatially split across chips (GSPMD inserts the conv halo
    # exchanges); res4 is gathered back to replicated before the RPN/ROI
    # stages, whose ops (top-k, NMS, ROIAlign) are not spatially local.
    # None = off (single-chip / DP semantics, the default everywhere; set
    # by DefaultPredictor via cfg.TPU.SPATIAL_PARTITION). The surrounding
    # jit must be traced inside `with Mesh(...)` carrying this axis.
    spatial_axis: Optional[str] = None
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = ResNetC4(
            depth=self.depth,
            stem_out_channels=self.stem_out_channels,
            res2_out_channels=self.res2_out_channels,
            width_per_group=self.width_per_group,
            stride_in_1x1=self.stride_in_1x1,
            freeze_at=self.freeze_at,
            remat=self.remat_backbone,
            dtype=self.dtype,
        )
        num_anchors = len(self.anchor_sizes) * len(self.anchor_aspect_ratios)
        self.rpn_head = RPNHead(num_anchors=num_anchors, dtype=self.dtype)
        c4 = self.res2_out_channels * 4
        self.affine_rpn = AffineLayer(channels=c4, use_bias=True)
        self.affine_rcnn = AffineLayer(channels=c4, use_bias=True)
        self.roi_heads = self.build_roi_heads()

    def build_roi_heads(self):
        from .backbone import RESNET_STAGES

        common = dict(
            num_classes=self.num_classes,
            res2_out_channels=self.res2_out_channels,
            width_per_group=self.width_per_group,
            res5_blocks=RESNET_STAGES[self.depth][3],
            cls_agnostic_bbox_reg=self.cls_agnostic_bbox_reg,
            cls_dropout=self.cls_dropout,
            dropout_ratio=self.dropout_ratio,
            attention_output_layer=(
                self.output_layer == "FastRCNNAttentionOutputLayers"
            ),
            roi_chunk=self.roi_chunk,
            pooler_resolution=self.pooler_resolution,
            sampling_ratio=self.sampling_ratio,
            stride_in_1x1=self.stride_in_1x1,
            elide_strided_bins=self.elide_strided_bins,
            dtype=self.dtype,
        )
        name = self.roi_heads_name
        if name == "Res5ROIHeads":
            return Res5ROIHeads(**common)
        if name == "StandardROIHeads":
            from .box_head import StandardROIHeads

            num_conv, conv_dim, num_fc, fc_dim = self.box_convfc
            if num_conv + num_fc == 0:
                # d2 box_head.py asserts a non-empty tower; the flattened
                # pooled map would otherwise feed the predictors raw
                raise ValueError(
                    "StandardROIHeads needs ROI_BOX_HEAD.NUM_CONV + "
                    "NUM_FC > 0 (d2 FastRCNNConvFCHead assert)"
                )
            return StandardROIHeads(
                num_classes=self.num_classes,
                num_conv=num_conv,
                conv_dim=conv_dim,
                num_fc=num_fc,
                fc_dim=fc_dim,
                cls_agnostic_bbox_reg=self.cls_agnostic_bbox_reg,
                cls_dropout=self.cls_dropout,
                dropout_ratio=self.dropout_ratio,
                roi_chunk=self.roi_chunk,
                pooler_resolution=self.pooler_resolution,
                sampling_ratio=self.sampling_ratio,
                dtype=self.dtype,
            )

        from .text_heads import SematicRes5ROIHeads, TextRes5ROIHeads

        if name in ("SematicRes5ROIHeads", "SematicRes5ROIHeadsCrossOutput"):
            return SematicRes5ROIHeads(
                class_embed=self.class_embed,
                bg_embed=self.bg_embed,
                cross_output=name.endswith("CrossOutput"),
                **common,
            )
        text_kinds = {
            "TextRes5ROIHeads": "lv",
            "TextRes5ROIHeads_VKV": "lv_vkv",
            "TextRes5ROIHeads_textDomination": "text_dom",
            "TextRes5ROIHeads_textDomination_VKV": "text_dom_vkv",
        }
        if name in text_kinds:
            return TextRes5ROIHeads(
                class_embed=self.class_embed,
                attention_kind=text_kinds[name],
                l2_cosine=self.l2_cosine,
                kl_temp=self.kl_temp,
                distill_l2=self.distill_l2,
                distill_kl=self.distill_kl,
                **common,
            )
        raise KeyError(f"Unknown ROI_HEADS.NAME {name!r}")

    # ------------------------------------------------------------------
    def normalize(self, image: jnp.ndarray) -> jnp.ndarray:
        # images may arrive uint8 (4x cheaper host->device transfer; the
        # reference's PIL-resized pixels are uint8 too), and may arrive in
        # host space-to-depth layout (C = 12 = 2x2x3, backbone.py
        # space_to_depth) — the per-pixel stats then tile 4x.
        #
        # The arithmetic runs in the compute dtype: the backbone quantizes
        # its input to bf16 immediately anyway, so normalize-in-f32 +
        # cast-bf16 yields the same values (±1 ulp) while materializing an
        # extra full-resolution f32 image (~1 ms/step at batch 8).
        dt = self.dtype
        image = image.astype(dt)
        mean = jnp.asarray(self.pixel_mean, dt)
        std = jnp.asarray(self.pixel_std, dt)
        reps = image.shape[-1] // mean.shape[0]
        if reps > 1:
            mean = jnp.tile(mean, reps)
            std = jnp.tile(std, reps)
        return (image - mean) / std

    # What a GT pytree passed at INFERENCE time means for this meta-arch
    # (the reference's fork passes test-time gt_instances into
    # _forward_once_ — rcnn.py:64-67 — and its test mapper deliberately
    # keeps annotations, dataset_mapper.py:146-150):
    #   "teacher": label proposals with GT and run the teacher head
    #     (this build's teacher-evaluation tool; the plain arch ignores
    #     gt in compute_features)
    #   "paint":   fuse the GT-painted semantic/text map into the
    #     features, like the reference's Semantic/Text eval protocol
    #     (rcnn.py:154-206, 376-452; GT-LEAKY by design — see PARITY)
    #   "none":    ignore gt at eval (Distillated: ref rcnn.py:235-237
    #     passes None; its detection path uses raw res4)
    eval_gt_role = "teacher"

    def compute_features(self, images: ImageBatch, gt=None):
        # `gt` is consumed by the painting meta-archs (text_heads.py);
        # the plain arch ignores it
        x = self.normalize(images.image)
        if self.spatial_axis is not None:
            # shard the image H axis: the whole backbone then runs
            # spatially partitioned (GSPMD halo-exchanges the conv edges)
            x = jax.lax.with_sharding_constraint(
                x, PartitionSpec(None, self.spatial_axis)
            )
        pre_s2d = images.image.shape[-1] == 4 * len(self.pixel_mean)
        feats = self.backbone(x, pre_s2d=pre_s2d)
        feat = feats["res4"]
        if self.spatial_axis is not None:
            # res4 at stride 16 is small (~8 MB bf16 at 800x1344): gather
            # it once; RPN selection / ROIAlign / NMS are not spatially
            # local, so they run replicated from here
            feat = jax.lax.with_sharding_constraint(feat, PartitionSpec())
        if self.freeze_backbone:
            feat = jax.lax.stop_gradient(feat)
        return feat, feats

    def branch_features(self, feat):
        """Apply GDL + affine per branch (ref rcnn.py:88-98)."""
        if self.rpn_enable_decouple:
            feat_rpn = self.affine_rpn(
                decouple_layer(feat, self.rpn_backward_scale)
            )
        else:
            feat_rpn = feat
        if self.roi_enable_decouple:
            feat_rcnn = self.affine_rcnn(
                decouple_layer(feat, self.roi_backward_scale)
            )
        else:
            feat_rcnn = feat
        return feat_rpn, feat_rcnn

    def run_rpn(self, feat_rpn, images: ImageBatch, train: bool):
        logits, deltas = self.rpn_head(feat_rpn)
        if self.freeze_rpn:
            logits = jax.lax.stop_gradient(logits)
            deltas = jax.lax.stop_gradient(deltas)
        h, w = feat_rpn.shape[1], feat_rpn.shape[2]
        anchors = jnp.asarray(
            generate_anchors(
                (h, w),
                stride=self.anchor_stride,
                sizes=self.anchor_sizes,
                aspect_ratios=self.anchor_aspect_ratios,
            )
        )
        from .rpn import cell_anchors

        idx = 0 if train else 1
        proposals = select_top_proposals(
            jax.lax.stop_gradient(logits),
            jax.lax.stop_gradient(deltas),
            jnp.asarray(
                cell_anchors(self.anchor_sizes, self.anchor_aspect_ratios)
            ),
            (h, w),
            self.anchor_stride,
            images.hw,
            pre_nms_topk=self.rpn_pre_nms_topk[idx],
            post_nms_topk=self.rpn_post_nms_topk[idx],
            nms_thresh=self.rpn_nms_thresh,
            min_size=self.rpn_min_size,
            bbox_reg_weights=self.rpn_bbox_reg_weights,
        )
        return logits, deltas, anchors, proposals

    # ------------------------------------------------------------------
    def __call__(
        self,
        images: ImageBatch,
        gt: Optional[GTInstances] = None,
        *,
        train: bool = False,
    ):
        if train:
            return self.forward_train(images, gt)
        return self.forward_inference(images, gt)

    def forward_train(self, images: ImageBatch, gt: GTInstances):
        feat, _ = self.compute_features(images)
        return self._train_tail(feat, images, gt)

    def _train_tail(self, feat, images: ImageBatch, gt: GTInstances,
                    extra_losses=None):
        """RPN + ROI sampling/losses on prepared res4 features — the ONE
        shared training tail; the semantic/text/distillated meta-archs
        reuse it after swapping/fusing `feat` (so diagnostics and any
        sampling-flow fix apply to every variant)."""
        feat_rpn, feat_rcnn = self.branch_features(feat)

        logits, deltas, anchors, proposals = self.run_rpn(
            feat_rpn, images, train=True
        )

        # --- RPN losses (vmapped anchor labeling) ---
        key = self.make_rng("sampling")
        b = images.image.shape[0]
        anchor_keys = jax.random.split(key, b + 1)
        gt_labels, matched_boxes = jax.vmap(
            lambda k, gtb: label_and_sample_anchors(
                k, anchors, gtb,
                batch_size_per_image=self.rpn_batch_per_image,
                positive_fraction=self.rpn_positive_fraction,
                iou_thresholds=self.rpn_iou_thresholds,
            )
        )(anchor_keys[1:], gt)
        losses = rpn_losses(
            logits, deltas, anchors, gt_labels, matched_boxes,
            batch_size_per_image=self.rpn_batch_per_image,
            smooth_l1_beta=self.rpn_smooth_l1_beta,
            bbox_reg_weights=self.rpn_bbox_reg_weights,
            loss_weight=self.rpn_loss_weight,
            bbox_reg_loss_weight=self.rpn_bbox_reg_loss_weight,
        )
        # Training diagnostics the reference puts into EventStorage
        # (rpn.py:360-365). "metric/" keys are excluded from total_loss by
        # the trainer and carry no gradient.
        losses["metric/rpn_num_pos_anchors"] = jax.lax.stop_gradient(
            jnp.sum(gt_labels == 1) / b
        )
        losses["metric/rpn_num_neg_anchors"] = jax.lax.stop_gradient(
            jnp.sum(gt_labels == 0) / b
        )

        # --- ROI sampling (vmapped) ---
        roi_key = anchor_keys[0]
        roi_keys = jax.random.split(roi_key, b)
        sampled = jax.vmap(
            lambda k, p, g: label_and_sample_proposals(
                k, p, g,
                batch_size_per_image=self.roi_batch_per_image,
                positive_fraction=self.roi_positive_fraction,
                num_classes=self.num_classes,
                iou_threshold=self.roi_iou_threshold,
                append_gt=self.proposal_append_gt,
            )
        )(roi_keys, proposals, gt)

        roi_losses = self.roi_losses(feat_rcnn, sampled)
        losses.update(roi_losses)
        if extra_losses:
            losses.update(extra_losses)
        return losses

    def roi_losses(self, feat_rcnn, sampled) -> Dict[str, jnp.ndarray]:
        flat = lambda x: x.reshape((-1,) + x.shape[2:])
        gt_classes = flat(sampled["gt_classes"])
        valid = flat(sampled["valid"])
        scores, deltas, aux = self.roi_heads(
            feat_rcnn, sampled["boxes"], train=True,
            gt_classes=gt_classes, valid=valid,
        )

        def det_losses(s, d):
            return fast_rcnn_losses(
                s, d,
                flat(sampled["boxes"]),
                flat(sampled["gt_boxes"]),
                gt_classes,
                valid,
                num_classes=self.num_classes,
                box_reg_weights=self.box_reg_weights,
                smooth_l1_beta=self.smooth_l1_beta,
            )

        losses = det_losses(scores, deltas)
        # Diagnostics the reference logs from FastRCNNOutputs._log_accuracy
        # (fast_rcnn.py:195-221) and label_and_sample_proposals
        # (roi_heads.py:240-248); masked fixed-shape equivalents.
        b = sampled["valid"].shape[0]
        pred = jnp.argmax(scores, axis=1)
        bg = self.num_classes
        fg = valid & (gt_classes >= 0) & (gt_classes < bg)
        n_valid = jnp.maximum(jnp.sum(valid), 1)
        n_fg = jnp.sum(fg)
        metrics = {
            "metric/cls_accuracy": jnp.sum(
                valid & (pred == gt_classes)
            ) / n_valid,
            "metric/fg_cls_accuracy": jnp.sum(
                fg & (pred == gt_classes)
            ) / jnp.maximum(n_fg, 1),
            "metric/false_negative": jnp.sum(
                fg & (pred == bg)
            ) / jnp.maximum(n_fg, 1),
            "metric/roi_num_fg_samples": n_fg / b,
            "metric/roi_num_bg_samples": jnp.sum(
                valid & (gt_classes == bg)
            ) / b,
        }
        losses.update(
            {k: jax.lax.stop_gradient(v) for k, v in metrics.items()}
        )
        # teacher branch: its own detection losses with the _t suffix
        # (ref roi_heads.py:818-826)
        if "teacher_scores" in aux:
            t = det_losses(
                aux.pop("teacher_scores"), aux.pop("teacher_deltas")
            )
            losses.update({k + "_t": v for k, v in t.items()})
        # remaining aux entries are scalar losses (loss_kl,
        # loss_student_feat, loss_attentive, ...)
        losses.update(aux)
        return losses

    def forward_inference(
        self, images: ImageBatch, gt: Optional[GTInstances] = None
    ) -> Detections:
        paint_gt = gt if self.eval_gt_role == "paint" else None
        feat, _ = self.compute_features(images, gt=paint_gt)
        feat_rpn, feat_rcnn = self.branch_features(feat)
        _, _, _, proposals = self.run_rpn(feat_rpn, images, train=False)

        # Teacher evaluation: when GT is provided at test time, label every
        # proposal with its matched class (no sampling) so the text-guided
        # teacher head can run (ref label_proposals, roi_heads.py:677-713).
        # Painting meta-archs consume gt in compute_features instead and
        # keep the reference's student-only head routing.
        head_kwargs = {}
        if gt is not None and self.eval_gt_role == "teacher":
            from ..ops import match_proposals, pairwise_iou

            def label_img(pboxes, pvalid, g):
                iou = pairwise_iou(g.boxes, pboxes)
                iou = jnp.where(pvalid[None, :], iou, 0.0)
                midx, mlab = match_proposals(
                    iou, g.valid, [self.roi_iou_threshold], [0, 1], False
                )
                cls = jnp.where(
                    jnp.any(g.valid), g.classes[midx], self.num_classes
                )
                cls = jnp.where(mlab == 0, self.num_classes, cls)
                return cls

            gt_cls = jax.vmap(label_img)(proposals.boxes, proposals.valid, gt)
            head_kwargs = {
                "gt_classes": gt_cls.reshape(-1),
                "valid": proposals.valid.reshape(-1),
            }

        scores, deltas, _ = self.roi_heads(
            feat_rcnn, proposals.boxes, train=False, **head_kwargs
        )
        b, p = proposals.boxes.shape[:2]
        scores = scores.reshape(b, p, -1)
        deltas = deltas.reshape(b, p, -1)

        def per_image(s, d, pb, pv, hw, ohw):
            bx, sc, cl, va = fast_rcnn_inference(
                s, d, pb, pv, hw,
                num_classes=self.num_classes,
                score_thresh=self.test_score_thresh,
                nms_thresh=self.test_nms_thresh,
                topk_per_image=self.test_topk_per_image,
                candidate_topk=self.test_candidate_topk,
                box_reg_weights=self.box_reg_weights,
            )
            bx = rescale_detections(bx, hw, ohw)
            return bx, sc, cl, va

        bx, sc, cl, va = jax.vmap(per_image)(
            scores, deltas, proposals.boxes, proposals.valid,
            images.hw, images.orig_hw,
        )
        return Detections(boxes=bx, scores=sc, classes=cl, valid=va)
