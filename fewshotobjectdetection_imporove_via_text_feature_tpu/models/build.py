"""Model builder: cfg -> flax meta-architecture module.

Mirrors the reference's registry pattern (defrcn/modeling/meta_arch/build.py
META_ARCH_REGISTRY + roi_heads.py ROI_HEADS_REGISTRY) with plain dicts.
"""

from __future__ import annotations

import jax.numpy as jnp

META_ARCH_REGISTRY = {}


def register_meta_arch(name):
    def deco(fn):
        META_ARCH_REGISTRY[name] = fn
        return fn

    return deco


# Architecture facets this build fixes at the d2/reference default (no
# reference config changes any of them). A non-default override would
# otherwise be SILENTLY ignored — a silently wrong model — so build fails
# loudly instead. Keys the reference itself sets-but-never-reads
# (MODEL.RPN.ADDITION, MODEL.ADDITION.{TEACHER,STUDENT}_TRAINING/
# DISTIL_MODE) and keys that are no-ops on this model in d2 too
# (TEST.PRECISE_BN with FrozenBN, MODEL.DEVICE, CUDNN_BENCHMARK) stay
# silently accepted — that IS the reference behavior.
_FIXED_AT_DEFAULT = (
    ("MODEL.MASK_ON", False),
    ("MODEL.KEYPOINT_ON", False),
    ("MODEL.LOAD_PROPOSALS", False),
    ("MODEL.BACKBONE.NAME", "build_resnet_backbone"),
    ("MODEL.RESNETS.OUT_FEATURES", ("res4",)),
    ("MODEL.RESNETS.NUM_GROUPS", 1),
    ("MODEL.RESNETS.NORM", "FrozenBN"),
    ("MODEL.RESNETS.RES5_DILATION", 1),
    ("MODEL.RESNETS.DEFORM_ON_PER_STAGE", (False,) * 4),
    ("MODEL.ANCHOR_GENERATOR.OFFSET", 0.0),
    ("MODEL.PROPOSAL_GENERATOR.NAME", "RPN"),
    ("MODEL.RPN.IN_FEATURES", ("res4",)),
    ("MODEL.RPN.IOU_LABELS", (0, -1, 1)),
    ("MODEL.RPN.HEAD_NAME", "StandardRPNHead"),
    # -1 disables d2's legacy boundary-straddle anchor discard
    ("MODEL.RPN.BOUNDARY_THRESH", -1),
    ("MODEL.ROI_HEADS.IN_FEATURES", ("res4",)),
    ("MODEL.ROI_HEADS.IOU_LABELS", (0, 1)),
    ("MODEL.ROI_BOX_HEAD.NAME", "FastRCNNConvFCHead"),
    ("DATALOADER.ASPECT_RATIO_GROUPING", True),
    ("TEST.AUG.ENABLED", False),
)


def _validate_fixed(cfg):
    for dotted, want in _FIXED_AT_DEFAULT:
        node = cfg
        for part in dotted.split("."):
            node = node[part]
        got = tuple(node) if isinstance(node, (list, tuple)) else node
        if got != want:
            raise NotImplementedError(
                f"{dotted} = {got!r}: this build implements only the "
                f"reference architecture ({dotted} = {want!r}); the key "
                "is accepted for d2-config compatibility but cannot be "
                "changed"
            )


def _common_kwargs(cfg):
    _validate_fixed(cfg)
    # only the aligned=True kernel exists here (the reference never runs
    # another pooler: d2 default + every config = ROIAlignV2); fail loudly
    # rather than silently substituting V2 semantics
    if cfg.MODEL.ROI_BOX_HEAD.POOLER_TYPE != "ROIAlignV2":
        raise NotImplementedError(
            f"POOLER_TYPE {cfg.MODEL.ROI_BOX_HEAD.POOLER_TYPE!r}: only "
            "ROIAlignV2 (aligned bilinear) is implemented"
        )
    if (
        cfg.MODEL.ROI_HEADS.NAME == "StandardROIHeads"
        and cfg.MODEL.ROI_BOX_HEAD.NORM
    ):
        raise NotImplementedError(
            "ROI_BOX_HEAD.NORM: the ConvFC tower is norm-free (the d2 "
            "default; no reference config sets a norm)"
        )
    dtype = (
        jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32
    )
    freeze_at = cfg.MODEL.BACKBONE.FREEZE_AT
    if cfg.MODEL.BACKBONE.FREEZE:
        freeze_at = 4
    return dict(
        num_classes=cfg.MODEL.ROI_HEADS.NUM_CLASSES,
        rpn_enable_decouple=cfg.MODEL.RPN.ENABLE_DECOUPLE,
        rpn_backward_scale=cfg.MODEL.RPN.BACKWARD_SCALE,
        roi_enable_decouple=cfg.MODEL.ROI_HEADS.ENABLE_DECOUPLE,
        roi_backward_scale=cfg.MODEL.ROI_HEADS.BACKWARD_SCALE,
        depth=cfg.MODEL.RESNETS.DEPTH,
        stem_out_channels=cfg.MODEL.RESNETS.STEM_OUT_CHANNELS,
        res2_out_channels=cfg.MODEL.RESNETS.RES2_OUT_CHANNELS,
        width_per_group=cfg.MODEL.RESNETS.WIDTH_PER_GROUP,
        stride_in_1x1=cfg.MODEL.RESNETS.STRIDE_IN_1X1,
        elide_strided_bins=cfg.TPU.ELIDE_STRIDED_BINS,
        remat_backbone=cfg.TPU.REMAT_BACKBONE,
        freeze_at=freeze_at,
        freeze_backbone=cfg.MODEL.BACKBONE.FREEZE,
        freeze_rpn=cfg.MODEL.RPN.FREEZE,
        # ROI_HEADS.FREEZE_FEAT is enforced ONLY by the optimizer mask
        # (solver/build.py) — no model-side switch, so nothing can drift
        anchor_sizes=tuple(cfg.MODEL.ANCHOR_GENERATOR.SIZES[0]),
        anchor_aspect_ratios=tuple(cfg.MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS[0]),
        rpn_pre_nms_topk=(
            cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN,
            cfg.MODEL.RPN.PRE_NMS_TOPK_TEST,
        ),
        rpn_post_nms_topk=(
            cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN,
            cfg.MODEL.RPN.POST_NMS_TOPK_TEST,
        ),
        rpn_nms_thresh=cfg.MODEL.RPN.NMS_THRESH,
        rpn_batch_per_image=cfg.MODEL.RPN.BATCH_SIZE_PER_IMAGE,
        rpn_positive_fraction=cfg.MODEL.RPN.POSITIVE_FRACTION,
        rpn_iou_thresholds=tuple(cfg.MODEL.RPN.IOU_THRESHOLDS),
        rpn_smooth_l1_beta=cfg.MODEL.RPN.SMOOTH_L1_BETA,
        rpn_bbox_reg_weights=tuple(cfg.MODEL.RPN.BBOX_REG_WEIGHTS),
        rpn_loss_weight=cfg.MODEL.RPN.LOSS_WEIGHT,
        rpn_bbox_reg_loss_weight=cfg.MODEL.RPN.BBOX_REG_LOSS_WEIGHT,
        rpn_min_size=cfg.MODEL.PROPOSAL_GENERATOR.MIN_SIZE,
        roi_batch_per_image=cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE,
        roi_positive_fraction=cfg.MODEL.ROI_HEADS.POSITIVE_FRACTION,
        roi_iou_threshold=cfg.MODEL.ROI_HEADS.IOU_THRESHOLDS[0],
        proposal_append_gt=cfg.MODEL.ROI_HEADS.PROPOSAL_APPEND_GT,
        roi_chunk=cfg.TPU.ROI_CHUNK,
        pooler_resolution=cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION,
        sampling_ratio=cfg.MODEL.ROI_BOX_HEAD.POOLER_SAMPLING_RATIO,
        box_convfc=(
            cfg.MODEL.ROI_BOX_HEAD.NUM_CONV,
            cfg.MODEL.ROI_BOX_HEAD.CONV_DIM,
            cfg.MODEL.ROI_BOX_HEAD.NUM_FC,
            cfg.MODEL.ROI_BOX_HEAD.FC_DIM,
        ),
        box_reg_weights=tuple(cfg.MODEL.ROI_BOX_HEAD.BBOX_REG_WEIGHTS),
        smooth_l1_beta=cfg.MODEL.ROI_BOX_HEAD.SMOOTH_L1_BETA,
        cls_agnostic_bbox_reg=cfg.MODEL.ROI_BOX_HEAD.CLS_AGNOSTIC_BBOX_REG,
        cls_dropout=cfg.MODEL.ROI_HEADS.CLS_DROPOUT,
        dropout_ratio=cfg.MODEL.ROI_HEADS.DROPOUT_RATIO,
        test_score_thresh=cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST,
        test_nms_thresh=cfg.MODEL.ROI_HEADS.NMS_THRESH_TEST,
        test_topk_per_image=cfg.TEST.DETECTIONS_PER_IMAGE,
        test_candidate_topk=cfg.TPU.MAX_DETECTIONS_PRE_NMS,
        pixel_mean=tuple(cfg.MODEL.PIXEL_MEAN),
        pixel_std=tuple(cfg.MODEL.PIXEL_STD),
        roi_heads_name=cfg.MODEL.ROI_HEADS.NAME,
        output_layer=cfg.MODEL.ROI_HEADS.OUTPUT_LAYER,
        # MODEL.ADDITION.FREEZEATTENTION lives in the optimizer freeze mask
        # (solver/build.py), not the module: ref roi_heads.py:948-951 only
        # sets requires_grad=False — gradients still flow through.
        l2_cosine=cfg.MODEL.ROI_HEADS.L2_COSINE,
        kl_temp=float(cfg.MODEL.ROI_HEADS.KL_TEMP),
        # Distillation gates. The committed reference never assigns its
        # flag attributes (roi_heads.py:545-553 all commented out — the
        # class cannot even construct there); the commented guards define
        # the intent: L2 feature distill needs DISTILLATE AND L2
        # (roi_heads.py:608), KL logit distill needs DISTILLATE AND KL
        # (roi_heads.py:746). KL defaults True in the schema so the
        # reference's student recipe (run_text_train_teacher_novel.sh:61,
        # DISTILLATE True + KL_TEMP, KL unset) keeps its loss_kl.
        distill_l2=(cfg.MODEL.ROI_HEADS.DISTILLATE and cfg.MODEL.ROI_HEADS.L2),
        distill_kl=(cfg.MODEL.ROI_HEADS.DISTILLATE and cfg.MODEL.ROI_HEADS.KL),
        dtype=dtype,
        **_text_head_kwargs(cfg),
    )


def _text_head_kwargs(cfg):
    """Attach the class-embedding bank when the selected ROI head needs it."""
    name = cfg.MODEL.ROI_HEADS.NAME
    if name == "Res5ROIHeads" and cfg.MODEL.META_ARCHITECTURE == "GeneralizedRCNN":
        return {}
    from ..utils.class_embedding import (
        create_normalized_orthogonal_tensor,
        get_class_embed,
    )
    from ..utils.class_name import get_class_name

    model = cfg.MODEL.ADDITION.NAME
    if model in (None, "none", ""):
        model = "glove"
    try:
        names = get_class_name(cfg)
    except (ValueError, IndexError) as e:
        # every head/meta-arch reaching this point REQUIRES the bank; a
        # silent {} here used to surface later as an opaque NoneType
        # .shape crash inside the attention module
        raise ValueError(
            f"{cfg.MODEL.META_ARCHITECTURE}/{name} needs a class-embedding "
            f"bank but the class names could not be resolved from "
            f"DATASETS.TRAIN={tuple(cfg.DATASETS.TRAIN)!r}: {e}"
        ) from e
    bank = get_class_embed(
        names, model, root=cfg.MODEL.ADDITION.EMBEDDING_PATH
    )
    bg = create_normalized_orthogonal_tensor(bank.mean(axis=0))
    return {"class_embed": bank, "bg_embed": bg}


@register_meta_arch("GeneralizedRCNN")
def _build_generalized_rcnn(cfg):
    from .meta_arch import GeneralizedRCNN

    return GeneralizedRCNN(**_common_kwargs(cfg))


def build_model(cfg):
    # text_heads registers the semantic/distillation/text meta-archs on
    # import; pull it in here so the registry is complete regardless of
    # which module the caller touched first.
    from . import text_heads  # noqa: F401

    name = cfg.MODEL.META_ARCHITECTURE
    if name not in META_ARCH_REGISTRY:
        raise KeyError(
            f"Unknown META_ARCHITECTURE {name!r}; have "
            f"{sorted(META_ARCH_REGISTRY)}"
        )
    return META_ARCH_REGISTRY[name](cfg)
