from .backbone import ResNetC4, Res5Stage, FrozenBN, RESNET_STAGES
from .meta_arch import GeneralizedRCNN, AffineLayer
from .roi_heads import Res5ROIHeads, label_and_sample_proposals
from .rpn import RPNHead, generate_anchors, select_top_proposals
from .fast_rcnn import (
    FastRCNNOutputLayers,
    fast_rcnn_losses,
    fast_rcnn_inference,
)
from .build import build_model, META_ARCH_REGISTRY

__all__ = [
    "ResNetC4",
    "Res5Stage",
    "FrozenBN",
    "RESNET_STAGES",
    "GeneralizedRCNN",
    "AffineLayer",
    "Res5ROIHeads",
    "label_and_sample_proposals",
    "RPNHead",
    "generate_anchors",
    "select_top_proposals",
    "FastRCNNOutputLayers",
    "fast_rcnn_losses",
    "fast_rcnn_inference",
    "build_model",
    "META_ARCH_REGISTRY",
]
