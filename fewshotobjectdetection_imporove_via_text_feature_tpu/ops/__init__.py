from .box_ops import (
    pairwise_iou,
    encode_deltas,
    decode_deltas,
    clip_boxes,
    box_area,
    nonempty_mask,
)
from .matcher import match_proposals
from .sampler import subsample_labels, sample_proposals_fixed
from .gdl import decouple_layer
from .nms import nms_fixed, batched_nms_fixed
from .roi_align import roi_align

__all__ = [
    "pairwise_iou",
    "encode_deltas",
    "decode_deltas",
    "clip_boxes",
    "box_area",
    "nonempty_mask",
    "match_proposals",
    "subsample_labels",
    "sample_proposals_fixed",
    "decouple_layer",
    "nms_fixed",
    "batched_nms_fixed",
    "roi_align",
]
