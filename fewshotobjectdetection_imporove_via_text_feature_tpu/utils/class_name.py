"""Dataset-name -> class-name-list resolution
(parity: defrcn/utils/class_name.py:4-29)."""

from __future__ import annotations

from ..data.builtin_meta import (
    PASCAL_VOC_ALL_CATEGORIES,
    PASCAL_VOC_BASE_CATEGORIES,
    PASCAL_VOC_NOVEL_CATEGORIES,
    _get_coco_fewshot_instances_meta,
)


def get_class_name(cfg):
    dataset = cfg.DATASETS.TRAIN[0]
    classes = None
    if "voc" in dataset:
        if "base" in dataset:
            classes = PASCAL_VOC_BASE_CATEGORIES[int(dataset.split("_")[-1][-1])]
        if "novel" in dataset:
            sid_token = dataset.split("_")[-1]
            # few-shot names end with seedN; the split id sits 3 tokens back
            if sid_token.startswith("seed"):
                classes = PASCAL_VOC_NOVEL_CATEGORIES[
                    int(dataset.split("_")[-3][-1])
                ]
            else:
                classes = PASCAL_VOC_NOVEL_CATEGORIES[int(sid_token[-1])]
        if "all" in dataset:
            # seed-aware like the novel branch (the reference's [-3] parse
            # only fits seeded few-shot names and raises KeyError on
            # static names like voc_2007_trainval_all1)
            sid_token = dataset.split("_")[-1]
            if sid_token.startswith("seed"):
                classes = PASCAL_VOC_ALL_CATEGORIES[
                    int(dataset.split("_")[-3][-1])
                ]
            else:
                classes = PASCAL_VOC_ALL_CATEGORIES[int(sid_token[-1])]
    if "coco" in dataset:
        ret = _get_coco_fewshot_instances_meta()
        if "base" in dataset:
            classes = ret["base_classes"]
        if "novel" in dataset:
            classes = ret["novel_classes"]
        if "all" in dataset:
            classes = ret["thing_classes"]
    if classes is None:
        raise ValueError(f"cannot resolve class names for {dataset}")
    return classes


def get_class_name_test(cfg):
    """Always-ALL-categories variant (ref class_name.py:26-29; only
    referenced from commented-out reference code, kept for API parity).
    NOTE: faithfully reproduces the reference's parse, which reads the
    split id from the LAST token — correct only for non-seed dataset
    names (e.g. voc_2007_test_all1)."""
    dataset = cfg.DATASETS.TRAIN[0]
    return PASCAL_VOC_ALL_CATEGORIES[int(dataset.split("_")[-1][-1])]


# GloVe word mapping for VOC class tokens (ref attentive_modules.py:352).
VOC_GLOVE_NAME_MAP = {
    "aeroplane": "aeroplane", "bicycle": "bicycle", "boat": "boat",
    "bottle": "bottle", "car": "car", "cat": "cat", "chair": "chair",
    "diningtable": "dining table", "dog": "dog", "horse": "horse",
    "person": "person", "pottedplant": "potted plant", "sheep": "sheep",
    "train": "train", "tvmonitor": "tv", "bird": "bird", "bus": "bus",
    "cow": "cow", "motorbike": "motorbike", "sofa": "sofa",
}
