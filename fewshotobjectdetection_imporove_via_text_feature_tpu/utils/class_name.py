"""Dataset-name -> class-name-list resolution
(parity: defrcn/utils/class_name.py:4-29)."""

from __future__ import annotations

from ..data.builtin_meta import (
    PASCAL_VOC_ALL_CATEGORIES,
    PASCAL_VOC_BASE_CATEGORIES,
    PASCAL_VOC_NOVEL_CATEGORIES,
    _get_coco_fewshot_instances_meta,
)


def _voc_split_id(dataset: str, kind: str) -> int:
    """Split id for a VOC dataset name: the digit of the `{kind}{N}` token
    wherever it sits (voc_2007_trainval_all1, ..._all1_2shot_seed0,
    custom-registered ..._all1_t_train all resolve); falls back to the
    reference's positional parses ([-1] / seed-aware [-3],
    class_name.py:8-20)."""
    import re

    for tok in dataset.split("_"):
        m = re.fullmatch(rf"{kind}(\d)", tok)
        if m:
            return int(m.group(1))
    toks = dataset.split("_")
    if toks[-1].startswith("seed"):
        return int(toks[-3][-1])
    return int(toks[-1][-1])


def get_class_name(cfg):
    dataset = cfg.DATASETS.TRAIN[0]
    classes = None
    try:
        if "voc" in dataset:
            if "base" in dataset:
                classes = PASCAL_VOC_BASE_CATEGORIES[
                    _voc_split_id(dataset, "base")
                ]
            if "novel" in dataset:
                classes = PASCAL_VOC_NOVEL_CATEGORIES[
                    _voc_split_id(dataset, "novel")
                ]
            if "all" in dataset:
                classes = PASCAL_VOC_ALL_CATEGORIES[
                    _voc_split_id(dataset, "all")
                ]
        if "coco" in dataset:
            ret = _get_coco_fewshot_instances_meta()
            if "base" in dataset:
                classes = ret["base_classes"]
            if "novel" in dataset:
                classes = ret["novel_classes"]
            if "all" in dataset:
                classes = ret["thing_classes"]
    except (ValueError, KeyError, IndexError):
        classes = None
    if classes is None:
        # names the grammar can't parse (custom registrations): the
        # catalog knows their true class list
        try:
            from ..data.catalog import MetadataCatalog

            classes = list(MetadataCatalog.get(dataset).thing_classes)
        except Exception:
            classes = None
    if classes is None:
        raise ValueError(f"cannot resolve class names for {dataset!r}")
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
