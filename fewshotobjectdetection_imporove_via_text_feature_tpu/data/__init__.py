from .builtin import register_all, register_all_coco, register_all_voc
from .catalog import DatasetCatalog, MetadataCatalog
from .loader import (
    build_detection_test_loader,
    build_detection_train_loader,
    get_detection_dataset_dicts,
)
from .mapper import DatasetMapper

__all__ = [
    "register_all",
    "register_all_coco",
    "register_all_voc",
    "DatasetCatalog",
    "MetadataCatalog",
    "build_detection_test_loader",
    "build_detection_train_loader",
    "get_detection_dataset_dicts",
    "DatasetMapper",
]
