from .evaluator import inference_on_dataset, DatasetEvaluator
from .voc_eval import PascalVOCDetectionEvaluator, voc_ap, voc_eval_class
from .coco_eval import COCOEvaluator, evaluate_coco_detections
from ..utils.events import print_csv_format, verify_results

__all__ = [
    "inference_on_dataset",
    "DatasetEvaluator",
    "PascalVOCDetectionEvaluator",
    "voc_ap",
    "voc_eval_class",
    "COCOEvaluator",
    "evaluate_coco_detections",
    "print_csv_format",
    "verify_results",
]
