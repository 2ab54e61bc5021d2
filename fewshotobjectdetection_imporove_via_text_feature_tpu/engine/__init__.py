from .trainer import Trainer, make_train_step, default_setup
from .predictor import DefaultPredictor
from .export import ServingPredictor, export_inference
from .hooks import EvalHook

# reference-name alias (defrcn/engine/defaults.py DefaultTrainer)
DefaultTrainer = Trainer

__all__ = [
    "Trainer",
    "DefaultTrainer",
    "make_train_step",
    "default_setup",
    "DefaultPredictor",
    "ServingPredictor",
    "export_inference",
    "EvalHook",
]
