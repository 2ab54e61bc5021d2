from .trainer import Trainer, make_train_step, default_setup
from .predictor import DefaultPredictor

__all__ = ["Trainer", "make_train_step", "default_setup", "DefaultPredictor"]
