from .build import build_optimizer, build_lr_scheduler, make_train_state

__all__ = ["build_optimizer", "build_lr_scheduler", "make_train_state"]
