from .checkpointer import Checkpointer
from .surgery import surgery_remove, surgery_randinit, reset_optimizer

__all__ = [
    "Checkpointer",
    "surgery_remove",
    "surgery_randinit",
    "reset_optimizer",
]
