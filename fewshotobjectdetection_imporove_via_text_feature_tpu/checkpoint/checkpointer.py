"""Checkpoint save/load — pytree checkpoints with a last_checkpoint marker.

Parity with the reference's DetectionCheckpointer usage
(defrcn/checkpoint/detection_checkpoint.py:8-56 + fvcore Checkpointer):
checkpoints carry {params, opt_state, iteration}; ``last_checkpoint`` file
tracks the newest; ``resume_or_load`` semantics live in the Trainer.

Format: a single pickle of a pure-numpy pytree (optax states are
namedtuple pytrees and round-trip fine). Torch-format import lives in
torch_import.py.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict, Optional

import jax
import numpy as np


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


class Checkpointer:
    def __init__(self, save_dir: str):
        self.save_dir = save_dir
        os.makedirs(save_dir, exist_ok=True)

    def save(self, state: Dict[str, Any], name: str):
        path = os.path.join(self.save_dir, name + ".ckpt")
        with open(path, "wb") as f:
            pickle.dump(_to_numpy(state), f, protocol=4)
        with open(os.path.join(self.save_dir, "last_checkpoint"), "w") as f:
            f.write(name + ".ckpt")
        return path

    def load(self, path: str) -> Dict[str, Any]:
        with open(path, "rb") as f:
            return pickle.load(f)

    def has_checkpoint(self) -> bool:
        return os.path.exists(os.path.join(self.save_dir, "last_checkpoint"))

    def load_latest(self) -> Optional[Dict[str, Any]]:
        marker = os.path.join(self.save_dir, "last_checkpoint")
        if not os.path.exists(marker):
            return None
        with open(marker) as f:
            name = f.read().strip()
        return self.load(os.path.join(self.save_dir, name))
