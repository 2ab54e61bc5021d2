"""Trainer hooks — periodic in-training evaluation (parity:
defrcn/engine/hooks.py:15-83 EvalHookDeFRCN: dumps inference/iter_*.json
per period and res_final.json at the end)."""

from __future__ import annotations

import json
import logging
import os
from typing import Callable

logger = logging.getLogger(__name__)


class EvalHook:
    """Runs eval_fn(params) every ``period`` iterations and at the end."""

    def __init__(self, period: int, max_iter: int, output_dir: str,
                 eval_fn: Callable):
        self.period = period
        self.max_iter = max_iter
        self.output_dir = output_dir
        self.eval_fn = eval_fn

    def __call__(self, iteration: int, params):
        is_final = iteration == self.max_iter - 1
        if not (
            is_final
            or (self.period > 0 and (iteration + 1) % self.period == 0)
        ):
            return
        results = self.eval_fn(params)
        flat = _flatten(results)
        out_dir = os.path.join(self.output_dir, "inference")
        os.makedirs(out_dir, exist_ok=True)
        name = "res_final.json" if is_final else f"iter_{iteration:07d}.json"
        with open(os.path.join(out_dir, name), "w") as f:
            json.dump(flat, f)
        logger.info("EvalHook iter %d: %s", iteration, flat)


def _flatten(results, prefix=""):
    out = {}
    for k, v in results.items():
        key = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            try:
                out[key] = float(v)
            except (TypeError, ValueError):
                pass
    return out
