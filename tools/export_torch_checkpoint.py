#!/usr/bin/env python
"""Export one of our checkpoints to a detectron2-named torch .pth.

The inverse of the weight importer: a model trained in this framework can
be loaded by the reference's DetectionCheckpointer
(/root/reference/defrcn/checkpoint/detection_checkpoint.py:8-56) and
evaluated THERE — the strongest possible cross-framework parity check, and
an exit ramp for users who need to hand weights back to a torch pipeline.

Covers the DeFRCN core surface (backbone, RPN head, res5, box predictors,
affine layers); text/semantic-branch params have no committed reference
naming and are listed as skipped rather than guessed.

Usage:
    python tools/export_torch_checkpoint.py --src out/model_final.ckpt \
        --dst out/model_final_d2.pth
"""

from __future__ import annotations

import argparse
import os

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True, help="our .ckpt checkpoint")
    ap.add_argument("--dst", required=True, help="output .pth path")
    args = ap.parse_args()

    import torch

    from fewshotobjectdetection_imporove_via_text_feature_tpu.checkpoint.torch_import import (
        export_d2_state,
    )

    from fewshotobjectdetection_imporove_via_text_feature_tpu.checkpoint.checkpointer import (
        load_checkpoint_file,
    )

    state = load_checkpoint_file(args.src)  # .ckpt or orbax dir
    params = state["params"] if "params" in state else state
    import numpy as np

    d2_state, exported, skipped = export_d2_state(params)
    out = {
        "model": {k: torch.from_numpy(np.ascontiguousarray(v))
                  for k, v in d2_state.items()},
        "__author__": "fsodtf-tpu export_torch_checkpoint",
        "iteration": state.get("iteration", 0) if isinstance(state, dict) else 0,
    }
    torch.save(out, args.dst)
    print(f"exported {len(exported)} tensors -> {args.dst}")
    if skipped:
        print(f"skipped {len(skipped)} params with no d2 naming, e.g.:")
        for s in skipped[:8]:
            print(f"  - {s}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
