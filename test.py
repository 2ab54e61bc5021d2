"""Sanity-check scratchpad — parity with the reference's test.py:80-92,
which recomputes cross entropy on saved pred_logits/gt_classes tensors.

Usage: python test.py [--logits pred_logits.pt --classes gt_classes.pt]
Accepts torch .pt tensors or .npy arrays.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def load_tensor(path):
    if path.endswith(".npy"):
        return np.load(path)
    import torch

    return (
        torch.load(path, map_location="cpu", weights_only=False)
        .detach()
        .numpy()
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--logits", default="pred_logits.pt")
    p.add_argument("--classes", default="gt_classes.pt")
    args = p.parse_args()

    if not os.path.exists(args.logits):
        print(f"{args.logits} not found — nothing to check")
        return

    import jax
    import jax.numpy as jnp

    logits = jnp.asarray(load_tensor(args.logits), jnp.float32)
    gt = jnp.asarray(load_tensor(args.classes), jnp.int32)

    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(logp, gt[:, None], axis=1)[:, 0]
    print(f"rows: {logits.shape[0]}  classes: {logits.shape[1]}")
    print(f"cross entropy (mean): {float(ce.mean()):.6f}")
    acc = float((jnp.argmax(logits, axis=1) == gt).mean())
    print(f"argmax accuracy vs gt: {acc:.4f}")
    bg = logits.shape[1] - 1
    fg = gt != bg
    if bool(fg.any()):
        print(f"fg rows: {int(fg.sum())}  fg CE: {float(ce[fg].mean()):.6f}")


if __name__ == "__main__":
    main()
