"""Checkpoint surgery for the base->novel few-shot pipeline.

Parity with tools/model_surgery.py in the reference:
  * remove   — drop the cls_score/bbox_pred heads (fsod fine-tune re-inits)
  * randinit — expand the heads from #base to #all classes, copying base
    rows (VOC: first 15 positions; COCO: through the IDMAP base-id ->
    all-contiguous-id mapping) and the background row
  * reset    — zero the optimizer state and iteration counter

Our Dense kernels are (features_in, classes_out), i.e. the torch rows live
on the LAST axis here.
"""

from __future__ import annotations

import copy
from typing import Dict, List

import numpy as np

COCO_NOVEL_IDS = [1, 2, 3, 4, 5, 6, 7, 9, 16, 17, 18, 19, 20, 21, 44, 62, 63, 64, 67, 72]
COCO_BASE_IDS = [8, 10, 11, 13, 14, 15, 22, 23, 24, 25, 27, 28, 31, 32, 33,
                 34, 35, 36, 37, 38, 39, 40, 41, 42, 43, 46, 47, 48, 49, 50,
                 51, 52, 53, 54, 55, 56, 57, 58, 59, 60, 61, 65, 70, 73, 74,
                 75, 76, 77, 78, 79, 80, 81, 82, 84, 85, 86, 87, 88, 89, 90]
COCO_ALL_IDS = sorted(COCO_BASE_IDS + COCO_NOVEL_IDS)
COCO_IDMAP = {v: i for i, v in enumerate(COCO_ALL_IDS)}


def _get_predictor(params: Dict, path=("roi_heads", "box_predictor")):
    node = params
    for p in path:
        node = node[p]
    return node


def surgery_remove(params: Dict, predictor_names=("box_predictor",)) -> Dict:
    """Delete cls_score/bbox_pred so the novel model re-initializes them."""
    out = copy.deepcopy(params)
    heads = out.get("roi_heads", {})
    for name in predictor_names:
        pred = heads.get(name)
        if pred is None:
            continue
        pred.pop("cls_score", None)
        pred.pop("bbox_pred", None)
    return out


def surgery_randinit(
    params: Dict,
    num_all_classes: int,
    dataset: str = "voc",
    seed: int = 0,
    predictor_names=("box_predictor",),
) -> Dict:
    """Expand heads to ``num_all_classes``; base rows copied, novel rows
    N(0, 0.01) / zero bias, bg row preserved (ref model_surgery.py:57-84)."""
    rng = np.random.RandomState(seed)
    out = copy.deepcopy(params)
    heads = out["roi_heads"]

    if dataset == "coco":
        base_positions = [COCO_IDMAP[c] for c in COCO_BASE_IDS]
    else:
        base_positions = None  # contiguous prefix

    for name in predictor_names:
        if name not in heads:
            continue
        pred = heads[name]
        for pname, tar in (
            ("cls_score", num_all_classes + 1),
            ("bbox_pred", num_all_classes * 4),
        ):
            kernel = np.asarray(pred[pname]["kernel"])  # (D, out)
            bias = np.asarray(pred[pname]["bias"])
            feat = kernel.shape[0]
            prev_out = kernel.shape[1]
            prev_cls = prev_out - 1 if pname == "cls_score" else prev_out // 4

            new_kernel = rng.normal(0, 0.01, (feat, tar)).astype(kernel.dtype)
            new_bias = np.zeros((tar,), bias.dtype)

            if pname == "cls_score":
                if base_positions is None:
                    new_kernel[:, :prev_cls] = kernel[:, :prev_cls]
                    new_bias[:prev_cls] = bias[:prev_cls]
                else:
                    for idx, pos in enumerate(base_positions):
                        new_kernel[:, pos] = kernel[:, idx]
                        new_bias[pos] = bias[idx]
                new_kernel[:, -1] = kernel[:, -1]  # bg
                new_bias[-1] = bias[-1]
            else:
                if base_positions is None:
                    new_kernel[:, : prev_cls * 4] = kernel[:, : prev_cls * 4]
                    new_bias[: prev_cls * 4] = bias[: prev_cls * 4]
                else:
                    for idx, pos in enumerate(base_positions):
                        new_kernel[:, pos * 4 : (pos + 1) * 4] = kernel[
                            :, idx * 4 : (idx + 1) * 4
                        ]
                        new_bias[pos * 4 : (pos + 1) * 4] = bias[
                            idx * 4 : (idx + 1) * 4
                        ]
            pred[pname] = {"kernel": new_kernel, "bias": new_bias}
    return out


def reset_optimizer(state: Dict) -> Dict:
    """Drop optimizer state and zero the iteration (ref
    model_surgery.py:5-16)."""
    out = dict(state)
    out.pop("opt_state", None)
    out["iteration"] = 0
    return out


def surgery_reset_student(params: Dict, seed: int = 123):
    """Re-randomize the text-head STUDENT branch (stu_box_predictor +
    mlp_adapter), keeping teacher/backbone/RPN — prepares the COLD student
    of the two-stage distillation recipe (the reference re-trains a fresh
    student against the converged teacher, run_text_train_Student.sh:26-33
    distill combo). Returns (new_params, n_reset).

    Kernels get lecun-normal-ish fresh draws; biases zero."""
    import jax
    import jax.numpy as jnp

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    key = jax.random.PRNGKey(seed)
    new_leaves = []
    n_reset = 0
    for path, leaf in flat:
        names = "/".join(getattr(p, "key", str(p)) for p in path)
        if "stu_box_predictor" in names or "mlp_adapter" in names:
            key, sub = jax.random.split(key)
            if leaf.ndim >= 2:
                fan_in = int(np.prod(leaf.shape[:-1]))
                leaf = jax.random.normal(
                    sub, leaf.shape, leaf.dtype
                ) / np.sqrt(max(fan_in, 1))
            else:
                leaf = jnp.zeros_like(leaf)
            n_reset += 1
        new_leaves.append(leaf)
    if n_reset < 6:
        raise ValueError(
            f"student subtree not found (reset {n_reset} leaves) — is this "
            "a TextRes5ROIHeads checkpoint?"
        )
    return jax.tree_util.tree_unflatten(treedef, new_leaves), n_reset
