"""Import reference-format weights (Caffe2 ``.pkl`` / detectron2 ``.pth``)
into our flax parameter tree.

Parity target: defrcn/checkpoint/detection_checkpoint.py:23-56 — the
reference loads (a) Caffe2 ImageNet zoo files (R-101.pkl, run_voc.sh:5) with
name-matching heuristics and (b) torch .pth checkpoints in detectron2
naming. We translate both into our tree:

  Caffe2:      conv1_w / res{S}_{B}_branch2{a,b,c}(_bn_{s,b}) / branch1
  detectron2:  backbone.stem.conv1.weight / backbone.res2.0.conv1.norm.* /
               proposal_generator.rpn_head.* / roi_heads.res5.* /
               roi_heads.box_predictor.*

Layout conversions: torch conv OIHW -> flax HWIO; torch Linear (out, in) ->
flax Dense kernel (in, out); Caffe2 BN scale/bias -> FrozenBN weight/bias
with mean 0 / var 1 (stats already folded upstream).
"""

from __future__ import annotations

import pickle
from typing import Dict, Optional

import numpy as np
from flax import traverse_util

_BRANCH = {"branch2a": "conv1", "branch2b": "conv2", "branch2c": "conv3"}
_BRANCH_BN = {"branch2a": "bn1", "branch2b": "bn2", "branch2c": "bn3"}


def load_c2_pkl(path: str) -> Dict[str, np.ndarray]:
    with open(path, "rb") as f:
        data = pickle.load(f, encoding="latin1")
    if "blobs" in data:
        data = data["blobs"]
    return {k: np.asarray(v) for k, v in data.items() if not k.endswith("_momentum")}


def _c2_to_ours(name: str):
    """Caffe2 blob name -> our flattened param path (tuple) + kind."""
    # stem
    if name == "conv1_w":
        return ("backbone", "stem_conv1", "kernel"), "conv"
    if name in ("res_conv1_bn_s", "conv1_bn_s"):
        return ("backbone", "stem_bn1", "weight"), "bn"
    if name in ("res_conv1_bn_b", "conv1_bn_b"):
        return ("backbone", "stem_bn1", "bias"), "bn"
    if not name.startswith("res"):
        return None, None
    parts = name.split("_")
    stage = parts[0]  # res2..res5
    block = f"block{parts[1]}"
    branch = parts[2]
    if stage == "res5":
        prefix = ("roi_heads", "res5", "res5", block)
    else:
        prefix = ("backbone", stage, block)
    if branch == "branch1":
        if name.endswith("_bn_s"):
            return prefix + ("shortcut_bn", "weight"), "bn"
        if name.endswith("_bn_b"):
            return prefix + ("shortcut_bn", "bias"), "bn"
        return prefix + ("shortcut", "kernel"), "conv"
    conv = _BRANCH.get(branch)
    if conv is None:
        return None, None
    if name.endswith("_bn_s"):
        return prefix + (_BRANCH_BN[branch], "weight"), "bn"
    if name.endswith("_bn_b"):
        return prefix + (_BRANCH_BN[branch], "bias"), "bn"
    return prefix + (conv, "kernel"), "conv"


def _d2_to_ours(name: str):
    """detectron2 state-dict name -> our flattened path + kind."""
    n = name
    if n.startswith("backbone.stem.conv1."):
        rest = n[len("backbone.stem.conv1.") :]
        m = {
            "weight": (("backbone", "stem_conv1", "kernel"), "conv"),
            "norm.weight": (("backbone", "stem_bn1", "weight"), "bn"),
            "norm.bias": (("backbone", "stem_bn1", "bias"), "bn"),
            "norm.running_mean": (("backbone", "stem_bn1", "running_mean"), "bn"),
            "norm.running_var": (("backbone", "stem_bn1", "running_var"), "bn"),
        }
        return m.get(rest, (None, None))

    for src, dstp in (
        ("backbone.", ("backbone",)),
        ("roi_heads.res5.", ("roi_heads", "res5", "res5")),
    ):
        if n.startswith(src) and (
            src != "backbone." or n.split(".")[1].startswith("res")
        ):
            rest = n[len(src) :].split(".")
            if src == "backbone.":
                stage, rest = rest[0], rest[1:]
                prefix = dstp + (stage,)
            else:
                prefix = dstp
            block, mod = f"block{rest[0]}", rest[1]
            tail = ".".join(rest[2:])
            mod_map = {
                "conv1": ("conv1", "bn1"),
                "conv2": ("conv2", "bn2"),
                "conv3": ("conv3", "bn3"),
                "shortcut": ("shortcut", "shortcut_bn"),
            }
            if mod not in mod_map:
                return None, None
            convn, bnn = mod_map[mod]
            m = {
                "weight": ((prefix + (block, convn, "kernel")), "conv"),
                "norm.weight": ((prefix + (block, bnn, "weight")), "bn"),
                "norm.bias": ((prefix + (block, bnn, "bias")), "bn"),
                "norm.running_mean": ((prefix + (block, bnn, "running_mean")), "bn"),
                "norm.running_var": ((prefix + (block, bnn, "running_var")), "bn"),
            }
            return m.get(tail, (None, None))

    rpn_map = {
        "proposal_generator.rpn_head.conv": ("rpn_head", "conv"),
        "proposal_generator.rpn_head.objectness_logits": ("rpn_head", "objectness_logits"),
        "proposal_generator.rpn_head.anchor_deltas": ("rpn_head", "anchor_deltas"),
    }
    for src, dst in rpn_map.items():
        if n == src + ".weight":
            return dst + ("kernel",), "conv"
        if n == src + ".bias":
            return dst + ("bias",), "plain"

    lin_map = {
        "roi_heads.box_predictor.cls_score": ("roi_heads", "box_predictor", "cls_score"),
        "roi_heads.box_predictor.bbox_pred": ("roi_heads", "box_predictor", "bbox_pred"),
        "roi_heads.stu_box_predictor.cls_score": ("roi_heads", "stu_box_predictor", "cls_score"),
        "roi_heads.stu_box_predictor.bbox_pred": ("roi_heads", "stu_box_predictor", "bbox_pred"),
    }
    for src, dst in lin_map.items():
        if n == src + ".weight":
            return dst + ("kernel",), "linear"
        if n == src + ".bias":
            return dst + ("bias",), "plain"

    if n.startswith("affine_rpn.") or n.startswith("affine_rcnn."):
        mod, leaf = n.split(".")
        return (mod, leaf), "affine"

    return None, None


def _convert(value: np.ndarray, kind: str) -> np.ndarray:
    v = np.asarray(value)
    if kind == "conv":
        return v.transpose(2, 3, 1, 0)  # OIHW -> HWIO
    if kind == "linear":
        return v.T  # (out, in) -> (in, out)
    if kind == "affine":
        return v.reshape(-1)  # (1, C, 1, 1) -> (C,)
    return v


_INV_MOD = {
    "conv1": ("conv1", None),
    "conv2": ("conv2", None),
    "conv3": ("conv3", None),
    "bn1": ("conv1", "norm"),
    "bn2": ("conv2", "norm"),
    "bn3": ("conv3", "norm"),
    "shortcut": ("shortcut", None),
    "shortcut_bn": ("shortcut", "norm"),
}


def _ours_to_d2(path):
    """Inverse of `_d2_to_ours` for the DeFRCN core surface: our flattened
    param path -> (detectron2 state-dict name, kind). Params with no d2
    analog (the text/semantic branch modules the reference names under its
    own torch attributes) return (None, None) and are reported by the
    exporter rather than guessed.

    Every produced name is roundtrip-verified against `_d2_to_ours` by
    `export_d2_state`, so the two translators cannot drift."""
    p = tuple(map(str, path))
    if p == ("backbone", "stem_conv1", "kernel"):
        return "backbone.stem.conv1.weight", "conv"
    if len(p) == 3 and p[:2] == ("backbone", "stem_bn1"):
        return "backbone.stem.conv1.norm." + p[2], "bn"

    def res_block(prefix, block, mod, leaf):
        conv, norm = _INV_MOD.get(mod, (None, None))
        if conv is None or not block.startswith("block"):
            return None, None
        b = block[len("block"):]
        if norm:  # FrozenBN leaves keep d2 names (weight/bias/running_*)
            return f"{prefix}.{b}.{conv}.norm.{leaf}", "bn"
        if leaf != "kernel":
            return None, None
        return f"{prefix}.{b}.{conv}.weight", "conv"

    if len(p) == 5 and p[0] == "backbone" and p[1].startswith("res"):
        return res_block(f"backbone.{p[1]}", p[2], p[3], p[4])
    if len(p) == 6 and p[:3] == ("roi_heads", "res5", "res5"):
        return res_block("roi_heads.res5", p[3], p[4], p[5])

    if len(p) == 3 and p[0] == "rpn_head" and p[1] in (
        "conv", "objectness_logits", "anchor_deltas"
    ):
        base = f"proposal_generator.rpn_head.{p[1]}"
        if p[2] == "kernel":
            return base + ".weight", "conv"
        if p[2] == "bias":
            return base + ".bias", "plain"

    if len(p) == 4 and p[0] == "roi_heads" and p[1] in (
        "box_predictor", "stu_box_predictor"
    ) and p[2] in ("cls_score", "bbox_pred"):
        base = f"roi_heads.{p[1]}.{p[2]}"
        if p[3] == "kernel":
            return base + ".weight", "linear"
        if p[3] == "bias":
            return base + ".bias", "plain"

    if len(p) == 2 and p[0] in ("affine_rpn", "affine_rcnn"):
        return f"{p[0]}.{p[1]}", "affine"

    return None, None


def _deconvert(value: np.ndarray, kind: str) -> np.ndarray:
    """Inverse of `_convert`: our layout -> torch layout."""
    v = np.asarray(value)
    if kind == "conv":
        return v.transpose(3, 2, 0, 1)  # HWIO -> OIHW
    if kind == "linear":
        return v.T  # (in, out) -> (out, in)
    if kind == "affine":
        return v.reshape(1, -1, 1, 1)  # (C,) -> (1, C, 1, 1)
    return v


def export_d2_state(params: Dict):
    """Our param tree -> detectron2-named state dict (torch layouts), so a
    checkpoint trained here can be loaded by the reference's
    DetectionCheckpointer (detection_checkpoint.py:8-56) for cross-
    framework validation. Returns (state, exported_paths, skipped_paths);
    skipped = params with no d2 analog (text-branch modules)."""
    flat = traverse_util.flatten_dict(params)
    state, exported, skipped = {}, [], []
    for path, value in flat.items():
        name, kind = _ours_to_d2(path)
        if name is None:
            skipped.append("/".join(map(str, path)))
            continue
        back_path, back_kind = _d2_to_ours(name)
        assert back_path == tuple(map(str, path)) and back_kind == kind, (
            f"exporter/importer drift at {path} -> {name} -> {back_path}"
        )
        state[name] = _deconvert(np.asarray(value, np.float32), kind)
        exported.append(name)
    return state, exported, skipped


def apply_weight_dict(
    params: Dict, named: Dict[str, np.ndarray], translate, strict: bool = False
):
    """Merge translated weights into a (nested dict) param tree."""
    flat = traverse_util.flatten_dict(params)
    matched, skipped = 0, []
    for name, value in named.items():
        path, kind = translate(name)
        if path is None:
            skipped.append(name)
            continue
        if path not in flat:
            skipped.append(name)
            continue
        conv = _convert(value, kind)
        if flat[path].shape != conv.shape:
            if strict:
                raise ValueError(
                    f"{name}: shape {conv.shape} != {flat[path].shape}"
                )
            skipped.append(name)
            continue
        flat[path] = conv.astype(np.asarray(flat[path]).dtype)
        matched += 1
    return traverse_util.unflatten_dict(flat), matched, skipped


def _merge_our_state(state: Dict, params: Dict):
    """Merge one of OUR saved states ({params, ...} or bare params) into
    ``params`` by matching path + shape."""
    src = state["params"] if "params" in state else state
    flat_src = traverse_util.flatten_dict(src)
    flat_dst = traverse_util.flatten_dict(params)
    matched = 0
    skipped = []
    for k, v in flat_src.items():
        if k in flat_dst and flat_dst[k].shape == v.shape:
            flat_dst[k] = v
            matched += 1
        else:
            skipped.append("/".join(map(str, k)))
    return traverse_util.unflatten_dict(flat_dst), matched, skipped


def load_reference_weights(path: str, params: Dict):
    """Load .pkl (Caffe2) / .pth (torch) / .ckpt or orbax dir (ours)."""
    import os

    if path.endswith(".pkl"):
        named = load_c2_pkl(path)
        new, matched, skipped = apply_weight_dict(params, named, _c2_to_ours)
        return new, matched, skipped
    if os.path.isdir(path) or path.endswith(".ckpt"):  # ours
        from .checkpointer import load_checkpoint_file

        return _merge_our_state(load_checkpoint_file(path), params)
    # torch .pth
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state = ckpt.get("model", ckpt)
    named = {k: v.numpy() for k, v in state.items() if hasattr(v, "numpy")}
    return apply_weight_dict(params, named, _d2_to_ours)


def maybe_load_reference_weights(path: str, params: Dict) -> Dict:
    import logging
    import os

    if not path:
        return params
    if not os.path.exists(path):
        # The reference crashes here too (fvcore Checkpointer asserts the
        # file exists). Silently evaluating a random-init model because of
        # a typo'd path is far worse than failing loudly.
        raise FileNotFoundError(
            f"MODEL.WEIGHTS {path!r} does not exist. Set MODEL.WEIGHTS '' "
            "explicitly to train from scratch."
        )
    new, matched, skipped = load_reference_weights(path, params)
    logging.getLogger(__name__).info(
        "Loaded %d tensors from %s (%d unmatched)", matched, path, len(skipped)
    )
    return new
