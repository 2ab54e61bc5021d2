"""Torchvision-style ResNet-101 for the PCB
(ref defrcn/evaluation/archs/resnet.py:118-212 — forward returns
(fc logits, res5 feature map)).

Differences from the detection backbone: stride lives on the 3x3 conv
(stride_in_1x1=False, torchvision convention), all four stages are present
(output stride 32), plus global-avg-pool -> fc(1000). BN runs with frozen
inference statistics (the PCB model is eval-only)."""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ..models.backbone import FrozenBN, ResStage, _conv


class TorchvisionResNet(nn.Module):
    depth: int = 101
    num_classes: int = 1000
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from ..models.backbone import RESNET_STAGES

        blocks = RESNET_STAGES[self.depth]
        x = x.astype(self.dtype)
        x = _conv(64, 7, 2, name="conv1", dtype=self.dtype)(x)
        x = FrozenBN(64, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(
            x, window_shape=(3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)]
        )
        for i, (name, n) in enumerate(
            zip(("layer1", "layer2", "layer3", "layer4"), blocks)
        ):
            x = ResStage(
                num_blocks=n,
                bottleneck_channels=64 * (2**i),
                out_channels=256 * (2**i),
                first_stride=1 if i == 0 else 2,
                stride_in_1x1=False,  # torchvision convention
                dtype=self.dtype,
                name=name,
            )(x)
        feature = x  # (B, H/32, W/32, 2048)
        pooled = jnp.mean(x, axis=(1, 2)).astype(jnp.float32)
        logits = nn.Dense(self.num_classes, name="fc")(pooled)
        return logits, feature


def torchvision_r101_manifest():
    """Complete key list of the torchvision ResNet-101 state dict
    (resnet101-5d3b4d8f.pth — the file TEST.PCB_MODELPATH points at,
    reference calibration_layer.py:38-39): 522 tensors from the canonical
    [3, 4, 23, 3] bottleneck layout. Used by tools/preflight_real_voc.py
    to gate real runs on full import coverage; pinned independently by
    tests/test_weight_import.py."""
    bn_leaves = ("weight", "bias", "running_mean", "running_var")
    keys = ["conv1.weight"] + [f"bn1.{l}" for l in bn_leaves]
    for li, n in enumerate((3, 4, 23, 3), start=1):
        for b in range(n):
            p = f"layer{li}.{b}"
            for c in (1, 2, 3):
                keys.append(f"{p}.conv{c}.weight")
                keys += [f"{p}.bn{c}.{l}" for l in bn_leaves]
            if b == 0:
                keys.append(f"{p}.downsample.0.weight")
                keys += [f"{p}.downsample.1.{l}" for l in bn_leaves]
    keys += ["fc.weight", "fc.bias"]
    return keys


def tv_translate(name: str):
    """torchvision state-dict name -> our flattened path + kind."""
    if name == "conv1.weight":
        return ("conv1", "kernel"), "conv"
    for leaf, ours in (
        ("weight", "weight"),
        ("bias", "bias"),
        ("running_mean", "running_mean"),
        ("running_var", "running_var"),
    ):
        if name == f"bn1.{leaf}":
            return ("bn1", ours), "bn"
    if name == "fc.weight":
        return ("fc", "kernel"), "linear"
    if name == "fc.bias":
        return ("fc", "bias"), "plain"
    if name.startswith("layer"):
        parts = name.split(".")
        layer, block = parts[0], f"block{parts[1]}"
        mod = parts[2]
        leaf = ".".join(parts[3:])
        if mod == "downsample":
            # downsample.0 = conv, downsample.1 = bn
            sub = "shortcut" if parts[3] == "0" else "shortcut_bn"
            leaf = parts[4]
            kind = "conv" if sub == "shortcut" else "bn"
            ours_leaf = "kernel" if sub == "shortcut" else {
                "weight": "weight", "bias": "bias",
                "running_mean": "running_mean", "running_var": "running_var",
            }[leaf]
            return (layer, block, sub, ours_leaf), kind
        if mod.startswith("conv"):
            return (layer, block, mod, "kernel"), "conv"
        if mod.startswith("bn"):
            ours_leaf = {
                "weight": "weight", "bias": "bias",
                "running_mean": "running_mean", "running_var": "running_var",
            }.get(leaf)
            if ours_leaf is None:
                return None, None
            return (layer, block, mod, ours_leaf), "bn"
    return None, None
