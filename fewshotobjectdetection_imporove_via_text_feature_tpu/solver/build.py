"""Optimizer + LR schedule — optax port of the reference solver.

Ref: defrcn/solver/build.py:91-163 (SGD with per-group lr/weight-decay:
norm params get WEIGHT_DECAY_NORM, biases get BIAS_LR_FACTOR lr and
WEIGHT_DECAY_BIAS, everything else BASE_LR/WEIGHT_DECAY; optional grad
clip) and lr_scheduler.py:16-114 (WarmupMultiStepLR / WarmupCosineLR,
iteration-based with linear/constant warmup).

TPU re-design: one optax chain; per-group behavior via optax.masked with
disjoint masks; the DeFRCN freeze switches (BACKBONE.FREEZE/FREEZE_AT,
RPN.FREEZE, ROI_HEADS.FREEZE_FEAT — ref rcnn.py:38-51) plus FrozenBN
stats/affine become a final set-to-zero mask so frozen params can never
drift (not even from weight decay).
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp
import optax
from flax import traverse_util


def build_lr_scheduler(cfg) -> Callable[[int], jnp.ndarray]:
    """Returns schedule(step) -> learning rate."""
    base_lr = cfg.SOLVER.BASE_LR
    steps = tuple(cfg.SOLVER.STEPS)
    gamma = cfg.SOLVER.GAMMA
    warmup_iters = cfg.SOLVER.WARMUP_ITERS
    warmup_factor = cfg.SOLVER.WARMUP_FACTOR
    warmup_method = cfg.SOLVER.WARMUP_METHOD
    max_iter = cfg.SOLVER.MAX_ITER
    name = cfg.SOLVER.LR_SCHEDULER_NAME

    def warmup(step):
        if warmup_iters <= 0:
            return jnp.asarray(1.0)
        alpha = jnp.clip(step / warmup_iters, 0.0, 1.0)
        if warmup_method == "constant":
            return jnp.where(step < warmup_iters, warmup_factor, 1.0)
        return jnp.where(
            step < warmup_iters, warmup_factor * (1 - alpha) + alpha, 1.0
        )

    if name == "WarmupMultiStepLR":

        def schedule(step):
            mult = jnp.asarray(1.0)
            for s in steps:
                mult = mult * jnp.where(step >= s, gamma, 1.0)
            return base_lr * warmup(step) * mult

    elif name == "WarmupCosineLR":

        def schedule(step):
            progress = jnp.clip(step / max_iter, 0.0, 1.0)
            return (
                base_lr * warmup(step)
                * 0.5 * (1.0 + jnp.cos(math.pi * progress))
            )

    else:
        raise ValueError(f"Unknown LR scheduler: {name}")

    return schedule


def _path_masks(cfg, params):
    """Build boolean pytrees over ``params`` (the content of
    variables['params'])."""
    flat = traverse_util.flatten_dict(params, sep="/")

    def is_bn_param(path):
        parts = path.split("/")
        mod = parts[-2] if len(parts) >= 2 else ""
        return mod.startswith("bn") or mod.endswith("bn1") or mod.endswith(
            "_bn"
        ) or parts[-1] in ("running_mean", "running_var")

    def is_bias(path):
        return path.split("/")[-1] == "bias"

    def is_norm_param(path):
        # live (trainable) norm modules: the attention FFN LayerNorm
        # ("norm3"). The reference puts ALL params of norm module types —
        # weight AND bias — in the WEIGHT_DECAY_NORM group at plain
        # BASE_LR (d2 build_optimizer norm_module_types branch, which wins
        # over the bias branch). FrozenBN params are handled by the frozen
        # mask.
        parts = path.split("/")
        return len(parts) >= 2 and parts[-2].startswith("norm")

    freeze_at = cfg.MODEL.BACKBONE.FREEZE_AT
    if cfg.MODEL.BACKBONE.FREEZE:
        freeze_at = 4

    def is_frozen(path):
        if is_bn_param(path):  # FrozenBN: stats AND affine never train
            return True
        if path.startswith("backbone/stem") and freeze_at >= 1:
            return True
        for idx, stage in enumerate(("res2", "res3", "res4"), start=2):
            if path.startswith(f"backbone/{stage}") and freeze_at >= idx:
                return True
        if cfg.MODEL.RPN.FREEZE and path.startswith("rpn_head/"):
            return True
        if cfg.MODEL.ROI_HEADS.FREEZE_FEAT and path.startswith(
            "roi_heads/res5"
        ):
            return True
        # ref roi_heads.py:948-951: requires_grad=False on the semantic
        # attention module only — parameter-level freeze, gradients still
        # flow through it into res5/backbone
        if cfg.MODEL.ADDITION.FREEZEATTENTION and path.startswith(
            "roi_heads/attention"
        ):
            return True
        return False

    frozen = {k: is_frozen(k) for k in flat}
    norm = {k: (not frozen[k]) and is_norm_param(k) for k in flat}
    bias = {
        k: (not frozen[k]) and (not norm[k]) and is_bias(k) for k in flat
    }
    regular = {
        k: (not frozen[k]) and (not norm[k]) and not is_bias(k)
        for k in flat
    }

    def unflat(d):
        return traverse_util.unflatten_dict(
            {tuple(k.split("/")): v for k, v in d.items()}
        )

    return unflat(frozen), unflat(bias), unflat(regular), unflat(norm)


def _clip_each_param_norm(max_norm: float, norm_type: float = 2.0):
    """Per-parameter norm clipping — the reference registers every param
    as its own group, so d2's clip_grad_norm_ clips EACH tensor's norm to
    CLIP_VALUE independently (defrcn/solver/build.py:23-47), unlike a
    global-norm rescale. Matches torch's clip_coef = max/(norm + 1e-6)."""

    def clip_leaf(g):
        g32 = g.astype(jnp.float32)
        if math.isinf(norm_type):
            n = jnp.max(jnp.abs(g32))
        else:
            n = jnp.sum(jnp.abs(g32) ** norm_type) ** (1.0 / norm_type)
        scale = jnp.minimum(1.0, max_norm / (n + 1e-6))
        return (g32 * scale).astype(g.dtype)

    def update_fn(updates, state, params=None):
        return jax.tree_util.tree_map(clip_leaf, updates), state

    return optax.GradientTransformation(
        lambda params: optax.EmptyState(), update_fn
    )


def build_optimizer(cfg, params):
    schedule = build_lr_scheduler(cfg)
    frozen, bias_mask, regular_mask, norm_mask = _path_masks(cfg, params)

    chain = []
    if cfg.SOLVER.CLIP_GRADIENTS.ENABLED:
        if cfg.SOLVER.CLIP_GRADIENTS.CLIP_TYPE == "norm":
            chain.append(
                _clip_each_param_norm(
                    cfg.SOLVER.CLIP_GRADIENTS.CLIP_VALUE,
                    float(cfg.SOLVER.CLIP_GRADIENTS.NORM_TYPE),
                )
            )
        else:
            chain.append(optax.clip(cfg.SOLVER.CLIP_GRADIENTS.CLIP_VALUE))

    chain += [
        optax.masked(
            optax.add_decayed_weights(cfg.SOLVER.WEIGHT_DECAY), regular_mask
        ),
        optax.masked(
            optax.add_decayed_weights(cfg.SOLVER.WEIGHT_DECAY_BIAS), bias_mask
        ),
        optax.masked(
            optax.add_decayed_weights(cfg.SOLVER.WEIGHT_DECAY_NORM), norm_mask
        ),
        optax.trace(decay=cfg.SOLVER.MOMENTUM, nesterov=cfg.SOLVER.NESTEROV),
    ]
    if cfg.SOLVER.BIAS_LR_FACTOR != 1.0:
        chain.append(
            optax.masked(optax.scale(cfg.SOLVER.BIAS_LR_FACTOR), bias_mask)
        )
    chain.append(optax.scale_by_learning_rate(schedule))
    chain.append(optax.masked(optax.set_to_zero(), frozen))
    return optax.chain(*chain), schedule


def make_train_state(cfg, params):
    tx, schedule = build_optimizer(cfg, params)
    opt_state = tx.init(params)
    return tx, opt_state, schedule
