"""Gradient Decoupled Layer — DeFRCN's core trick, as a jax.custom_vjp.

Ref: defrcn/modeling/meta_arch/gdl.py:6-38 — identity forward, gradient
scaled by a constant lambda on the backward pass. Applied to backbone
features before the RPN (lambda = 0, a stop-gradient) and before the ROI
heads (lambda = 0.75 base / 0.01-0.001 novel).
"""

from __future__ import annotations

from functools import partial

import jax


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def decouple_layer(x, scale: float):
    """Identity forward; multiplies the cotangent by ``scale`` on backward."""
    return x


def _fwd(x, scale):
    return x, None


def _bwd(scale, _, g):
    return (jax.tree_util.tree_map(lambda t: t * scale, g),)


decouple_layer.defvjp(_fwd, _bwd)
