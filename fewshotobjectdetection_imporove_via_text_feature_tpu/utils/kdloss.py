"""DKD-style fg/bg-decomposed distillation loss — JAX port of
defrcn/utils/kdloss.py:5-50 (dandr_loss; unused by live configs but part
of the reference's component inventory)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dandr_loss(
    logits_student,
    logits_teacher,
    target,
    alpha,
    beta,
    temperature,
    detach_target=True,
):
    if detach_target:
        logits_teacher = jax.lax.stop_gradient(logits_teacher)
    t = temperature
    n, k = logits_student.shape
    bg_col = k - 1

    fg = target != bg_col
    onehot = jax.nn.one_hot(target, k, dtype=bool)
    gt_mask = onehot.at[:, -1].set(False)
    other_mask = (~onehot).at[:, -1].set(True)

    pred_teacher = jax.nn.softmax(logits_teacher / t, axis=1)
    p_non_target_pos_teacher = jnp.sum(
        pred_teacher * other_mask, axis=1
    )  # (N,)

    nt_logits_t = logits_teacher - 1000.0 * gt_mask
    nt_logits_s = logits_student - 1000.0 * gt_mask

    bg_mask = jnp.zeros((n, k), bool).at[:, -1].set(True)
    non_bg_mask = ~bg_mask

    nt_pred_s = jax.nn.softmax(nt_logits_s / t, axis=1)
    nt_pred_t = jax.nn.softmax(nt_logits_t / t, axis=1)

    def cat_mask(p):
        return jnp.stack(
            [jnp.sum(p * bg_mask, 1), jnp.sum(p * non_bg_mask, 1)], axis=1
        )

    p_fbd_s = cat_mask(nt_pred_s)
    p_fbd_t = cat_mask(nt_pred_t)
    loss_fbd = (
        jnp.sum(
            p_fbd_t * (jnp.log(jnp.maximum(p_fbd_t, 1e-30))
                       - jnp.log(jnp.maximum(p_fbd_s, 1e-30))),
            axis=1,
        )
        * t * t
    )

    p_fcd_t = jax.nn.softmax(nt_logits_t / t - 1000.0 * bg_mask, axis=1)
    logp_fcd_s = jax.nn.log_softmax(nt_logits_s / t - 1000.0 * bg_mask, axis=1)
    logp_fcd_t = jax.nn.log_softmax(nt_logits_t / t - 1000.0 * bg_mask, axis=1)
    loss_fcd = p_fbd_t[:, 1] * (
        jnp.sum(p_fcd_t * (logp_fcd_t - logp_fcd_s), axis=1) * t * t
    )

    def masked_mean(v, m):
        return jnp.sum(jnp.where(m, v, 0.0)) / jnp.maximum(jnp.sum(m), 1)

    return (
        alpha * masked_mean(p_non_target_pos_teacher * loss_fbd, fg)
        + beta * masked_mean(loss_fbd, ~fg)
        + masked_mean(p_non_target_pos_teacher * loss_fcd, fg)
        + masked_mean(loss_fcd, ~fg)
    )
