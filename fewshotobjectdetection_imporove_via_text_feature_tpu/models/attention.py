"""Attention modules for the text-feature branch — flax, fixed-shape.

Spec source: defrcn/modeling/roi_heads/attentive_modules.py —
  * ScaledDotProductAttention (:36-55) with 1/sqrt(d) temperature,
  * FFN (:58-75): linear(d->1024) relu linear(1024->d) + residual + LN,
  * SingleHeadSiameseAttention (:78-177): separate Q/K/V linears (no bias),
    a learned "dummy" background token appended to K with a zero V token,
    output = FFN(linear3(cat(linear1(out*res), linear2(res-out), res))),
  * SematicProposalAttention (:191-294): K/V = relu(proj(class-embedding
    bank + orthogonal bg vector)); returns attention scores + sim2stext,
  * LV_attention (:297-437): teacher-forcing — per-ROI text feature is the
    one-hot(gt)-indexed projected embedding; V = proj(cat(vis, text)),
  * LV_attention_VKV (:440-487): q = v variant. NOTE the reference's
    forward is unrunnable as committed: it calls
    ``self.forward_language_model(visual_feat, text)`` but inherits
    LV_attention's single-argument ``forward_language_model(label)``
    (:382), a guaranteed TypeError — we implement the evident intent
    (same pipeline, q = value),
  * LV_attention_textDomination{,_VKV} (:490-687): attention carried in
    text space (vis projected C->300, output projected back 300->C).

TPU notes: all token counts are static (ROI batch, classes+1); the QK^T /
softmax / AV chain fuses under XLA into MXU matmuls — at these sizes
(<=2048 x ~21..2049 tokens) a flash-style Pallas kernel buys nothing, the
whole thing lives in VMEM.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def scaled_dot_product_attention(q, k, v, temperature, key_mask=None):
    """q (B, Lq, D), k (B, Lk, D), v (B, Lk, D).

    key_mask (B, Lk) bool, optional: False keys get -inf logits (zero
    attention weight). None = unmasked, bit-identical to the original
    path. Used to keep PAD ROI slots out of the cross-ROI teacher
    attention (fixed-shape validity contract); the reference has no
    equivalent because its row count is dynamic."""
    attn = jnp.einsum(
        "bqd,bkd->bqk", q, k, preferred_element_type=jnp.float32
    ) / temperature
    if key_mask is not None:
        attn = jnp.where(key_mask[:, None, :], attn, -jnp.inf)
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum("bqk,bkd->bqd", attn, v)
    return out, attn


# torch nn.Linear's default kaiming_uniform(a=sqrt(5)) == U(±1/sqrt(fan_in))
# — the init every reference Linear gets unless explicitly overridden.
# Deviation (documented): torch also draws biases from U(±1/sqrt(fan_in));
# flax biases stay zero here.
torch_linear_init = nn.initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform"
)


class FFN(nn.Module):
    d_model: int
    d_ffn: int = 1024
    kernel_init: Any = None  # None -> torch default

    @nn.compact
    def __call__(self, x):
        init = self.kernel_init or torch_linear_init
        h = nn.Dense(self.d_ffn, kernel_init=init, name="linear1")(x)
        h = nn.relu(h)
        h = nn.Dense(self.d_model, kernel_init=init, name="linear2")(h)
        # epsilon=1e-5: torch nn.LayerNorm's default (the reference's FFN
        # norm3, attentive_modules.py:69). flax defaults to 1e-6 — the
        # mismatch showed up as a systematic ~4e-3 drift in the teacher
        # path that the piecewise oracle had misattributed to
        # reduction-order noise (found by the round-4 full-network text
        # oracle, tests/test_full_network_text_oracle.py).
        return nn.LayerNorm(epsilon=1e-5, name="norm3")(x + h)


class SingleHeadSiameseAttention(nn.Module):
    """Single-head attention with a learned dummy background K token.

    reinit_scale mirrors the reference's two construction contexts: the
    Sematic/LV heads re-initialize EVERY Linear inside the module —
    w_q/w_k/w_v, linear1/2/3 AND the FFN — to N(0, 0.02)
    (_init_parameters, attentive_modules.py:181-189, called with the
    attention instance at :248/:376/:572); GeneralizedTextAttRCNN uses the
    module as constructed (rcnn.py:460), i.e. w_q/w_k/w_v ~ N(0,
    sqrt(2/(d+d))) (attentive_modules.py:95-100) and torch-default linears.
    Pass reinit_scale=None for the latter."""

    d_model: int
    reinit_scale: Any = 0.02

    @nn.compact
    def __call__(self, q, k, v, key_mask=None):
        d = self.d_model
        if self.reinit_scale is not None:
            qkv_init = lin_init = nn.initializers.normal(self.reinit_scale)
        else:
            qkv_init = nn.initializers.normal(np.sqrt(2.0 / (d + d)))
            lin_init = torch_linear_init
        dense = lambda name: nn.Dense(
            d, use_bias=False, kernel_init=qkv_init, name=name,
        )
        residual = q
        qp = dense("w_q")(q)
        kp = dense("w_k")(k)
        vp = dense("w_v")(v)

        b = q.shape[0]
        dummy = self.param(
            "dummy", nn.initializers.normal(1.0), (1, d)
        )
        dummy_k = jnp.broadcast_to(dummy[None], (b, 1, d))
        dummy_v = jnp.zeros((b, 1, d), vp.dtype)
        kp = jnp.concatenate([kp, dummy_k], axis=1)
        vp = jnp.concatenate([vp, dummy_v], axis=1)

        if key_mask is not None:  # the dummy bg token is always attendable
            key_mask = jnp.concatenate(
                [key_mask, jnp.ones((b, 1), bool)], axis=1
            )
        out, attn = scaled_dot_product_attention(
            qp, kp, vp, temperature=float(np.sqrt(d)), key_mask=key_mask
        )

        o1 = nn.relu(
            nn.Dense(d // 2, kernel_init=lin_init, name="linear1")(
                out * residual
            )
        )
        o2 = nn.relu(
            nn.Dense(d // 2, kernel_init=lin_init, name="linear2")(
                residual - out
            )
        )
        merged = nn.Dense(
            d, kernel_init=lin_init, name="linear3",
        )(jnp.concatenate([o1, o2, residual], axis=-1))
        return FFN(
            d,
            kernel_init=(
                nn.initializers.normal(self.reinit_scale)
                if self.reinit_scale is not None else None
            ),
            name="ffn",
        )(merged), attn


class SematicProposalAttention(nn.Module):
    """ROI features attend over the (classes + orthogonal-bg) embedding
    bank; returns (attn_scores, {'sim2stext', 'text_feat'})."""

    input_size: int
    class_embed: np.ndarray  # (C, sem_dim) — static bank
    bg_embed: np.ndarray     # (1, sem_dim)

    @nn.compact
    def __call__(self, visual_feat):
        bank = jnp.concatenate(
            [
                jnp.asarray(self.class_embed, jnp.float32),
                jnp.asarray(self.bg_embed, jnp.float32),
            ],
            axis=0,
        )  # (C+1, sem)
        residual_text = bank

        # key/value projections are NOT covered by the reference's
        # _init_parameters re-init (it targets self.attention only,
        # attentive_modules.py:248) — they keep torch's default Linear init
        k = nn.relu(nn.Dense(
            self.input_size, kernel_init=torch_linear_init,
            name="key_projection",
        )(bank))
        v = nn.relu(nn.Dense(
            self.input_size, kernel_init=torch_linear_init,
            name="value_projection",
        )(bank))

        sim2stext, attn = SingleHeadSiameseAttention(
            self.input_size, name="attention"
        )(visual_feat[None], k[None], v[None])
        sim2stext = nn.relu(sim2stext[0])
        return attn, {"sim2stext": sim2stext, "text_feat": residual_text}


class LVAttention(nn.Module):
    """Teacher attention: per-ROI text feature selected by the GT label
    (teacher forcing), V = proj(cat(vis, text)). Ref :297-437."""

    input_size: int
    class_embed: np.ndarray  # (C, text_dim)
    text_dim: int = 300
    vkv: bool = False  # q = v variant (ref :440-487)

    @nn.compact
    def __call__(self, visual_feat, gt_classes, valid=None):
        c, text_dim = self.class_embed.shape
        w_bg = self.param(
            "w_bg", nn.initializers.normal(1.0), (1, text_dim)
        )
        embed = jnp.concatenate(
            [jnp.asarray(self.class_embed, jnp.float32), w_bg], axis=0
        )  # (C+1, text_dim)
        embed = nn.Dense(
            self.input_size, kernel_init=torch_linear_init, name="proj2"
        )(embed)

        label = jnp.clip(gt_classes, 0, c)  # ignore rows -> bg bucket
        text_feat = embed[label]  # (N, input_size)

        value = nn.Dense(
            self.input_size, kernel_init=torch_linear_init, name="proj_k"
        )(
            jnp.concatenate([visual_feat, text_feat], axis=-1)
        )
        # the returned text_feat is the PRE-relu gathered projection (the
        # reference's output dict holds the tensor captured before the
        # non-inplace relu, LV_attention.forward_language_model :386-407)
        text_feat_out = text_feat
        text_feat = nn.relu(text_feat)
        value = nn.relu(value)

        q = value[None] if self.vkv else visual_feat[None]
        # This attention is CROSS-ROI (each query attends over every row's
        # text feature, ref attentive_modules.py:414-427) — PAD rows must
        # not contribute keys/values (found by the full-network text
        # oracle; production slots are always filled, so this only fires
        # when candidates < BATCH_SIZE_PER_IMAGE)
        sim2stext, _ = SingleHeadSiameseAttention(
            self.input_size, name="attention"
        )(q, text_feat[None], value[None],
          key_mask=None if valid is None else valid[None])
        sim2stext = nn.relu(sim2stext[0])
        return {}, {"sim2stext": sim2stext, "text_feat": text_feat_out}


class LVAttentionTextDomination(nn.Module):
    """Attention carried in text space: vis C->300, out 300->C.
    Ref :490-687."""

    input_size: int
    class_embed: np.ndarray
    text_dim: int = 300
    vkv: bool = False

    @nn.compact
    def __call__(self, visual_feat, gt_classes, valid=None):
        c, text_dim = self.class_embed.shape
        vis_t = nn.Dense(
            text_dim, kernel_init=torch_linear_init, name="proj_visual"
        )(visual_feat)

        w_bg = self.param(
            "w_bg", nn.initializers.normal(1.0), (1, text_dim)
        )
        embed = jnp.concatenate(
            [jnp.asarray(self.class_embed, jnp.float32), w_bg], axis=0
        )
        label = jnp.clip(gt_classes, 0, c)
        text_feat = embed[label]  # (N, text_dim)

        value = nn.Dense(
            text_dim, kernel_init=torch_linear_init, name="proj_value"
        )(
            jnp.concatenate([vis_t, text_feat], axis=-1)
        )
        text_feat_out = text_feat  # pre-relu, like the reference dict
        text_feat = nn.relu(text_feat)
        value = nn.relu(value)

        q = value[None] if self.vkv else vis_t[None]
        # cross-ROI attention: mask PAD rows out of K/V (see LVAttention)
        sim2stext, _ = SingleHeadSiameseAttention(
            text_dim, name="attention"
        )(q, text_feat[None], value[None],
          key_mask=None if valid is None else valid[None])
        sim2stext = nn.relu(sim2stext[0])
        sim2stext = nn.Dense(
            self.input_size, kernel_init=torch_linear_init, name="proj2"
        )(sim2stext)
        return {}, {"sim2stext": sim2stext, "text_feat": text_feat_out}


def loss_fn_kd_only(
    student_logits, labels, bg_label, teacher_logits, temperature, alpha=1.0,
    valid=None,
):
    """KL distillation with 1.5x weight on background rows
    (ref my_module.py:408-437)."""
    t = temperature
    logp_s = jax.nn.log_softmax(student_logits / t, axis=1)
    p_t = jax.nn.softmax(teacher_logits / t, axis=1)
    logp_t = jax.nn.log_softmax(teacher_logits / t, axis=1)
    kl = jnp.sum(p_t * (logp_t - logp_s), axis=1)  # (N,)
    kl = jnp.where(labels == bg_label, kl * 1.5, kl)
    if valid is not None:
        kl = jnp.where(valid, kl, 0.0)
        denom = jnp.maximum(jnp.sum(valid), 1)
    else:
        denom = labels.shape[0]
    return jnp.sum(kl) / denom * t * t * alpha
