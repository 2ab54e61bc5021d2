"""Fixed-shape random fg/bg subsampling — jit-safe, no dynamic shapes.

Re-implements detectron2 ``subsample_labels`` (used by the reference at
defrcn/modeling/roi_heads/roi_heads.py:147 and the vendored RPN spec
rpn.py:258) the TPU way: instead of gathering a variable number of indices,
we rank candidates by random priority with ``lax.top_k`` (static k) and mask.

Semantics matched:
  * num_pos = min(#positives, int(batch_size * positive_fraction))
  * num_neg = min(#negatives, batch_size - num_pos)
  * uniform random choice without replacement within each group.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _ranked_take(key, eligible: jnp.ndarray, k: int):
    """Random-permutation top-k over eligible slots.

    Returns (idx, valid): idx (k,) int32 indices into the input vector chosen
    uniformly at random among ``eligible`` (without replacement); valid (k,)
    marks slots actually backed by an eligible element.
    """
    n = eligible.shape[0]
    k = min(k, n)
    priority = jax.random.uniform(key, (n,))
    priority = jnp.where(eligible, priority, -1.0)
    vals, idx = jax.lax.top_k(priority, k)
    return idx.astype(jnp.int32), vals >= 0.0


def subsample_labels(
    key,
    labels: jnp.ndarray,
    batch_size_per_image: int,
    positive_fraction: float,
    bg_label: int,
):
    """RPN-style in-place label subsampling.

    Args:
        labels: (N,) int32 in {-1, 0, 1} (or {class ids, bg_label, -1}); here
            the RPN convention: 1 = pos, 0 = neg, -1 = ignore. ``bg_label``
            selects which value counts as negative (0 for RPN).

    Returns:
        (N,) labels where everything not sampled is -1, sampled positives
        keep 1 and sampled negatives keep 0 (ref rpn.py:255-265).
    """
    kp, kn = jax.random.split(key)
    pos_mask = labels == 1
    neg_mask = labels == bg_label

    max_pos = int(batch_size_per_image * positive_fraction)
    num_pos = jnp.minimum(jnp.sum(pos_mask), max_pos)
    num_neg = jnp.minimum(jnp.sum(neg_mask), batch_size_per_image - num_pos)

    pos_idx, pos_ok = _ranked_take(kp, pos_mask, max_pos)
    neg_idx, neg_ok = _ranked_take(kn, neg_mask, batch_size_per_image)

    n = labels.shape[0]
    pos_keep = pos_ok & (jnp.arange(pos_idx.shape[0]) < num_pos)
    neg_keep = neg_ok & (jnp.arange(neg_idx.shape[0]) < num_neg)

    out = jnp.full((n,), -1, dtype=jnp.int32)
    out = out.at[pos_idx].set(jnp.where(pos_keep, 1, out[pos_idx]))
    out = out.at[neg_idx].set(jnp.where(neg_keep, 0, out[neg_idx]))
    return out


def sample_proposals_fixed(
    key,
    gt_classes: jnp.ndarray,
    batch_size_per_image: int,
    positive_fraction: float,
    num_classes: int,
):
    """ROI-heads proposal sampling with a fixed output size.

    Args:
        gt_classes: (N,) per-proposal class label in [0, num_classes] where
            num_classes = background, or -1 = ignore (matcher label -1) /
            padded slot.

    Returns:
        sampled_idx: (batch_size_per_image,) int32 indices into [0, N).
        sampled_valid: same shape bool — False for unfilled slots (only when
            fewer than batch_size eligible candidates exist; losses must mask).

    Ref semantics: defrcn/modeling/roi_heads/roi_heads.py:118-155 — sample
    min(#fg, 25% * 512) foreground then fill the rest with background.
    """
    kp, kn = jax.random.split(key)
    fg_mask = (gt_classes >= 0) & (gt_classes != num_classes)
    bg_mask = gt_classes == num_classes

    max_pos = int(batch_size_per_image * positive_fraction)
    num_fg = jnp.minimum(jnp.sum(fg_mask), max_pos)
    num_bg = jnp.minimum(jnp.sum(bg_mask), batch_size_per_image - num_fg)

    fg_idx, fg_ok = _ranked_take(kp, fg_mask, max_pos)
    bg_idx, bg_ok = _ranked_take(kn, bg_mask, batch_size_per_image)

    slot = jnp.arange(batch_size_per_image)
    # Slot i takes fg_idx[i] while i < num_fg, else bg_idx[i - num_fg].
    take_fg = slot < num_fg
    bg_slot = jnp.clip(slot - num_fg, 0, bg_idx.shape[0] - 1)
    fg_slot = jnp.clip(slot, 0, fg_idx.shape[0] - 1)
    sampled_idx = jnp.where(take_fg, fg_idx[fg_slot], bg_idx[bg_slot])
    sampled_valid = jnp.where(
        take_fg,
        fg_ok[fg_slot],
        bg_ok[bg_slot] & (bg_slot < num_bg),
    )
    return sampled_idx, sampled_valid
