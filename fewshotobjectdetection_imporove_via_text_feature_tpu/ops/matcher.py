"""Proposal/anchor <-> ground-truth matcher — vectorized, padding-aware.

Re-implements detectron2's ``Matcher`` semantics (the reference constructs it
at defrcn/modeling/roi_heads/roi_heads.py:107-111 with thresholds [0.5],
labels [0, 1], allow_low_quality_matches=False; and the vendored RPN spec
rpn.py:243-245 with thresholds [0.3, 0.7], labels [0, -1, 1],
allow_low_quality_matches=True) for fixed-shape padded GT:

  * GT rows are padded to MAX_GT; ``gt_valid`` masks the real ones.
  * Invalid GT rows are treated as IoU = -1 so they can never win an argmax
    nor produce low-quality matches.
  * Zero valid GT reproduces detectron2's empty-GT behavior: matches = 0,
    labels = labels[0] everywhere (all-negative).
"""

from __future__ import annotations

import jax.numpy as jnp


def match_proposals(
    iou: jnp.ndarray,
    gt_valid: jnp.ndarray,
    thresholds,
    labels,
    allow_low_quality_matches: bool = False,
):
    """Match each of N candidates to one of M (padded) ground-truth boxes.

    Args:
        iou: (M, N) quality matrix (rows = GT, columns = candidates).
        gt_valid: (M,) bool mask of real GT rows.
        thresholds: increasing list, e.g. [0.3, 0.7].
        labels: list of len(thresholds)+1 values in {-1, 0, 1}; label[i] is
            assigned to candidates whose max-quality falls in
            [thresholds[i-1], thresholds[i]).
        allow_low_quality_matches: also mark, for each valid GT, the
            candidates tying its best IoU as positive (RPN behavior).

    Returns:
        matched_idx: (N,) int32 — best GT row per candidate (0 if no valid GT).
        match_labels: (N,) int32 in {-1, 0, 1}.
    """
    neg_inf = jnp.asarray(-1.0, iou.dtype)
    masked = jnp.where(gt_valid[:, None], iou, neg_inf)  # (M, N)

    matched_vals = jnp.max(masked, axis=0)  # (N,)
    matched_idx = jnp.argmax(masked, axis=0).astype(jnp.int32)  # (N,)

    # With zero valid GT all matched_vals are -1; treat as quality 0 so the
    # first interval (-inf, t0) -> labels[0] applies, like detectron2's
    # set_low_quality... empty path (matches=0, labels=0).
    any_valid = jnp.any(gt_valid)
    matched_vals = jnp.where(any_valid, matched_vals, 0.0)
    matched_idx = jnp.where(any_valid, matched_idx, 0)

    match_labels = jnp.full(matched_vals.shape, labels[0], dtype=jnp.int32)
    lows = list(thresholds)
    highs = list(thresholds[1:]) + [float("inf")]
    for lab, lo, hi in zip(labels[1:], lows, highs):
        in_interval = (matched_vals >= lo) & (matched_vals < hi)
        match_labels = jnp.where(in_interval, jnp.int32(lab), match_labels)

    if allow_low_quality_matches:
        # For each valid GT, its best-quality candidates (ties included)
        # become positive, regardless of threshold (detectron2
        # set_low_quality_matches_). Only applies where quality > 0.
        highest_per_gt = jnp.max(
            jnp.where(gt_valid[:, None], iou, neg_inf), axis=1, keepdims=True
        )  # (M, 1)
        is_best = (iou >= highest_per_gt) & (highest_per_gt > 0) & gt_valid[:, None]
        low_quality = jnp.any(is_best, axis=0)  # (N,)
        match_labels = jnp.where(low_quality, jnp.int32(1), match_labels)

    return matched_idx, match_labels
