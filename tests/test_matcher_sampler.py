"""Matcher + sampler semantics vs an independent numpy re-implementation of
the detectron2 Matcher / subsample_labels contracts."""

import numpy as np
import jax
import jax.numpy as jnp

from fewshotobjectdetection_imporove_via_text_feature_tpu.ops import (
    match_proposals,
    subsample_labels,
    sample_proposals_fixed,
)


def np_matcher(iou, thresholds, labels, allow_low_quality):
    m, n = iou.shape
    if m == 0:
        return np.zeros(n, np.int32), np.full(n, labels[0], np.int32)
    matched_vals = iou.max(axis=0)
    matched_idx = iou.argmax(axis=0)
    out = np.full(n, labels[0], np.int32)
    edges = [-np.inf] + list(thresholds) + [np.inf]
    for lab, lo, hi in zip(labels, edges[:-1], edges[1:]):
        out[(matched_vals >= lo) & (matched_vals < hi)] = lab
    if allow_low_quality:
        highest = iou.max(axis=1)
        for g in range(m):
            if highest[g] > 0:
                out[iou[g] == highest[g]] = 1
    return matched_idx.astype(np.int32), out


def _pad_gt(iou, max_gt):
    m, n = iou.shape
    padded = np.zeros((max_gt, n), np.float32)
    padded[:m] = iou
    valid = np.zeros(max_gt, bool)
    valid[:m] = True
    return padded, valid


def test_matcher_roi_semantics():
    rng = np.random.RandomState(0)
    iou = rng.uniform(0, 1, (5, 60)).astype(np.float32)
    padded, valid = _pad_gt(iou, 8)
    idx, lab = match_proposals(
        jnp.array(padded), jnp.array(valid), [0.5], [0, 1], False
    )
    ref_idx, ref_lab = np_matcher(iou, [0.5], [0, 1], False)
    np.testing.assert_array_equal(np.asarray(lab), ref_lab)
    np.testing.assert_array_equal(np.asarray(idx), ref_idx)


def test_matcher_rpn_semantics_low_quality():
    rng = np.random.RandomState(1)
    iou = rng.uniform(0, 0.65, (4, 80)).astype(np.float32)  # nothing >= 0.7
    padded, valid = _pad_gt(iou, 8)
    idx, lab = match_proposals(
        jnp.array(padded), jnp.array(valid), [0.3, 0.7], [0, -1, 1], True
    )
    ref_idx, ref_lab = np_matcher(iou, [0.3, 0.7], [0, -1, 1], True)
    np.testing.assert_array_equal(np.asarray(lab), ref_lab)
    # every GT row's best candidate is positive
    assert all(ref_lab[iou[g].argmax()] == 1 for g in range(4))


def test_matcher_low_quality_requires_positive_iou():
    """Documented deviation (PARITY #5): a GT with ZERO overlap against
    every candidate must NOT promote anchors to foreground (detectron2's
    set_low_quality_matches_ has no > 0 guard and would mark ALL anchors
    fg for such a GT via the tie). A GT with tiny-but-positive best IoU
    below the thresholds IS promoted (the low-quality rescue)."""
    iou = np.zeros((2, 6), np.float32)
    iou[0, 3] = 0.05  # below all thresholds, but > 0 -> rescued
    # GT row 1 overlaps nothing -> rescues nobody
    padded, valid = _pad_gt(iou, 4)
    idx, lab = match_proposals(
        jnp.array(padded), jnp.array(valid), [0.3, 0.7], [0, -1, 1], True
    )
    lab = np.asarray(lab)
    assert lab[3] == 1  # low-quality rescue for GT 0
    assert (lab[[0, 1, 2, 4, 5]] == 0).all()  # zero-IoU GT promotes none
    # the numpy mirror agrees (it carries the same documented guard)
    ref_idx, ref_lab = np_matcher(iou, [0.3, 0.7], [0, -1, 1], True)
    np.testing.assert_array_equal(lab, ref_lab)


def test_matcher_empty_gt():
    padded = np.zeros((8, 30), np.float32)
    valid = np.zeros(8, bool)
    idx, lab = match_proposals(
        jnp.array(padded), jnp.array(valid), [0.5], [0, 1], False
    )
    assert (np.asarray(lab) == 0).all()
    assert (np.asarray(idx) == 0).all()


def test_subsample_labels_rpn_counts():
    rng = np.random.RandomState(2)
    labels = jnp.array(rng.choice([-1, 0, 1], size=2000, p=[0.3, 0.65, 0.05]))
    out = np.asarray(
        subsample_labels(jax.random.PRNGKey(0), labels, 256, 0.5, 0)
    )
    num_pos = int((out == 1).sum())
    num_neg = int((out == 0).sum())
    orig_pos = int((np.asarray(labels) == 1).sum())
    assert num_pos == min(orig_pos, 128)
    assert num_pos + num_neg == 256
    # sampled entries must have been eligible
    assert ((np.asarray(labels) == 1) | (out != 1)).all()
    assert ((np.asarray(labels) == 0) | (out != 0)).all()


def test_subsample_labels_few_candidates():
    labels = jnp.array([1, 1, 0, -1, -1])
    out = np.asarray(
        subsample_labels(jax.random.PRNGKey(1), labels, 256, 0.5, 0)
    )
    assert (out == 1).sum() == 2
    assert (out == 0).sum() == 1


def test_sample_proposals_fixed():
    rng = np.random.RandomState(3)
    # 2000 proposals: mostly bg (=20), some fg classes, some ignore (-1)
    gt_classes = rng.choice(
        [-1, 3, 7, 20], size=2000, p=[0.02, 0.04, 0.04, 0.9]
    ).astype(np.int32)
    idx, valid = sample_proposals_fixed(
        jax.random.PRNGKey(0), jnp.array(gt_classes), 512, 0.25, 20
    )
    idx, valid = np.asarray(idx), np.asarray(valid)
    assert idx.shape == (512,)
    assert valid.all()  # plenty of candidates
    sampled = gt_classes[idx]
    n_fg = int(((sampled >= 0) & (sampled != 20)).sum())
    total_fg = int(((gt_classes >= 0) & (gt_classes != 20)).sum())
    assert n_fg == min(total_fg, 128)
    assert (sampled != -1).all()  # ignores never sampled
    # no duplicate index among valid slots (sampling w/o replacement)
    assert len(np.unique(idx)) == 512


def test_sample_proposals_scarce_bg():
    gt_classes = jnp.array([0, 1, 20, 20, -1] * 2, dtype=jnp.int32)
    idx, valid = sample_proposals_fixed(
        jax.random.PRNGKey(4), gt_classes, 512, 0.25, 20
    )
    idx, valid = np.asarray(idx), np.asarray(valid)
    # 4 fg + 4 bg eligible -> 8 valid slots
    assert valid.sum() == 8
    assert (np.asarray(gt_classes)[idx[valid]] != -1).all()


def test_label_and_sample_append_gt_knob():
    """append_gt=False (cfg.MODEL.ROI_HEADS.PROPOSAL_APPEND_GT) must
    actually change sampling: with a GT-free proposal set and IoU-poor
    proposals, append_gt=True yields fg samples (the appended GT matches
    itself), append_gt=False yields none."""
    import jax
    import jax.numpy as jnp

    from fewshotobjectdetection_imporove_via_text_feature_tpu.models.roi_heads import (
        label_and_sample_proposals,
    )
    from fewshotobjectdetection_imporove_via_text_feature_tpu.structures import (
        GTInstances,
        Proposals,
    )

    props = Proposals(
        boxes=jnp.asarray([[200.0, 200, 240, 240], [300.0, 300, 350, 350]]),
        objectness=jnp.zeros((2,)),
        valid=jnp.ones((2,), bool),
    )
    gt = GTInstances(
        boxes=jnp.asarray([[10.0, 10, 50, 50]]),
        classes=jnp.asarray([3], jnp.int32),
        valid=jnp.ones((1,), bool),
    )
    key = jax.random.PRNGKey(0)
    with_gt = label_and_sample_proposals(
        key, props, gt, batch_size_per_image=4, num_classes=15,
        append_gt=True,
    )
    without = label_and_sample_proposals(
        key, props, gt, batch_size_per_image=4, num_classes=15,
        append_gt=False,
    )
    fg_with = int(((with_gt["gt_classes"] == 3) & with_gt["valid"]).sum())
    fg_without = int(((without["gt_classes"] == 3) & without["valid"]).sum())
    assert fg_with >= 1
    assert fg_without == 0
