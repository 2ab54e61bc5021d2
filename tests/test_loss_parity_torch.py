"""fast_rcnn_losses vs a torch mirror of the reference FastRCNNOutputs
(fast_rcnn.py:222-304): softmax CE (mean over all sampled) + smooth-L1 on
fg rows' class-specific delta columns, normalized by total sampled."""

import numpy as np
import pytest
import jax.numpy as jnp

from fewshotobjectdetection_imporove_via_text_feature_tpu.models.fast_rcnn import (
    fast_rcnn_losses,
)
from fewshotobjectdetection_imporove_via_text_feature_tpu.models.rpn import (
    rpn_losses,
)
from fewshotobjectdetection_imporove_via_text_feature_tpu.ops import (
    encode_deltas,
)

torch = pytest.importorskip("torch")


def torch_fast_rcnn_losses(logits, deltas, prop, gtb, gtc, K, weights):
    """Reference formulas in torch."""
    import torch.nn.functional as F

    logits_t = torch.tensor(logits)
    gtc_t = torch.tensor(gtc.astype(np.int64))
    loss_cls = F.cross_entropy(logits_t, gtc_t, reduction="mean")

    gt_deltas = np.asarray(
        encode_deltas(jnp.asarray(prop), jnp.asarray(gtb), weights)
    )
    fg = np.nonzero((gtc >= 0) & (gtc < K))[0]
    cols = 4 * gtc[fg][:, None] + np.arange(4)[None]
    pred_fg = torch.tensor(deltas[fg[:, None], cols])
    tgt_fg = torch.tensor(gt_deltas[fg])
    # beta = 0 -> pure L1, sum reduction
    loss_box = torch.abs(pred_fg - tgt_fg).sum() / len(gtc)
    return float(loss_cls), float(loss_box)


def test_fast_rcnn_losses_match_torch():
    rng = np.random.RandomState(0)
    R, K = 64, 7
    logits = rng.randn(R, K + 1).astype(np.float32)
    deltas = rng.randn(R, K * 4).astype(np.float32) * 0.3
    prop = rng.uniform(0, 200, (R, 4)).astype(np.float32)
    prop[:, 2:] += prop[:, :2] + 5
    gtb = prop + rng.uniform(-3, 3, (R, 4)).astype(np.float32)
    gtc = rng.randint(0, K + 1, R).astype(np.int32)  # K = bg

    weights = (10.0, 10.0, 5.0, 5.0)
    ref_cls, ref_box = torch_fast_rcnn_losses(
        logits, deltas, prop, gtb, gtc, K, weights
    )
    got = fast_rcnn_losses(
        jnp.asarray(logits), jnp.asarray(deltas), jnp.asarray(prop),
        jnp.asarray(gtb), jnp.asarray(gtc), jnp.ones(R, bool),
        num_classes=K, box_reg_weights=weights, smooth_l1_beta=0.0,
    )
    np.testing.assert_allclose(float(got["loss_cls"]), ref_cls, rtol=1e-5)
    np.testing.assert_allclose(float(got["loss_box_reg"]), ref_box, rtol=1e-5)


def test_rpn_losses_match_torch():
    """RPN objectness BCE (sum over sampled / B*256) + L1 on positives."""
    import torch.nn.functional as F

    rng = np.random.RandomState(1)
    B, N = 2, 500
    logits = rng.randn(B, N).astype(np.float32)
    deltas = rng.randn(B, N, 4).astype(np.float32) * 0.2
    anchors = rng.uniform(0, 300, (N, 4)).astype(np.float32)
    anchors[:, 2:] += anchors[:, :2] + 4
    matched = anchors[None] + rng.uniform(-2, 2, (B, N, 4)).astype(np.float32)
    labels = rng.choice([-1, 0, 1], (B, N), p=[0.5, 0.4, 0.1]).astype(np.int32)

    got = rpn_losses(
        jnp.asarray(logits), jnp.asarray(deltas), jnp.asarray(anchors),
        jnp.asarray(labels), jnp.asarray(matched),
        batch_size_per_image=256, smooth_l1_beta=0.0,
    )

    norm = B * 256
    valid = labels >= 0
    ref_cls = float(
        F.binary_cross_entropy_with_logits(
            torch.tensor(logits[valid]),
            torch.tensor((labels[valid] == 1).astype(np.float32)),
            reduction="sum",
        )
    ) / norm
    gt_d = np.asarray(
        encode_deltas(jnp.asarray(anchors)[None], jnp.asarray(matched))
    )
    pos = labels == 1
    ref_loc = float(np.abs(deltas[pos] - gt_d[pos]).sum()) / norm
    np.testing.assert_allclose(float(got["loss_rpn_cls"]), ref_cls, rtol=1e-5)
    np.testing.assert_allclose(float(got["loss_rpn_loc"]), ref_loc, rtol=1e-4)
