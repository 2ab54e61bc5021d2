"""Numeric parity vs the reference's saved debug tensors.

The reference repo ships real training artifacts (pred_logits.pt,
gt_classes.pt — used by its test.py:80-92 CE sanity check). We verify our
loss math reproduces torch's on those exact tensors."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = "/root/reference"

torch = pytest.importorskip("torch")

needs_fixtures = pytest.mark.skipif(
    not os.path.exists(os.path.join(REF, "pred_logits.pt")),
    reason="reference fixtures not available",
)


@needs_fixtures
def test_cross_entropy_matches_torch_on_reference_tensors():
    logits = torch.load(
        os.path.join(REF, "pred_logits.pt"), map_location="cpu",
        weights_only=False,
    ).detach().float()
    gt = torch.load(
        os.path.join(REF, "gt_classes.pt"), map_location="cpu",
        weights_only=False,
    ).detach().long()

    ref = torch.nn.functional.cross_entropy(logits, gt, reduction="mean")

    # our implementation (fast_rcnn_losses classification term)
    jlogits = jnp.asarray(logits.numpy())
    jgt = jnp.asarray(gt.numpy())
    logp = jax.nn.log_softmax(jlogits, axis=-1)
    ce = -jnp.take_along_axis(logp, jgt[:, None], axis=1)[:, 0]
    ours = float(ce.mean())

    np.testing.assert_allclose(ours, float(ref), rtol=1e-5)


@needs_fixtures
def test_kd_loss_matches_torch_formula_on_reference_tensors():
    from fewshotobjectdetection_imporove_via_text_feature_tpu.models.attention import (
        loss_fn_kd_only,
    )

    logits = torch.load(
        os.path.join(REF, "pred_logits.pt"), map_location="cpu",
        weights_only=False,
    ).detach().float()
    gt = torch.load(
        os.path.join(REF, "gt_classes.pt"), map_location="cpu",
        weights_only=False,
    ).detach().long()
    teacher = logits.roll(1, dims=0)  # synthetic teacher from real logits

    T = 5.0
    bg = logits.shape[1] - 1
    kd = torch.nn.functional.kl_div(
        torch.log_softmax(logits / T, dim=1),
        torch.softmax(teacher / T, dim=1),
        reduction="none",
    ).sum(1)
    kd = torch.where(gt == bg, kd * 1.5, kd)
    ref = float(kd.sum() / gt.shape[0] * T * T)

    ours = float(
        loss_fn_kd_only(
            jnp.asarray(logits.numpy()),
            jnp.asarray(gt.numpy()),
            bg,
            jnp.asarray(teacher.numpy()),
            temperature=T,
        )
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-4)
