"""Strided-bin elision: pooling only the even bins + res5 at stride 1 must
be numerically identical to full 7x7 pooling + res5 at stride 2.

Why this holds: with STRIDE_IN_1X1 (Caffe/MSRA placement, the reference's
detectron2 default), res5 block0 applies its stride-2 on the 1x1 conv1 and
the 1x1 shortcut — both read only pooled positions (0,2,4,6)x(0,2,4,6) of
the 7x7 map (conv2 operates downstream of conv1). The odd positions are
dead values; eliding them from the ROIAlign interpolation matmuls removes
~43% of the pooled path's HBM traffic (its bottleneck) without changing a
single output bit.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fewshotobjectdetection_imporove_via_text_feature_tpu.models.roi_heads import (
    Res5ROIHeads,
)
from fewshotobjectdetection_imporove_via_text_feature_tpu.ops.roi_align import (
    roi_align,
)
from fewshotobjectdetection_imporove_via_text_feature_tpu.ops.roi_align_mxu import (
    roi_align_mxu,
)


def _boxes(n, h, w, seed=0):
    rng = np.random.RandomState(seed)
    b = rng.uniform(0, [w * 16 * 0.7, h * 16 * 0.7, 0, 0], (n, 4))
    b[:, 2] = b[:, 0] + rng.uniform(8, w * 16 * 0.3, n)
    b[:, 3] = b[:, 1] + rng.uniform(8, h * 16 * 0.3, n)
    return jnp.asarray(b, jnp.float32)


@pytest.mark.parametrize("sampling", [2, 0])
@pytest.mark.parametrize("op", [roi_align, roi_align_mxu])
def test_bin_stride_selects_even_bins(op, sampling):
    rng = np.random.RandomState(1)
    feat = jnp.asarray(rng.randn(12, 17, 8), jnp.float32)
    boxes = _boxes(9, 12, 17)
    full = op(feat, boxes, 7, 1 / 16.0, sampling)
    if op is roi_align_mxu:
        sub = op(feat, boxes, 7, 1 / 16.0, sampling, 0, 2)
    else:
        sub = op(feat, boxes, 7, 1 / 16.0, sampling, 2)
    np.testing.assert_allclose(
        np.asarray(sub), np.asarray(full)[:, ::2, ::2], rtol=0, atol=1e-5
    )


def test_res5_head_elision_is_exact():
    kw = dict(
        num_classes=5, res2_out_channels=16, width_per_group=4,
        res5_blocks=2, roi_chunk=0,
    )
    head_full = Res5ROIHeads(elide_strided_bins=False, **kw)
    head_elide = Res5ROIHeads(elide_strided_bins=True, **kw)

    rng = np.random.RandomState(2)
    features = jnp.asarray(rng.randn(2, 10, 14, 64), jnp.float32)
    boxes = jnp.stack([_boxes(6, 10, 14, 3), _boxes(6, 10, 14, 4)])

    params = head_full.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        features, boxes,
    )["params"]
    # identical parameter trees: elision changes strides, never params
    s_full, d_full, _ = head_full.apply({"params": params}, features, boxes)
    s_el, d_el, _ = head_elide.apply({"params": params}, features, boxes)
    np.testing.assert_allclose(np.asarray(s_el), np.asarray(s_full), atol=1e-5)
    np.testing.assert_allclose(np.asarray(d_el), np.asarray(d_full), atol=1e-5)

    # gradients are identical too (dead bins carry zero gradient)
    def loss(p, head):
        s, d, _ = head.apply({"params": p}, features, boxes)
        return jnp.sum(s**2) + jnp.sum(d**2)

    from jax.flatten_util import ravel_pytree

    g_full = jax.grad(loss)(params, head_full)
    g_el = jax.grad(loss)(params, head_elide)
    flat_f, _ = ravel_pytree(g_full)
    flat_e, _ = ravel_pytree(g_el)
    np.testing.assert_allclose(
        np.asarray(flat_e), np.asarray(flat_f), atol=2e-4
    )


def test_no_elision_when_stride_on_3x3():
    # stride_in_1x1=False puts the stride on conv2 (3x3) which reads every
    # pooled position — elision must disable itself.
    head = Res5ROIHeads(
        num_classes=5, res2_out_channels=16, width_per_group=4,
        res5_blocks=2, roi_chunk=0, stride_in_1x1=False,
    )
    assert not head._elide()
