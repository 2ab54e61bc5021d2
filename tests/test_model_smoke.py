"""End-to-end tiny-model smoke tests: init, train losses, grads, inference."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fewshotobjectdetection_imporove_via_text_feature_tpu.models import (
    GeneralizedRCNN,
)
from fewshotobjectdetection_imporove_via_text_feature_tpu.structures import (
    GTInstances,
    ImageBatch,
)


def tiny_model(**kw):
    defaults = dict(
        num_classes=5,
        depth=14,
        stem_out_channels=8,
        res2_out_channels=16,
        width_per_group=4,
        freeze_at=0,
        rpn_pre_nms_topk=(256, 256),
        rpn_post_nms_topk=(64, 64),
        roi_batch_per_image=16,
        test_candidate_topk=128,
        test_topk_per_image=20,
    )
    defaults.update(kw)
    return GeneralizedRCNN(**defaults)


def tiny_batch(b=2, h=128, w=160, g=4):
    rng = np.random.RandomState(0)
    images = ImageBatch(
        image=jnp.asarray(rng.uniform(0, 255, (b, h, w, 3)), jnp.float32),
        hw=jnp.asarray([[h, w]] * b, jnp.int32),
        orig_hw=jnp.asarray([[2 * h, 2 * w]] * b, jnp.int32),
    )
    boxes = []
    for _ in range(b):
        xy = rng.uniform(0, w // 2, (g, 2))
        wh = rng.uniform(16, 64, (g, 2))
        boxes.append(np.concatenate([xy, xy + wh], axis=1))
    gt = GTInstances(
        boxes=jnp.asarray(np.stack(boxes), jnp.float32),
        classes=jnp.asarray(rng.randint(0, 5, (b, g)), jnp.int32),
        valid=jnp.asarray([[True, True, True, False]] * b),
    )
    return images, gt


import functools


@pytest.fixture(scope="module")
def model_and_params():
    model = tiny_model()
    images, gt = tiny_batch()
    params = jax.jit(functools.partial(model.init, train=True))(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        images,
        gt,
    )
    return model, params


def test_train_losses_finite(model_and_params):
    model, params = model_and_params
    images, gt = tiny_batch()
    losses = jax.jit(functools.partial(model.apply, train=True))(
        params, images, gt, rngs={"sampling": jax.random.PRNGKey(2)}
    )
    loss_keys = {k for k in losses if not k.startswith("metric/")}
    assert loss_keys == {
        "loss_rpn_cls",
        "loss_rpn_loc",
        "loss_cls",
        "loss_box_reg",
    }
    # EventStorage-style diagnostics ride along under metric/ (stop-grad)
    assert {
        "metric/cls_accuracy",
        "metric/fg_cls_accuracy",
        "metric/false_negative",
        "metric/roi_num_fg_samples",
        "metric/roi_num_bg_samples",
        "metric/rpn_num_pos_anchors",
        "metric/rpn_num_neg_anchors",
    } <= set(losses)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    assert float(losses["loss_cls"]) > 0
    assert 0.0 <= float(losses["metric/cls_accuracy"]) <= 1.0
    assert float(losses["metric/rpn_num_pos_anchors"]) > 0


def test_grads_flow_and_gdl_blocks_rpn(model_and_params):
    model, params = model_and_params
    images, gt = tiny_batch()

    def loss_fn(p):
        losses = model.apply(
            p, images, gt, train=True,
            rngs={"sampling": jax.random.PRNGKey(3)},
        )
        return sum(losses.values())

    grads = jax.jit(jax.grad(loss_fn))(params)
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    gsum = sum(float(jnp.abs(g).sum()) for g in flat)
    assert gsum > 0


def test_inference_shapes(model_and_params):
    model, params = model_and_params
    images, gt = tiny_batch()
    det = jax.jit(functools.partial(model.apply, train=False))(params, images)
    assert det.boxes.shape == (2, 20, 4)
    assert det.scores.shape == (2, 20)
    assert det.classes.shape == (2, 20)
    # boxes are in the ORIGINAL frame (2x the network frame here)
    assert np.asarray(det.boxes).max() <= 2 * 160 + 1e-3
    assert np.isfinite(np.asarray(det.scores)).all()


def test_rpn_stop_gradient_lambda_zero():
    """With rpn_backward_scale=0 the backbone gets no gradient from RPN
    losses (GDL cuts it); affine_rpn still learns."""
    model = tiny_model(
        rpn_enable_decouple=True, rpn_backward_scale=0.0,
        roi_enable_decouple=True, roi_backward_scale=0.0,
    )
    images, gt = tiny_batch()
    params = jax.jit(functools.partial(model.init, train=True))(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        images, gt,
    )

    def loss_fn(p):
        losses = model.apply(
            p, images, gt, train=True,
            rngs={"sampling": jax.random.PRNGKey(2)},
        )
        return losses["loss_rpn_cls"] + losses["loss_rpn_loc"] + losses["loss_cls"]

    grads = jax.jit(jax.grad(loss_fn))(params)["params"]
    backbone_grad = sum(
        float(jnp.abs(g).sum())
        for g in jax.tree_util.tree_leaves(grads["backbone"])
    )
    rpn_grad = sum(
        float(jnp.abs(g).sum())
        for g in jax.tree_util.tree_leaves(grads["rpn_head"])
    )
    assert backbone_grad == 0.0  # both branches decoupled at lambda=0
    assert rpn_grad > 0.0
    # the GDL affines sit ABOVE the stop-gradient (decouple THEN affine,
    # ref rcnn.py:89-98): they must keep full gradients even at lambda=0
    for aff in ("affine_rpn", "affine_rcnn"):
        g = sum(
            float(jnp.abs(x).sum())
            for x in jax.tree_util.tree_leaves(grads[aff])
        )
        assert g > 0.0, aff


def test_remat_backbone_matches():
    """remat=True must not change forward losses (only backward memory)."""
    model_a = tiny_model()
    model_b = tiny_model(remat_backbone=True)
    images, gt = tiny_batch()
    rngs = {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)}
    pa = jax.jit(functools.partial(model_a.init, train=True))(rngs, images, gt)
    pb = jax.jit(functools.partial(model_b.init, train=True))(rngs, images, gt)
    la = jax.jit(functools.partial(model_a.apply, train=True))(
        pa, images, gt, rngs={"sampling": jax.random.PRNGKey(2)}
    )
    lb = jax.jit(functools.partial(model_b.apply, train=True))(
        pb, images, gt, rngs={"sampling": jax.random.PRNGKey(2)}
    )
    for k in la:
        np.testing.assert_allclose(float(la[k]), float(lb[k]), rtol=1e-5)


def test_space_to_depth_stem_equals_7x7_conv():
    """The MXU-friendly space-to-depth stem must match the plain 7x7/2 conv
    bit-for-bit up to f32 rounding (same param layout -> weight import
    unaffected)."""
    import numpy as np
    import jax.numpy as jnp

    from fewshotobjectdetection_imporove_via_text_feature_tpu.models.backbone import (
        _SpaceToDepthStem,
        _conv,
    )

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 64, 96, 3), jnp.float32)
    k = jnp.asarray(rng.randn(7, 7, 3, 32), jnp.float32) * 0.05
    ref = _conv(32, 7, 2, name="stem_conv1").apply({"params": {"kernel": k}}, x)
    new = _SpaceToDepthStem(32).apply({"params": {"kernel": k}}, x)
    assert ref.shape == new.shape
    np.testing.assert_allclose(
        np.asarray(ref), np.asarray(new), rtol=1e-5, atol=1e-5
    )
