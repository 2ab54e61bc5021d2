"""Text/semantic branch smoke tests: each ROI-head variant and meta-arch
variant produces finite losses and flowing gradients on a tiny model."""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fewshotobjectdetection_imporove_via_text_feature_tpu.models import (
    GeneralizedRCNN,
)
from fewshotobjectdetection_imporove_via_text_feature_tpu.models.text_heads import (
    GeneralizedDistillatedRCNN,
    GeneralizedSemanticRCNN,
    GeneralizedTextAttRCNN,
    GeneralizedTextRCNN,
    paint_semantic_map,
)
from fewshotobjectdetection_imporove_via_text_feature_tpu.models.attention import (
    SingleHeadSiameseAttention,
    loss_fn_kd_only,
)
from fewshotobjectdetection_imporove_via_text_feature_tpu.structures import (
    GTInstances,
)
from tests.test_model_smoke import tiny_batch

NUM_CLASSES = 5
SEM_DIM = 16


def bank():
    rng = np.random.RandomState(0)
    b = rng.randn(NUM_CLASSES, SEM_DIM).astype(np.float32)
    return b / np.linalg.norm(b, axis=1, keepdims=True)


def bg():
    return np.ones((1, SEM_DIM), np.float32) / np.sqrt(SEM_DIM)


TINY = dict(
    num_classes=NUM_CLASSES,
    depth=14,
    stem_out_channels=8,
    res2_out_channels=16,
    width_per_group=4,
    freeze_at=0,
    rpn_pre_nms_topk=(128, 128),
    rpn_post_nms_topk=(32, 32),
    roi_batch_per_image=8,
    test_candidate_topk=64,
    test_topk_per_image=10,
)


def run_train(model):
    images, gt = tiny_batch()
    rngs = {
        "params": jax.random.PRNGKey(0),
        "sampling": jax.random.PRNGKey(1),
        "dropout": jax.random.PRNGKey(2),
    }
    params = jax.jit(functools.partial(model.init, train=True))(
        rngs, images, gt
    )
    losses = jax.jit(functools.partial(model.apply, train=True))(
        params, images, gt,
        rngs={"sampling": jax.random.PRNGKey(3), "dropout": jax.random.PRNGKey(4)},
    )
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))
    return model, params, losses


@pytest.mark.parametrize(
    "head",
    [
        "SematicRes5ROIHeads",
        "SematicRes5ROIHeadsCrossOutput",
        "TextRes5ROIHeads",
        "TextRes5ROIHeads_VKV",
        "TextRes5ROIHeads_textDomination",
        "TextRes5ROIHeads_textDomination_VKV",
    ],
)
def test_text_roi_heads_train_and_infer(head):
    model = GeneralizedRCNN(
        roi_heads_name=head, class_embed=bank(), bg_embed=bg(), **TINY
    )
    model, params, losses = run_train(model)
    if head.startswith("Sematic") and not head.endswith("CrossOutput"):
        assert "loss_attentive" in losses
    if head.startswith("Text"):
        assert "loss_kl" in losses
        assert "loss_cls_t" in losses
        assert "loss_student_feat" in losses

    images, _ = tiny_batch()
    det = jax.jit(functools.partial(model.apply, train=False))(params, images)
    assert det.boxes.shape[0] == 2


@pytest.mark.parametrize(
    "cls",
    [GeneralizedSemanticRCNN, GeneralizedDistillatedRCNN, GeneralizedTextRCNN,
     GeneralizedTextAttRCNN],
)
def test_text_meta_archs_train(cls):
    model = cls(class_embed=bank(), semantic_dim=SEM_DIM, **TINY)
    _, _, losses = run_train(model)
    if cls is GeneralizedDistillatedRCNN:
        assert {"loss_rpn_res2", "loss_rpn_res3", "loss_rpn_res4"} <= set(losses)


def test_paint_semantic_map_last_wins():
    emb = np.eye(3, dtype=np.float32)
    gt = GTInstances(
        boxes=jnp.asarray(
            [[[0.0, 0.0, 64.0, 64.0], [32.0, 32.0, 96.0, 96.0]]]
        ),
        classes=jnp.asarray([[0, 2]], jnp.int32),
        valid=jnp.asarray([[True, True]]),
    )
    bg_vec = jnp.full((3,), 0.5)
    out = np.asarray(
        paint_semantic_map(gt, jnp.asarray(emb), bg_vec, (8, 8), stride=16)
    )[0]
    # pixel (1,1) inside first box only -> class 0
    np.testing.assert_allclose(out[1, 1], [1, 0, 0])
    # pixel (3,3) inside both -> later GT (class 2) wins
    np.testing.assert_allclose(out[3, 3], [0, 0, 1])
    # pixel (7,7) outside both -> bg
    np.testing.assert_allclose(out[7, 7], [0.5, 0.5, 0.5])


def test_kd_loss_bg_weighting():
    logits_s = jnp.asarray([[2.0, 0.0], [0.0, 2.0]])
    logits_t = jnp.asarray([[0.0, 2.0], [2.0, 0.0]])
    labels = jnp.asarray([0, 1])  # second row is bg (bg_label=1)
    l = float(loss_fn_kd_only(logits_s, labels, 1, logits_t, temperature=1.0))
    # manual: per-row KL identical by symmetry; bg row x1.5 -> 1.25x mean KL
    p = jax.nn.softmax(logits_t[0])
    q = jax.nn.log_softmax(logits_s[0])
    kl = float(jnp.sum(p * (jax.nn.log_softmax(logits_t[0]) - q)))
    assert np.isclose(l, (kl + 1.5 * kl) / 2, rtol=1e-5)


def test_siamese_attention_shapes():
    mod = SingleHeadSiameseAttention(d_model=32)
    q = jnp.ones((2, 7, 32))
    k = jnp.ones((2, 5, 32))
    v = jnp.ones((2, 5, 32))
    params = mod.init(jax.random.PRNGKey(0), q, k, v)
    out, attn = mod.apply(params, q, k, v)
    assert out.shape == (2, 7, 32)
    assert attn.shape == (2, 7, 6)  # K gets the dummy token
    assert np.allclose(np.asarray(attn.sum(-1)), 1.0, atol=1e-5)


def test_teacher_evaluation_with_gt():
    """Inference with GT provided runs the teacher path (ref
    label_proposals + forward_teacher at test time)."""
    model = GeneralizedRCNN(
        roi_heads_name="TextRes5ROIHeads", class_embed=bank(), bg_embed=bg(),
        **TINY,
    )
    images, gt = tiny_batch()
    rngs = {
        "params": jax.random.PRNGKey(0),
        "sampling": jax.random.PRNGKey(1),
        "dropout": jax.random.PRNGKey(2),
    }
    params = jax.jit(functools.partial(model.init, train=True))(
        rngs, images, gt
    )
    det_teacher = jax.jit(functools.partial(model.apply, train=False))(
        params, images, gt
    )
    det_student = jax.jit(functools.partial(model.apply, train=False))(
        params, images
    )
    assert det_teacher.boxes.shape == det_student.boxes.shape
    # different heads -> different score patterns
    assert not np.allclose(
        np.asarray(det_teacher.scores), np.asarray(det_student.scores)
    )


def test_paint_semantic_map_adding():
    emb = np.eye(3, dtype=np.float32)
    gt = GTInstances(
        boxes=jnp.asarray(
            [[[0.0, 0.0, 64.0, 64.0], [32.0, 32.0, 96.0, 96.0]]]
        ),
        classes=jnp.asarray([[0, 2]], jnp.int32),
        valid=jnp.asarray([[True, True]]),
    )
    bg_vec = jnp.full((3,), 0.5)
    out = np.asarray(
        paint_semantic_map(
            gt, jnp.asarray(emb), bg_vec, (8, 8), stride=16, adding=True
        )
    )[0]
    # overlap region sums both class embeddings
    np.testing.assert_allclose(out[3, 3], [1, 0, 1])
    np.testing.assert_allclose(out[1, 1], [1, 0, 0])
    np.testing.assert_allclose(out[7, 7], [0.5, 0.5, 0.5])


def _grads(model, params):
    images, gt = tiny_batch()
    rngs = {
        "sampling": jax.random.PRNGKey(3),
        "dropout": jax.random.PRNGKey(4),
    }

    def loss_fn(p):
        losses = model.apply(p, images, gt, train=True, rngs=rngs)
        return sum(
            v for k, v in losses.items() if not k.startswith("metric/")
        )

    return jax.jit(jax.grad(loss_fn))(params)


def test_freeze_attention_zeroes_attention_grads():
    """MODEL.ADDITION.FREEZEATTENTION (ref roi_heads.py:948-951 sets
    requires_grad=False on the attention module): with the flag on, the
    attention params get exactly zero gradient while the predictor still
    trains; with it off the attention gradient is nonzero."""

    def total_abs(tree):
        return float(
            sum(jnp.abs(v).sum() for v in jax.tree_util.tree_leaves(tree))
        )

    grads_by_flag = {}
    for flag in (False, True):
        model = GeneralizedRCNN(
            roi_heads_name="SematicRes5ROIHeads",
            class_embed=bank(), bg_embed=bg(),
            freeze_attention=flag, **TINY,
        )
        model, params, _ = run_train(model)
        g = _grads(model, params)["params"]["roi_heads"]
        grads_by_flag[flag] = g
        assert total_abs(g["box_predictor"]) > 0, flag
    assert total_abs(grads_by_flag[True]["attention"]) == 0.0
    assert total_abs(grads_by_flag[False]["attention"]) > 0


def test_l2_cosine_switches_student_feature_loss():
    """MODEL.ROI_HEADS.L2_COSINE: cosine feature distill (bounded by 2 per
    ROI) instead of the squared-L2 pull; both finite, numerically
    different programs."""
    vals = {}
    for cos in (False, True):
        model = GeneralizedRCNN(
            roi_heads_name="TextRes5ROIHeads",
            class_embed=bank(), bg_embed=bg(),
            l2_cosine=cos, **TINY,
        )
        _, _, losses = run_train(model)
        assert "loss_student_feat" in losses
        vals[cos] = float(losses["loss_student_feat"])
    assert vals[True] <= 2.0 + 1e-6  # mean of (1 - cos) in [0, 2]
    assert vals[True] != vals[False]
