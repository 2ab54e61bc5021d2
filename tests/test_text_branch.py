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


def test_model_cache_handles_unhashable_text_models():
    """evaluator._model_cache must not hash the module: text-family models
    carry numpy class-embedding attributes and are unhashable (a
    WeakKeyDictionary key crashed every text/semantic evaluation)."""
    import gc
    import weakref

    from fewshotobjectdetection_imporove_via_text_feature_tpu.evaluation import (
        evaluator as ev,
    )

    model = GeneralizedRCNN(
        roi_heads_name="TextRes5ROIHeads", class_embed=bank(),
        bg_embed=bg(), **TINY,
    )
    with pytest.raises(TypeError):
        hash(model)  # the precondition that broke the old cache
    entry = ev._model_cache(model)
    assert ev._model_cache(model) is entry  # reused, not re-traced
    key = id(model)
    assert key in ev._jit_cache
    # the cached jit pins the model (bound method), so the id-key can
    # never be recycled into a stale hit while the entry exists
    ref = weakref.ref(model)
    del model, entry
    gc.collect()
    assert ref() is not None


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


def test_paint_semantic_map_inclusive_end():
    """The Text meta-archs' _expand_bbox ends at floor(x2/stride)+1
    (ref rcnn.py:398-405) while the Semantic variant truncates
    (rcnn.py:177-185): a sub-cell box must paint its cell only in
    inclusive mode, and every box gains its edge cell."""
    emb = np.eye(3, dtype=np.float32)
    gt = GTInstances(
        boxes=jnp.asarray([[[97.6, 97.6, 104.0, 104.0]]]),  # inside cell 6
        classes=jnp.asarray([[1]], jnp.int32),
        valid=jnp.asarray([[True]]),
    )
    bg_vec = jnp.zeros((3,))
    excl = np.asarray(
        paint_semantic_map(gt, jnp.asarray(emb), bg_vec, (8, 8), stride=16)
    )[0]
    incl = np.asarray(
        paint_semantic_map(
            gt, jnp.asarray(emb), bg_vec, (8, 8), stride=16,
            inclusive_end=True,
        )
    )[0]
    # floor(97.6/16)=6, floor(104/16)=6: exclusive [6,6) paints nothing
    assert excl.sum() == 0
    # inclusive [6,7) paints exactly cell (6,6)
    np.testing.assert_allclose(incl[6, 6], [0, 1, 0])
    assert incl.sum() == 1.0

    # a box ending at 95.9 (cell 5.99): inclusive keeps column/row 5
    gt2 = GTInstances(
        boxes=jnp.asarray([[[0.0, 0.0, 95.9, 95.9]]]),
        classes=jnp.asarray([[0]], jnp.int32),
        valid=jnp.asarray([[True]]),
    )
    excl2 = np.asarray(
        paint_semantic_map(gt2, jnp.asarray(emb), bg_vec, (8, 8), stride=16)
    )[0]
    incl2 = np.asarray(
        paint_semantic_map(
            gt2, jnp.asarray(emb), bg_vec, (8, 8), stride=16,
            inclusive_end=True,
        )
    )[0]
    assert excl2[:, :, 0].sum() == 25  # [0,5) x [0,5)
    assert incl2[:, :, 0].sum() == 36  # [0,6) x [0,6)


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


def test_freeze_attention_masks_updates_not_gradient_flow():
    """MODEL.ADDITION.FREEZEATTENTION is the reference's
    requires_grad=False on the attention module ONLY (roi_heads.py:948-951):
    the loss gradient still flows THROUGH the attention (nonzero raw grads
    on its params and on upstream res5 — a stop_gradient would sever the
    CE-attention path), but the optimizer update for the attention params
    is exactly zero when the flag is set."""
    import optax

    from fewshotobjectdetection_imporove_via_text_feature_tpu.config import (
        get_cfg,
    )
    from fewshotobjectdetection_imporove_via_text_feature_tpu.solver import (
        build_optimizer,
    )

    def total_abs(tree):
        return float(
            sum(jnp.abs(v).sum() for v in jax.tree_util.tree_leaves(tree))
        )

    model = GeneralizedRCNN(
        roi_heads_name="SematicRes5ROIHeads",
        class_embed=bank(), bg_embed=bg(), **TINY,
    )
    model, params, _ = run_train(model)
    grads = _grads(model, params)["params"]
    # gradient flows through the frozen-at-optimizer-level module
    assert total_abs(grads["roi_heads"]["attention"]) > 0
    assert total_abs(grads["roi_heads"]["res5"]) > 0
    assert total_abs(grads["roi_heads"]["box_predictor"]) > 0

    updates_by_flag = {}
    for flag in (False, True):
        cfg = get_cfg()
        cfg.MODEL.BACKBONE.FREEZE_AT = 0
        cfg.MODEL.ADDITION.FREEZEATTENTION = flag
        tx, _ = build_optimizer(cfg, params["params"])
        state = tx.init(params["params"])
        upd, _ = tx.update(grads, state, params["params"])
        updates_by_flag[flag] = upd["roi_heads"]
        assert total_abs(upd["roi_heads"]["box_predictor"]) > 0, flag
    assert total_abs(updates_by_flag[True]["attention"]) == 0.0
    assert total_abs(updates_by_flag[False]["attention"]) > 0


def test_siamese_attention_init_contexts():
    """Two reference construction contexts (attentive_modules.py):
    Sematic/LV heads re-init EVERY Linear inside the attention — incl. the
    FFN — to N(0, 0.02) (_init_parameters :181-189 via :248/:376/:572);
    GeneralizedTextAttRCNN keeps the as-constructed init, i.e. w_q/w_k/w_v
    ~ N(0, sqrt(2/(d+d))) (:95-100) and torch-default linears."""
    d = 64
    x = jnp.zeros((1, 5, d))
    p = SingleHeadSiameseAttention(d).init(
        jax.random.PRNGKey(0), x, x, x
    )["params"]
    for name in ("w_q", "w_k", "w_v", "linear1", "linear2", "linear3"):
        std = float(np.asarray(p[name]["kernel"]).std())
        assert 0.012 < std < 0.03, (name, std)
    for name in ("linear1", "linear2"):
        std = float(np.asarray(p["ffn"][name]["kernel"]).std())
        assert 0.012 < std < 0.03, ("ffn", name, std)

    p0 = SingleHeadSiameseAttention(d, reinit_scale=None).init(
        jax.random.PRNGKey(0), x, x, x
    )["params"]
    # sqrt(2/(d+d)) = 0.125 for d=64
    for name in ("w_q", "w_k", "w_v"):
        std = float(np.asarray(p0[name]["kernel"]).std())
        assert 0.09 < std < 0.16, (name, std)
    # torch default U(±1/sqrt(fan_in=64)) -> std 0.125/sqrt(3) ~ 0.072
    std = float(np.asarray(p0["ffn"]["linear1"]["kernel"]).std())
    assert 0.05 < std < 0.10, std


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


def test_text_meta_arch_eval_paints_gt_and_falls_back_to_bg():
    """Train/eval feature-distribution parity for GeneralizedTextRCNN
    (round-3 bug found by the held-out gate: eval used raw un-fused
    features the heads never saw in training -> confident-garbage
    detections, held-out AP 0.0).

    Contract mirrored from the reference: its inference passes test-time
    gt_instances into _forward_once_ (rcnn.py:64-67) so the text map is
    GT-painted at eval (eval_gt_role="paint"); without GT (serving) this
    build paints an ALL-BG map through the SAME fuse projection instead
    of skipping fusion (the reference crashes on instance-less inputs).
    """
    model = GeneralizedTextRCNN(
        class_embed=bank(), bg_embed=bg(), semantic_dim=SEM_DIM, **TINY
    )
    assert model.eval_gt_role == "paint"
    images, gt = tiny_batch()
    rngs = {
        "params": jax.random.PRNGKey(0),
        "sampling": jax.random.PRNGKey(1),
        "dropout": jax.random.PRNGKey(2),
    }
    params = jax.jit(functools.partial(model.init, train=True))(
        rngs, images, gt
    )
    det_paint = jax.jit(functools.partial(model.apply, train=False))(
        params, images, gt
    )
    det_bg = jax.jit(functools.partial(model.apply, train=False))(
        params, images
    )
    # painted vs bg-map features flow into everything downstream
    assert not np.allclose(
        np.asarray(det_paint.scores), np.asarray(det_bg.scores)
    )
    # the features handed to RPN/heads at eval go through fuse_text in
    # BOTH modes (never the raw backbone features)
    feat_bg, _ = model.apply(
        params, images, method=lambda m, im: m.compute_features(im)
    )
    feat_raw, _ = model.apply(
        params, images,
        method=lambda m, im: GeneralizedRCNN.compute_features(m, im),
    )
    assert not np.allclose(np.asarray(feat_bg), np.asarray(feat_raw))


def test_eval_gt_roles():
    """Distillated ignores eval gt (ref rcnn.py:235-237 passes None);
    Semantic paints; the plain arch keeps the teacher-eval role."""
    assert GeneralizedSemanticRCNN.eval_gt_role == "paint"
    assert GeneralizedTextAttRCNN.eval_gt_role == "paint"
    assert GeneralizedDistillatedRCNN.eval_gt_role == "none"
    assert GeneralizedRCNN.eval_gt_role == "teacher"

    model = GeneralizedDistillatedRCNN(
        class_embed=bank(), bg_embed=bg(), semantic_dim=SEM_DIM, **TINY
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
    det_gt = jax.jit(functools.partial(model.apply, train=False))(
        params, images, gt
    )
    det_none = jax.jit(functools.partial(model.apply, train=False))(
        params, images
    )
    np.testing.assert_allclose(
        np.asarray(det_gt.scores), np.asarray(det_none.scores)
    )


def test_semantic_meta_arch_serving_paints_all_bg():
    """GeneralizedSemanticRCNN serving fallback (ADVICE r3): with gt=None
    the features handed to RPN/heads must be sem2vis_proj(all-background
    map) — the training distribution — NOT raw backbone features (the
    heads never saw those; same 'confident garbage' failure the Text
    family's all-bg fallback fixed). The Distillated subclass keeps raw
    features in all modes (its heads are trained on raw res4,
    ref rcnn.py:235-237)."""
    model = GeneralizedSemanticRCNN(
        class_embed=bank(), bg_embed=bg(), semantic_dim=SEM_DIM, **TINY
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
    feat_serving, _ = model.apply(
        params, images, method=lambda m, im: m.compute_features(im)
    )
    feat_raw, _ = model.apply(
        params, images,
        method=lambda m, im: GeneralizedRCNN.compute_features(m, im),
    )
    # serving features are the projected all-bg paint, not raw backbone
    assert not np.allclose(np.asarray(feat_serving), np.asarray(feat_raw))
    # they equal painting an empty (all-invalid) GT explicitly
    from fewshotobjectdetection_imporove_via_text_feature_tpu.structures import (
        GTInstances,
    )

    empty = GTInstances(
        boxes=jnp.zeros_like(gt.boxes),
        classes=jnp.zeros_like(gt.classes),
        valid=jnp.zeros_like(gt.valid),
    )
    feat_empty, _ = model.apply(
        params, images, method=lambda m, im: m.compute_features(im, empty)
    )
    np.testing.assert_allclose(
        np.asarray(feat_serving), np.asarray(feat_empty), atol=1e-6
    )

    # the Distillated subclass keeps raw features even with gt given
    dmodel = GeneralizedDistillatedRCNN(
        class_embed=bank(), bg_embed=bg(), semantic_dim=SEM_DIM, **TINY
    )
    dparams = jax.jit(functools.partial(dmodel.init, train=True))(
        rngs, images, gt
    )
    dfeat, _ = dmodel.apply(
        dparams, images, method=lambda m, im: m.compute_features(im)
    )
    dfeat_raw, _ = dmodel.apply(
        dparams, images,
        method=lambda m, im: GeneralizedRCNN.compute_features(m, im),
    )
    np.testing.assert_allclose(np.asarray(dfeat), np.asarray(dfeat_raw))


def test_no_gt_eval_forces_serving_path():
    """TEST.NO_GT_EVAL (evaluator no_gt=True) must withhold GT from
    painting meta-archs: the text model then evaluates through its all-bg
    serving fallback — the NON-leaky evaluation of the deployable path
    (gate 'serving' leg, VERDICT r3 task 3)."""
    from fewshotobjectdetection_imporove_via_text_feature_tpu.evaluation.evaluator import (
        inference_on_dataset,
    )

    model = GeneralizedTextRCNN(
        class_embed=bank(), bg_embed=bg(), semantic_dim=SEM_DIM, **TINY
    )
    images, gt = tiny_batch()
    rngs = {
        "params": jax.random.PRNGKey(0),
        "sampling": jax.random.PRNGKey(1),
        "dropout": jax.random.PRNGKey(2),
    }
    params = jax.jit(functools.partial(model.init, train=True))(
        rngs, images, gt
    )["params"]

    class _Collect:
        def reset(self):
            self.scores = None

        def process_detections(self, ids, boxes, scores, classes, valid):
            self.scores = np.asarray(scores)

        def evaluate(self):
            return {}

    ids = [f"i{k}" for k in range(images.image.shape[0])]

    def loader():
        yield images, gt, {"image_ids": ids}

    painted, serving = _Collect(), _Collect()
    inference_on_dataset(model, params, loader(), painted)
    inference_on_dataset(model, params, loader(), serving, no_gt=True)
    # GT-painted vs all-bg-paint features flow into every detection score
    assert not np.allclose(painted.scores, serving.scores)
    # and the serving run equals inference with no GT at all
    det_no_gt = jax.jit(functools.partial(model.apply, train=False))(
        {"params": params}, images
    )
    np.testing.assert_allclose(
        serving.scores, np.asarray(det_no_gt.scores), atol=1e-6
    )


def test_no_gt_eval_rejected_for_semantic_family():
    """TEST.NO_GT_EVAL with the Semantic family is rejected (ADVICE r4):
    its detection features are SOLELY the painted map, so withholding GT
    would evaluate an input-independent constant feature map and report
    meaningless metrics instead of a serving-path evaluation."""
    from fewshotobjectdetection_imporove_via_text_feature_tpu.evaluation.evaluator import (
        inference_on_dataset,
    )

    model = GeneralizedSemanticRCNN(
        class_embed=bank(), bg_embed=bg(), semantic_dim=SEM_DIM, **TINY
    )
    images, gt = tiny_batch()

    def loader():
        yield images, gt, {"image_ids": ["i0"]}

    with pytest.raises(ValueError, match="NO_GT_EVAL"):
        inference_on_dataset(model, {}, loader(), None, no_gt=True)

    # the Distillated subclass (eval_gt_role="none": raw-res4 detection
    # path) must NOT trip the guard — NO_GT_EVAL is a no-op there
    dmodel = GeneralizedDistillatedRCNN(
        class_embed=bank(), bg_embed=bg(), semantic_dim=SEM_DIM, **TINY
    )
    rngs = {
        "params": jax.random.PRNGKey(0),
        "sampling": jax.random.PRNGKey(1),
        "dropout": jax.random.PRNGKey(2),
    }
    dparams = jax.jit(functools.partial(dmodel.init, train=True))(
        rngs, images, gt
    )["params"]
    inference_on_dataset(dmodel, dparams, loader(), None, no_gt=True)


def test_cross_roi_attention_masks_pad_rows():
    """The LV teacher attention is CROSS-ROI (each query attends over
    every row's text feature) — PAD slots must contribute NO keys/values:
    outputs for the valid rows must equal running the attention on just
    the valid rows (round-4 fix; found by the full-network text oracle)."""
    from fewshotobjectdetection_imporove_via_text_feature_tpu.models.attention import (
        LVAttention,
        LVAttentionTextDomination,
    )

    rng = np.random.RandomState(7)
    n, nv, d = 24, 17, 32
    b = bank()
    vis = rng.randn(n, d).astype(np.float32)
    labels = rng.randint(0, NUM_CLASSES + 1, n)
    valid = np.zeros(n, bool)
    valid[:nv] = True

    for cls in (LVAttention, LVAttentionTextDomination):
        mod = cls(input_size=d, class_embed=b, text_dim=SEM_DIM)
        params = mod.init(
            jax.random.PRNGKey(0), jnp.asarray(vis), jnp.asarray(labels)
        )
        _, full = mod.apply(
            params, jnp.asarray(vis), jnp.asarray(labels), jnp.asarray(valid)
        )
        _, only_valid = mod.apply(
            params, jnp.asarray(vis[:nv]), jnp.asarray(labels[:nv])
        )
        np.testing.assert_allclose(
            np.asarray(full["sim2stext"])[:nv],
            np.asarray(only_valid["sim2stext"]),
            atol=1e-5,
            err_msg=cls.__name__,
        )
        # and with every slot valid the mask is a no-op (bit-identical)
        _, masked_all = mod.apply(
            params, jnp.asarray(vis), jnp.asarray(labels),
            jnp.ones(n, bool),
        )
        _, unmasked = mod.apply(
            params, jnp.asarray(vis), jnp.asarray(labels)
        )
        np.testing.assert_array_equal(
            np.asarray(masked_all["sim2stext"]),
            np.asarray(unmasked["sim2stext"]),
            err_msg=cls.__name__,
        )
