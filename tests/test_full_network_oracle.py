"""FULL-NETWORK numeric parity vs a plain-torch assembly of the reference
GeneralizedRCNN (tests/torch_oracle.py) — VERDICT r3 task 1.

The piecewise oracles (test_reference_oracles, test_loss_parity_torch,
kernel goldens) pin every module in isolation; this test runs the ENTIRE
network stem->res4->GDL/affine->RPN->proposal selection->ROIAlign->res5->
predictor on BOTH frameworks with the SAME translated weights
(checkpoint.torch_import.export_d2_state -> torch load_state_dict) and the
same inputs, asserting:

  1. train-mode loss dict parity (exhaustive fg/bg sampling removes the
     subsample randomness: both sides train on ALL candidates);
  2. inference detections parity (boxes/scores/classes, rank-ordered);
  3. gradient parity of the summed loss at representative parameters in
     every subsystem (affines, RPN head, backbone stem — through the GDL
     lambda contract lambda_rpn=0 / lambda_rcnn=0.75 — res5, predictors).

Any cross-module wiring drift (feature layout, GDL/affine placement,
proposal coordinate conventions, head reshapes, loss normalizers) fails
here even when each module matches in isolation.

Weight perturbation makes every translated leaf matter: FrozenBN stats
are randomized (running_mean/var exercised, not identity), zero-init
conv3 residuals are filled, affines are non-identity.
"""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from flax import traverse_util

from fewshotobjectdetection_imporove_via_text_feature_tpu.checkpoint.torch_import import (
    _convert,
    _ours_to_d2,
    export_d2_state,
)
from fewshotobjectdetection_imporove_via_text_feature_tpu.models import (
    GeneralizedRCNN,
)
from fewshotobjectdetection_imporove_via_text_feature_tpu.structures import (
    GTInstances,
    ImageBatch,
)
from tests.torch_oracle import TorchGeneralizedRCNN

NUM_CLASSES = 5
H, W = 128, 160  # bucket; feature map 8x10, N = 8*10*15 = 1200 anchors
PRE_NMS = 1200
POST_NMS = 300
MAX_GT = 8
# exhaustive ROI sampling: batch covers every candidate (P + G) and the
# 25% positive cap (0.25 * 1232 = 308 >= P + G fg worst case)
ROI_BATCH = 4 * (POST_NMS + MAX_GT)
RPN_BATCH = 100000


def _perturb(params, seed=0):
    """Replace degenerate init leaves so every translated tensor matters."""
    rng = np.random.RandomState(seed)
    flat = traverse_util.flatten_dict(params)
    for path in sorted(flat.keys()):
        leaf = np.asarray(flat[path], np.float32)
        name = path[-1]
        if name == "running_mean":
            flat[path] = rng.normal(0, 0.1, leaf.shape).astype(np.float32)
        elif name == "running_var":
            flat[path] = rng.uniform(0.5, 1.5, leaf.shape).astype(np.float32)
        elif name in ("weight",) and leaf.ndim == 1 and "bn" in str(path[-2]):
            flat[path] = rng.uniform(0.5, 1.5, leaf.shape).astype(np.float32)
        elif name == "weight" and path[0] in ("affine_rpn", "affine_rcnn"):
            flat[path] = rng.uniform(0.8, 1.2, leaf.shape).astype(np.float32)
        elif name == "bias" and path[0] in ("affine_rpn", "affine_rcnn"):
            flat[path] = rng.normal(0, 0.05, leaf.shape).astype(np.float32)
        elif name == "kernel" and str(path[-2]) == "conv3":
            # zero-init residual (PARITY #6) would hide conv3 translation
            flat[path] = rng.normal(0, 0.05, leaf.shape).astype(np.float32)
        elif name == "bias" and leaf.ndim == 1 and not np.any(leaf):
            flat[path] = rng.normal(0, 0.02, leaf.shape).astype(np.float32)
    return traverse_util.unflatten_dict(flat)


def _build_models():
    model = GeneralizedRCNN(
        num_classes=NUM_CLASSES,
        depth=14,
        stem_out_channels=8,
        res2_out_channels=16,
        width_per_group=4,
        freeze_at=0,
        rpn_pre_nms_topk=(PRE_NMS, PRE_NMS),
        rpn_post_nms_topk=(POST_NMS, POST_NMS),
        rpn_batch_per_image=RPN_BATCH,
        roi_batch_per_image=ROI_BATCH,
        test_candidate_topk=POST_NMS * NUM_CLASSES,  # budget exhaustive
        cls_dropout=False,
    )
    oracle = TorchGeneralizedRCNN(
        num_classes=NUM_CLASSES,
        stem_out=8,
        res2_out=16,
        width_per_group=4,
        blocks=(1, 1, 1),
        res5_blocks=1,
        rpn_pre_nms=PRE_NMS,
        rpn_post_nms=POST_NMS,
        rpn_batch=RPN_BATCH,
    )
    return model, oracle


def _inputs(padded: bool, seed=7):
    """Two images; padded=True puts image 1 at (96, 128) inside the
    (128, 160) canvas — zero PIXELS, our padding convention (PARITY #13:
    the torch oracle mirrors it, so both sides see identical canvases)."""
    rng = np.random.RandomState(seed)
    canvas = rng.uniform(0, 255, (2, H, W, 3)).astype(np.float32)
    hw = np.array([[H, W], [H, W]], np.int32)
    if padded:
        hw[1] = (96, 128)
        canvas[1, 96:, :, :] = 0.0
        canvas[1, :, 128:, :] = 0.0
    gt_boxes = np.zeros((2, MAX_GT, 4), np.float32)
    gt_classes = np.zeros((2, MAX_GT), np.int32)
    gt_valid = np.zeros((2, MAX_GT), bool)
    for i in range(2):
        g = 4
        ih, iw = hw[i]
        x1 = rng.uniform(0, iw - 40, g)
        y1 = rng.uniform(0, ih - 40, g)
        bw = rng.uniform(16, 60, g)
        bh = rng.uniform(16, 60, g)
        gt_boxes[i, :g] = np.stack(
            [x1, y1, np.minimum(x1 + bw, iw), np.minimum(y1 + bh, ih)], axis=1
        )
        gt_classes[i, :g] = rng.randint(0, NUM_CLASSES, g)
        gt_valid[i, :g] = True
    images = ImageBatch(image=canvas, hw=hw, orig_hw=hw.copy())
    gt = GTInstances(
        boxes=jnp.asarray(gt_boxes),
        classes=jnp.asarray(gt_classes),
        valid=jnp.asarray(gt_valid),
    )
    return images, gt, canvas, hw, gt_boxes, gt_classes, gt_valid


def _shared_state(model, images, gt):
    rngs = {
        "params": jax.random.PRNGKey(0),
        "sampling": jax.random.PRNGKey(1),
        "dropout": jax.random.PRNGKey(2),
    }
    variables = model.init(rngs, images, gt, train=True)
    params = _perturb(jax.device_get(variables["params"]))
    state, exported, skipped = export_d2_state(params)
    assert not skipped, f"flagship params must all export: {skipped}"
    return params, state


def _load_oracle(oracle, state):
    tstate = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in state.items()}
    missing, unexpected = oracle.load_state_dict(tstate, strict=False)
    assert not unexpected, unexpected
    assert set(missing) == {"pixel_mean", "pixel_std"}, missing


def _torch_gt(gt_boxes, gt_classes, gt_valid):
    tb, tc = [], []
    for i in range(gt_boxes.shape[0]):
        v = gt_valid[i]
        tb.append(torch.from_numpy(gt_boxes[i][v]))
        tc.append(torch.from_numpy(gt_classes[i][v].astype(np.int64)))
    return tb, tc


@pytest.mark.parametrize("padded", [False, True])
def test_full_network_train_losses_and_grads_match_torch_oracle(padded):
    model, oracle = _build_models()
    images, gt, canvas, hw, gt_boxes, gt_classes, gt_valid = _inputs(padded)
    params, state = _shared_state(model, images, gt)
    _load_oracle(oracle, state)

    # --- torch side ---
    timgs = torch.from_numpy(canvas.transpose(0, 3, 1, 2))
    tb, tc = _torch_gt(gt_boxes, gt_classes, gt_valid)
    tlosses = oracle.losses(timgs, [tuple(x) for x in hw.tolist()], tb, tc)
    total_t = sum(tlosses.values())
    total_t.backward()

    # --- our side (value + grad of the same summed loss) ---
    def loss_fn(p):
        losses = model.apply(
            {"params": p},
            images,
            gt,
            train=True,
            rngs={
                "sampling": jax.random.PRNGKey(11),
                "dropout": jax.random.PRNGKey(12),
            },
        )
        total = sum(
            v for k, v in losses.items() if not k.startswith("metric/")
        )
        return total, losses

    (total_j, losses_j), grads = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True)
    )(params)
    losses_j = jax.device_get(losses_j)

    # 1. per-loss parity
    for k in ("loss_rpn_cls", "loss_rpn_loc", "loss_cls", "loss_box_reg"):
        ours = float(losses_j[k])
        ref = float(tlosses[k])
        np.testing.assert_allclose(
            ours, ref, rtol=2e-3, atol=1e-6,
            err_msg=f"{k} (padded={padded})",
        )

    # 2. gradient parity at one representative parameter per subsystem.
    # lambda_rpn=0 kills the RPN branch's backbone contribution; the stem
    # grad is then purely the 0.75-scaled ROI branch through affine_rcnn —
    # exactly the DeFRCN decoupling contract, checked end to end.
    named = dict(oracle.named_parameters())
    flat_grads = traverse_util.flatten_dict(jax.device_get(grads))
    checks = [
        ("affine_rpn", "weight"),
        ("affine_rcnn", "weight"),
        ("rpn_head", "conv", "kernel"),
        ("rpn_head", "objectness_logits", "bias"),
        ("backbone", "stem_conv1", "kernel"),
        ("backbone", "res3", "block0", "conv2", "kernel"),
        ("roi_heads", "res5", "res5", "block0", "conv1", "kernel"),
        ("roi_heads", "box_predictor", "cls_score", "kernel"),
        ("roi_heads", "box_predictor", "bbox_pred", "bias"),
    ]
    for path in checks:
        name, kind = _ours_to_d2(path)
        assert name is not None and name in named, path
        tgrad = _convert(named[name].grad.detach().numpy(), kind)
        jgrad = np.asarray(flat_grads[path])
        scale = np.abs(tgrad).max() + 1e-12
        np.testing.assert_allclose(
            jgrad, tgrad, atol=5e-3 * scale, rtol=0,
            err_msg=f"grad {path} (padded={padded})",
        )


@pytest.mark.parametrize("padded", [False, True])
def test_full_network_inference_matches_torch_oracle(padded):
    model, oracle = _build_models()
    images, gt, canvas, hw, *_ = _inputs(padded)
    params, state = _shared_state(model, images, gt)
    _load_oracle(oracle, state)

    det = jax.device_get(
        jax.jit(functools.partial(model.apply, train=False))(
            {"params": params}, images
        )
    )
    timgs = torch.from_numpy(canvas.transpose(0, 3, 1, 2))
    tres = oracle.inference(timgs, [tuple(x) for x in hw.tolist()])

    for i in range(2):
        tb, ts, tc = (x.numpy() for x in tres[i])
        valid = np.asarray(det.valid[i])
        ours_boxes = np.asarray(det.boxes[i])[valid]
        ours_scores = np.asarray(det.scores[i])[valid]
        ours_classes = np.asarray(det.classes[i])[valid]
        assert ours_boxes.shape[0] == tb.shape[0], (
            f"det count {ours_boxes.shape[0]} vs {tb.shape[0]} "
            f"(img {i}, padded={padded})"
        )
        # both sides emit in score-descending keep order
        np.testing.assert_array_equal(
            ours_classes, tc, err_msg=f"classes img {i}"
        )
        np.testing.assert_allclose(
            ours_scores, ts, atol=1e-5, err_msg=f"scores img {i}"
        )
        np.testing.assert_allclose(
            ours_boxes, tb, atol=5e-3, err_msg=f"boxes img {i}"
        )


def test_full_network_stride_in_1x1_false_matches_torch_oracle():
    """MODEL.RESNETS.STRIDE_IN_1X1=False — the torchvision conv convention
    the vendored spec supports (resnet.py:390-404): the stage stride moves
    from conv1 (1x1) to conv2 (3x3), which changes every strided block's
    arithmetic AND forces the ROI pooled path to give up the strided-bin
    elision (res5 block0's 3x3 stride-2 conv reads every 7x7 bin —
    roi_heads.py gates use_elision on stride_in_1x1). Losses + a stem
    gradient (the full-pool path through the GDL contract) + inference
    (VERDICT r4 task 7; last untested backbone config axis)."""
    model = GeneralizedRCNN(
        num_classes=NUM_CLASSES,
        depth=14,
        stem_out_channels=8,
        res2_out_channels=16,
        width_per_group=4,
        freeze_at=0,
        stride_in_1x1=False,
        rpn_pre_nms_topk=(PRE_NMS, PRE_NMS),
        rpn_post_nms_topk=(POST_NMS, POST_NMS),
        rpn_batch_per_image=RPN_BATCH,
        roi_batch_per_image=ROI_BATCH,
        test_candidate_topk=POST_NMS * NUM_CLASSES,
        cls_dropout=False,
    )
    oracle = TorchGeneralizedRCNN(
        num_classes=NUM_CLASSES,
        stem_out=8,
        res2_out=16,
        width_per_group=4,
        blocks=(1, 1, 1),
        res5_blocks=1,
        stride_in_1x1=False,
        rpn_pre_nms=PRE_NMS,
        rpn_post_nms=POST_NMS,
        rpn_batch=RPN_BATCH,
    )
    images, gt, canvas, hw, gt_boxes, gt_classes, gt_valid = _inputs(False)
    params, state = _shared_state(model, images, gt)
    _load_oracle(oracle, state)

    timgs = torch.from_numpy(canvas.transpose(0, 3, 1, 2))
    tb, tc = _torch_gt(gt_boxes, gt_classes, gt_valid)
    tlosses = oracle.losses(timgs, [tuple(x) for x in hw.tolist()], tb, tc)
    sum(tlosses.values()).backward()

    def loss_fn(p):
        losses = model.apply(
            {"params": p}, images, gt, train=True,
            rngs={
                "sampling": jax.random.PRNGKey(11),
                "dropout": jax.random.PRNGKey(12),
            },
        )
        return sum(
            v for k, v in losses.items() if not k.startswith("metric/")
        ), losses

    (_, losses_j), grads = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True)
    )(params)
    losses_j = jax.device_get(losses_j)
    for k in ("loss_rpn_cls", "loss_rpn_loc", "loss_cls", "loss_box_reg"):
        np.testing.assert_allclose(
            float(losses_j[k]), float(tlosses[k].detach()),
            rtol=3e-3, atol=2e-6, err_msg=k,
        )

    flat_grads = traverse_util.flatten_dict(jax.device_get(grads))
    for path in (
        ("backbone", "stem_conv1", "kernel"),
        # block0's conv2: the conv that now carries the stage stride
        ("roi_heads", "res5", "res5", "block0", "conv2", "kernel"),
    ):
        name, kind = _ours_to_d2(path)
        t = dict(oracle.named_parameters())[name]
        ref_g = _convert(t.grad.detach().numpy(), kind)
        ours_g = np.asarray(flat_grads[path])
        scale = np.abs(ref_g).max() + 1e-12
        np.testing.assert_allclose(
            ours_g, ref_g, atol=6e-3 * scale, rtol=0,
            err_msg=f"grad {path}",
        )

    det = jax.device_get(
        jax.jit(functools.partial(model.apply, train=False))(
            {"params": params}, images
        )
    )
    tres = oracle.inference(timgs, [tuple(x) for x in hw.tolist()])
    for i in range(2):
        tb_i, ts_i, tc_i = (x.numpy() for x in tres[i])
        valid = np.asarray(det.valid[i])
        assert valid.sum() == tb_i.shape[0]
        np.testing.assert_array_equal(np.asarray(det.classes[i])[valid], tc_i)
        np.testing.assert_allclose(
            np.asarray(det.scores[i])[valid], ts_i, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(det.boxes[i])[valid], tb_i, atol=5e-3
        )


def test_full_network_multiblock_depth_matches_torch_oracle():
    """Depth 26 = (2, 2, 2, 2) blocks: exercises the IDENTITY-shortcut
    bottlenecks (block1 of every stage — absent at depth 14, where every
    block carries a projection shortcut) and the multi-block d2 naming
    (backbone.res2.1.*, roi_heads.res5.1.*) through the weight-translation
    and both forwards. Losses + inference; the depth-14 cases carry the
    gradient checks."""
    model = GeneralizedRCNN(
        num_classes=NUM_CLASSES,
        depth=26,
        stem_out_channels=8,
        res2_out_channels=16,
        width_per_group=4,
        freeze_at=0,
        rpn_pre_nms_topk=(PRE_NMS, PRE_NMS),
        rpn_post_nms_topk=(POST_NMS, POST_NMS),
        rpn_batch_per_image=RPN_BATCH,
        roi_batch_per_image=ROI_BATCH,
        test_candidate_topk=POST_NMS * NUM_CLASSES,
        cls_dropout=False,
    )
    oracle = TorchGeneralizedRCNN(
        num_classes=NUM_CLASSES,
        stem_out=8,
        res2_out=16,
        width_per_group=4,
        blocks=(2, 2, 2),
        res5_blocks=2,
        rpn_pre_nms=PRE_NMS,
        rpn_post_nms=POST_NMS,
        rpn_batch=RPN_BATCH,
    )
    images, gt, canvas, hw, gt_boxes, gt_classes, gt_valid = _inputs(False)
    params, state = _shared_state(model, images, gt)
    assert any(".1.conv1.weight" in k for k in state), (
        "multi-block naming not exercised"
    )
    _load_oracle(oracle, state)

    timgs = torch.from_numpy(canvas.transpose(0, 3, 1, 2))
    tb, tc = _torch_gt(gt_boxes, gt_classes, gt_valid)
    tlosses = oracle.losses(timgs, [tuple(x) for x in hw.tolist()], tb, tc)

    losses_j = jax.device_get(
        model.apply(
            {"params": params}, images, gt, train=True,
            rngs={
                "sampling": jax.random.PRNGKey(11),
                "dropout": jax.random.PRNGKey(12),
            },
        )
    )
    for k in ("loss_rpn_cls", "loss_rpn_loc", "loss_cls", "loss_box_reg"):
        np.testing.assert_allclose(
            float(losses_j[k]), float(tlosses[k].detach()),
            rtol=3e-3, atol=2e-6, err_msg=k,
        )

    det = jax.device_get(
        jax.jit(functools.partial(model.apply, train=False))(
            {"params": params}, images
        )
    )
    tres = oracle.inference(timgs, [tuple(x) for x in hw.tolist()])
    for i in range(2):
        tb_i, ts_i, tc_i = (x.numpy() for x in tres[i])
        valid = np.asarray(det.valid[i])
        assert valid.sum() == tb_i.shape[0]
        np.testing.assert_array_equal(np.asarray(det.classes[i])[valid], tc_i)
        np.testing.assert_allclose(
            np.asarray(det.scores[i])[valid], ts_i, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(det.boxes[i])[valid], tb_i, atol=5e-3
        )
