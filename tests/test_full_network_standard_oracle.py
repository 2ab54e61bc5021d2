"""FULL-NETWORK numeric parity for StandardROIHeads + FastRCNNConvFCHead
(ref roi_heads.py:389-526, box_head.py:17-99) vs the plain-torch oracle
(torch_oracle.py::TorchStandardHeadsRCNN).

The last §2.1 head family without end-to-end evidence (unit-tested only
until round 5; unused by every committed reference config — all run
Res5ROIHeads — but a live registry entry): no res5 in the ROI path, the
raw 7x7 pooled map feeds TWO separate ConvFC towers (cls tower ->
cls_predictor logits, box tower -> box_predictor deltas). The flagship
surface loads through the d2 naming; the towers transfer flax -> torch
manually, including the NHWC-vs-NCHW flatten-order permutation on the
first fc after the pooled map / conv (the exact bug class a wiring
oracle exists to catch).
"""

import functools

import numpy as np
import pytest

import jax

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
from tests.test_full_network_oracle import (
    NUM_CLASSES,
    POST_NMS,
    PRE_NMS,
    ROI_BATCH,
    RPN_BATCH,
    _inputs,
    _perturb,
    _torch_gt,
)
from tests.torch_oracle import TorchStandardHeadsRCNN

NUM_CONV, CONV_DIM, NUM_FC, FC_DIM = 1, 32, 2, 64
POOLER = 7


def _build_pair():
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
        test_candidate_topk=POST_NMS * NUM_CLASSES,
        cls_dropout=False,
        roi_heads_name="StandardROIHeads",
        box_convfc=(NUM_CONV, CONV_DIM, NUM_FC, FC_DIM),
    )
    oracle = TorchStandardHeadsRCNN(
        num_classes=NUM_CLASSES,
        stem_out=8,
        res2_out=16,
        width_per_group=4,
        blocks=(1, 1, 1),
        res5_blocks=1,
        rpn_pre_nms=PRE_NMS,
        rpn_post_nms=POST_NMS,
        rpn_batch=RPN_BATCH,
        num_conv=NUM_CONV,
        conv_dim=CONV_DIM,
        num_fc=NUM_FC,
        fc_dim=FC_DIM,
    )
    return model, oracle


def _copy_tower(ttower, fparams, first_fc_cin):
    """flax FastRCNNConvFCHead params -> torch _ConvFCTower, handling the
    NHWC (flax flattens (P, P, C)) vs NCHW (torch flattens (C, P, P))
    order of the first fc's input."""
    with torch.no_grad():
        for i, conv in enumerate(ttower.convs):
            k = np.asarray(fparams[f"conv{i+1}"]["kernel"])  # (3,3,Cin,Cout)
            conv.weight.copy_(
                torch.from_numpy(np.ascontiguousarray(k.transpose(3, 2, 0, 1)))
            )
            conv.bias.copy_(
                torch.from_numpy(np.asarray(fparams[f"conv{i+1}"]["bias"]))
            )
        for i, fc in enumerate(ttower.fcs):
            k = np.asarray(fparams[f"fc{i+1}"]["kernel"])
            if i == 0:
                # (P*P*C, out) in (h, w, c) order -> (C*P*P, out) in
                # (c, h, w) order
                k = (
                    k.reshape(POOLER, POOLER, first_fc_cin, -1)
                    .transpose(2, 0, 1, 3)
                    .reshape(first_fc_cin * POOLER * POOLER, -1)
                )
            fc.weight.copy_(
                torch.from_numpy(np.ascontiguousarray(k.T))
            )
            fc.bias.copy_(
                torch.from_numpy(np.asarray(fparams[f"fc{i+1}"]["bias"]))
            )


def _shared_state(model, oracle, images, gt):
    rngs = {
        "params": jax.random.PRNGKey(0),
        "sampling": jax.random.PRNGKey(1),
        "dropout": jax.random.PRNGKey(2),
    }
    variables = model.init(rngs, images, gt, train=True)
    params = _perturb(jax.device_get(variables["params"]))

    # flagship surface (backbone/RPN/affines) via the d2 naming; the
    # StandardROIHeads towers have no d2 names in the export contract
    state, exported, skipped = export_d2_state(params)
    assert all(s.startswith("roi_heads/") for s in skipped), skipped
    tstate = {
        k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in state.items()
    }
    missing, unexpected = oracle.load_state_dict(tstate, strict=False)
    assert not unexpected, unexpected

    rh = params["roi_heads"]
    first_cin = CONV_DIM if NUM_CONV else 16 * 4  # conv precedes fc1
    _copy_tower(oracle.roi_heads.cls_head, rh["cls_head"], first_cin)
    _copy_tower(oracle.roi_heads.box_head, rh["box_head"], first_cin)
    with torch.no_grad():
        for pname in ("cls_predictor", "box_predictor"):
            tmod = getattr(oracle.roi_heads, pname)
            for lname in ("cls_score", "bbox_pred"):
                fp = rh[pname][lname]
                lin = getattr(tmod, lname)
                lin.weight.copy_(
                    torch.from_numpy(
                        np.ascontiguousarray(np.asarray(fp["kernel"]).T)
                    )
                )
                lin.bias.copy_(torch.from_numpy(np.asarray(fp["bias"])))
    return params


def test_standard_heads_full_network_losses_grads_and_inference():
    model, oracle = _build_pair()
    images, gt, canvas, hw, gt_boxes, gt_classes, gt_valid = _inputs(False)
    params = _shared_state(model, oracle, images, gt)

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

    # gradients: both towers, both used predictor halves, and the stem
    # (GDL contract through the tower path)
    flat_grads = traverse_util.flatten_dict(jax.device_get(grads))

    def tgrad(t):
        return t.grad.detach().numpy()

    def check(path, ref_g):
        ours_g = np.asarray(flat_grads[path])
        scale = np.abs(ref_g).max() + 1e-12
        np.testing.assert_allclose(
            ours_g, ref_g, atol=6e-3 * scale, rtol=0,
            err_msg=f"grad {'/'.join(map(str, path))}",
        )

    # conv kernels: torch OIHW -> flax HWIO
    check(
        ("roi_heads", "cls_head", "conv1", "kernel"),
        tgrad(oracle.roi_heads.cls_head.convs[0].weight).transpose(2, 3, 1, 0),
    )
    # first fc: invert the flatten-order permutation
    g = tgrad(oracle.roi_heads.box_head.fcs[0].weight).T  # (C*P*P, out)
    g = (
        g.reshape(CONV_DIM, POOLER, POOLER, -1)
        .transpose(1, 2, 0, 3)
        .reshape(POOLER * POOLER * CONV_DIM, -1)
    )
    check(("roi_heads", "box_head", "fc1", "kernel"), g)
    check(
        ("roi_heads", "cls_head", "fc2", "kernel"),
        tgrad(oracle.roi_heads.cls_head.fcs[1].weight).T,
    )
    check(
        ("roi_heads", "cls_predictor", "cls_score", "kernel"),
        tgrad(oracle.roi_heads.cls_predictor.cls_score.weight).T,
    )
    check(
        ("roi_heads", "box_predictor", "bbox_pred", "kernel"),
        tgrad(oracle.roi_heads.box_predictor.bbox_pred.weight).T,
    )
    name, kind = _ours_to_d2(("backbone", "stem_conv1", "kernel"))
    t = dict(oracle.named_parameters())[name]
    check(
        ("backbone", "stem_conv1", "kernel"),
        _convert(t.grad.detach().numpy(), kind),
    )
    # the UNUSED predictor halves must carry no gradient on either side
    assert oracle.roi_heads.cls_predictor.bbox_pred.weight.grad is None
    assert oracle.roi_heads.box_predictor.cls_score.weight.grad is None
    for path in (
        ("roi_heads", "cls_predictor", "bbox_pred", "kernel"),
        ("roi_heads", "box_predictor", "cls_score", "kernel"),
    ):
        assert not np.any(np.asarray(flat_grads[path])), path

    # inference parity
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
