"""FULL-NETWORK numeric parity for GeneralizedTextAttRCNN — the pixel-token
attention fusion meta-arch (ref rcnn.py:454-520) — vs the plain-torch
oracle (tests/torch_oracle.py::TorchGeneralizedTextAttRCNN), with BOTH
attention cores running the reference's OWN exec'd torch modules:

  * the pixel fusion: SingleHeadSiameseAttention over H*W tokens
    (q = vis, k = LtoVproj(text map), v = attproj(cat(vis, text)));
  * the ROI teacher: LV_attention (as in the text-family oracle).

The reference's TextAtt ``add_semantic_features`` is dead code as written
(undefined ``self.semantic_features``; (output, attn) tuple .view crash;
transposed paint indices; last-class background — see the oracle class
docstring and PARITY #14); both our build and the oracle implement the
repaired semantics: the Text family's paint + the intended fusion wiring,
with the attention math verbatim from the reference's module.

VERDICT r4 task 4: the fifth (and last) meta-arch family gets the
losses/grads/painted-inference treatment — the class of cross-module
wiring drift the round-4 text oracle proved piecewise tests cannot catch.
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
from fewshotobjectdetection_imporove_via_text_feature_tpu.models.text_heads import (
    GeneralizedTextAttRCNN,
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
from tests.test_full_network_text_oracle import (
    KL_TEMP,
    LOSS_KEYS,
    SEM_DIM,
    _lv_params_from_torch,
    _ref_attention,
)
from tests.test_reference_oracles import _lv_ns, _siamese_params_from_torch
from tests.torch_oracle import TorchGeneralizedTextAttRCNN

C4 = 16 * 4  # res4 channels at res2_out=16


def _ref_pixel_attention():
    """The reference's SingleHeadSiameseAttention (attentive_modules.py:
    78-178) exec'd at the TextAtt construction point (rcnn.py:460:
    as-constructed init, no _init_parameters re-init)."""
    ns = _lv_ns(object, object)  # GloVe/Metadata untouched by this class
    torch.manual_seed(13)
    pix = ns["SingleHeadSiameseAttention"](C4)
    pix.eval()  # dropout 0.0 anyway
    return pix


def _build_pair():
    ref_att, bank = _ref_attention()
    pix_att = _ref_pixel_attention()
    model = GeneralizedTextAttRCNN(
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
        roi_heads_name="TextRes5ROIHeads",
        class_embed=bank,
        semantic_dim=SEM_DIM,
        kl_temp=KL_TEMP,
        distill_l2=True,
        distill_kl=True,
    )
    oracle = TorchGeneralizedTextAttRCNN(
        num_classes=NUM_CLASSES,
        stem_out=8,
        res2_out=16,
        width_per_group=4,
        blocks=(1, 1, 1),
        res5_blocks=1,
        rpn_pre_nms=PRE_NMS,
        rpn_post_nms=POST_NMS,
        rpn_batch=RPN_BATCH,
        class_embed=bank,
        attention=ref_att,
        pixel_attention=pix_att,
        kl_temp=KL_TEMP,
    )
    return model, oracle, ref_att, pix_att


def _shared_textatt_state(model, oracle, ref_att, pix_att, images, gt):
    """Init flax, perturb, splice BOTH exec'd torch attention modules into
    the flax tree, transfer the remaining text modules, load the flagship
    surface via the d2 naming. Returns flax params; oracle is ready."""
    rngs = {
        "params": jax.random.PRNGKey(0),
        "sampling": jax.random.PRNGKey(1),
        "dropout": jax.random.PRNGKey(2),
    }
    variables = model.init(rngs, images, gt, train=True)
    params = _perturb(jax.device_get(variables["params"]))

    # both torch attention modules' tensors become OUR params
    params["roi_heads"]["attention"] = jax.tree_util.tree_map(
        np.asarray, _lv_params_from_torch(ref_att)
    )
    params["pixel_attention"] = jax.tree_util.tree_map(
        np.asarray, _siamese_params_from_torch(pix_att)
    )

    # flagship surface through the d2 naming contract
    state, exported, skipped = export_d2_state(params)
    assert {s.split("/")[0] for s in skipped} <= {
        "bg_feature", "LtoVproj", "attproj", "pixel_attention", "roi_heads"
    }, skipped
    for s in skipped:  # only text/fusion modules may lack a d2 name
        assert (
            s.startswith(("bg_feature", "LtoVproj", "attproj",
                          "pixel_attention"))
            or s.startswith(("roi_heads/attention", "roi_heads/mlp_adapter"))
        ), s
    tstate = {
        k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in state.items()
    }
    missing, unexpected = oracle.load_state_dict(tstate, strict=False)
    assert not unexpected, unexpected

    # remaining text/fusion modules: flax -> torch
    def copy_linear(tmod, fparams):
        tmod.weight.copy_(
            torch.from_numpy(np.ascontiguousarray(fparams["kernel"].T))
        )
        tmod.bias.copy_(torch.from_numpy(fparams["bias"]))

    with torch.no_grad():
        oracle.bg_feature.copy_(torch.from_numpy(params["bg_feature"]))
        copy_linear(oracle.LtoVproj, params["LtoVproj"])
        copy_linear(oracle.attproj, params["attproj"])
        mlp = params["roi_heads"]["mlp_adapter"]
        for tl, fl in ((0, "layers_0"), (2, "layers_2")):
            copy_linear(oracle.roi_heads.mlp_adapter[tl], mlp[fl])
    # to_rpn_input_proj stays RANDOM on the torch side and absent on the
    # flax side (never created lazily): if either implementation
    # accidentally routed through it, parity below would break.
    return params


def test_textatt_full_network_train_losses_and_grads_match_torch_oracle():
    model, oracle, ref_att, pix_att = _build_pair()
    images, gt, canvas, hw, gt_boxes, gt_classes, gt_valid = _inputs(False)
    params = _shared_textatt_state(
        model, oracle, ref_att, pix_att, images, gt
    )

    timgs = torch.from_numpy(canvas.transpose(0, 3, 1, 2))
    tb, tc = _torch_gt(gt_boxes, gt_classes, gt_valid)
    tlosses = oracle.losses(timgs, [tuple(x) for x in hw.tolist()], tb, tc)
    total_t = sum(tlosses.values())
    total_t.backward()

    def loss_fn(p):
        losses = model.apply(
            {"params": p}, images, gt, train=True,
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

    assert set(LOSS_KEYS) <= {
        k for k in losses_j if not k.startswith("metric/")
    }
    for k in LOSS_KEYS:
        np.testing.assert_allclose(
            float(losses_j[k]), float(tlosses[k].detach()),
            rtol=3e-3, atol=2e-5, err_msg=k,
        )

    # gradient parity: the pixel-fusion modules (this arch's new wiring)
    # plus representative teacher/student/stem parameters
    flat_grads = traverse_util.flatten_dict(jax.device_get(grads))

    def tgrad(t):
        return t.grad.detach().numpy()

    checks = [
        (("bg_feature",), tgrad(oracle.bg_feature)),
        (("LtoVproj", "kernel"), tgrad(oracle.LtoVproj.weight).T),
        (("attproj", "kernel"), tgrad(oracle.attproj.weight).T),
        (
            ("pixel_attention", "w_q", "kernel"),
            tgrad(pix_att.w_q.weight).T,
        ),
        (
            ("pixel_attention", "dummy",),
            tgrad(pix_att.dummy),
        ),
        (
            ("pixel_attention", "ffn", "norm3", "scale"),
            tgrad(pix_att.ffn.norm3.weight),
        ),
        (
            ("roi_heads", "attention", "proj2", "kernel"),
            tgrad(ref_att.proj2.weight).T,
        ),
        (
            ("roi_heads", "mlp_adapter", "layers_0", "kernel"),
            tgrad(oracle.roi_heads.mlp_adapter[0].weight).T,
        ),
    ]
    for path, ref_g in checks:
        ours_g = np.asarray(flat_grads[path])
        scale = np.abs(ref_g).max() + 1e-12
        np.testing.assert_allclose(
            ours_g, ref_g, atol=6e-3 * scale, rtol=0,
            err_msg=f"grad {'/'.join(map(str, path))}",
        )
    # flagship params still translate through the d2 naming for grads too
    for path in (
        ("backbone", "stem_conv1", "kernel"),
        ("roi_heads", "stu_box_predictor", "cls_score", "kernel"),
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
    # the unused concat/proj fusion of the parent arch must stay unused:
    # its torch params got no gradient (and the flax tree never made them)
    assert oracle.to_rpn_input_proj.weight.grad is None
    assert "to_rpn_input_proj" not in params


def test_textatt_full_network_painted_inference_matches_torch_oracle():
    model, oracle, ref_att, pix_att = _build_pair()
    images, gt, canvas, hw, gt_boxes, gt_classes, gt_valid = _inputs(False)
    params = _shared_textatt_state(
        model, oracle, ref_att, pix_att, images, gt
    )

    det = jax.device_get(
        jax.jit(functools.partial(model.apply, train=False))(
            {"params": params}, images, gt
        )
    )
    timgs = torch.from_numpy(canvas.transpose(0, 3, 1, 2))
    tb, tc = _torch_gt(gt_boxes, gt_classes, gt_valid)
    tres = oracle.inference(timgs, [tuple(x) for x in hw.tolist()], tb, tc)

    for i in range(2):
        tb_i, ts_i, tc_i = (x.numpy() for x in tres[i])
        valid = np.asarray(det.valid[i])
        ours_boxes = np.asarray(det.boxes[i])[valid]
        ours_scores = np.asarray(det.scores[i])[valid]
        ours_classes = np.asarray(det.classes[i])[valid]
        assert ours_boxes.shape[0] == tb_i.shape[0], (
            f"det count {ours_boxes.shape[0]} vs {tb_i.shape[0]} (img {i})"
        )
        np.testing.assert_array_equal(ours_classes, tc_i)
        np.testing.assert_allclose(ours_scores, ts_i, atol=2e-5)
        np.testing.assert_allclose(ours_boxes, tb_i, atol=5e-3)
