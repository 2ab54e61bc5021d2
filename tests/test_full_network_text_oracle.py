"""FULL-NETWORK numeric parity for the TEXT family — GeneralizedTextRCNN +
TextRes5ROIHeads vs the plain-torch oracle (tests/torch_oracle.py), with
the attention core running the reference's OWN exec'd LV_attention.

Extends test_full_network_oracle.py (flagship) to the fork's flagship
contribution: GT-painted text map -> concat/proj fusion -> RPN -> ROI
sampling -> pooled features -> teacher (teacher-forced LV attention +
predictor) and student (mlp adapter + stu predictor) -> the full 8-loss
dict incl. the KL and feature distillation, plus GT-painted-eval
inference and gradient parity across every text-specific module.

Weight sharing, three routes, all exercised at once:
  * flagship params (backbone/RPN/affines/res5/box+stu predictors):
    export_d2_state -> torch load_state_dict (the d2-naming contract);
  * the attention core: the reference's LV_attention is constructed in
    torch (exec'd source, GloVe stubbed) and its tensors are copied into
    our flax tree — the reference's own torch code IS the oracle here;
  * remaining text modules (bg_feature, to_rpn_input_proj, mlp_adapter):
    explicit flax -> torch transfer.

Documented deviations mirrored by the oracle (see PARITY): #8 detached
distill targets, #3 student-path inference, #12 GT-painted eval, #13
pixel-space zero padding.
"""

import functools
import types

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
from fewshotobjectdetection_imporove_via_text_feature_tpu.models.text_heads import (
    GeneralizedTextRCNN,
)
from tests.test_full_network_oracle import (
    H,
    MAX_GT,
    NUM_CLASSES,
    POST_NMS,
    PRE_NMS,
    ROI_BATCH,
    RPN_BATCH,
    W,
    _inputs,
    _perturb,
    _torch_gt,
)
from tests.test_reference_oracles import _lv_ns, _siamese_params_from_torch, _t
from tests.torch_oracle import TorchGeneralizedTextRCNN

KL_TEMP = 5.0
SEM_DIM = 300


def _ref_attention():
    """The reference's LV_attention (attentive_modules.py:297-437), exec'd
    with GloVe/MetadataCatalog stubbed to deterministic vectors."""
    words = {}

    class StubGloVe:
        def __init__(self, name="6B", dim=300):
            self.dim = dim

        def __getitem__(self, word):
            if word not in words:
                r = np.random.RandomState(
                    __import__("zlib").crc32(word.encode()) % (2**31)
                )
                words[word] = torch.from_numpy(
                    r.randn(self.dim).astype(np.float32)
                )
            return words[word]

    # real VOC names: LV_attention consults a word-mapping table keyed by
    # class name (piecewise oracle uses the same five)
    classes = ["cat", "dog", "diningtable", "pottedplant", "tvmonitor"]

    class StubMeta:
        @staticmethod
        def get(name):
            m = types.SimpleNamespace()
            m.base_classes = classes
            return m

    cfg = types.SimpleNamespace(
        DATASETS=types.SimpleNamespace(TRAIN=("voc_2007_trainval_base1",))
    )
    ns = _lv_ns(StubGloVe, StubMeta)
    torch.manual_seed(7)
    c5 = 16 * 8  # res2_out * 8
    ref = ns["LV_attention"](c5, cfg=cfg)
    ref.eval()  # dropout rates are 0.0 anyway; eval() for determinism
    # Scale the bank into a WELL-CONDITIONED attention regime: GloVe-norm
    # (~17) embeddings drive a near-one-hot softmax whose derivative tails
    # are pure reduction-order noise — unusable for cross-framework
    # gradient comparison. This test pins the WIRING; the attention core
    # at realistic scale is pinned by the piecewise oracle
    # (test_reference_oracles.py) and the generalization gate.
    with torch.no_grad():
        ref.embed = ref.embed * 0.05
        ref.w_bg.mul_(0.05)
    return ref, _t(ref.embed)  # (5, 300) bank shared by both frameworks


def _lv_params_from_torch(ref):
    """torch LV_attention -> our flax LVAttention param subtree (same
    mapping the piecewise oracle test uses)."""
    return {
        "w_bg": _t(ref.w_bg),
        "proj2": {
            "kernel": _t(ref.proj2.weight).T,
            "bias": _t(ref.proj2.bias),
        },
        "proj_k": {
            "kernel": _t(ref.proj_k.weight).T,
            "bias": _t(ref.proj_k.bias),
        },
        "attention": _siamese_params_from_torch(ref.attention),
    }


def _build_pair():
    ref_att, bank = _ref_attention()
    model = GeneralizedTextRCNN(
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
    oracle = TorchGeneralizedTextRCNN(
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
        kl_temp=KL_TEMP,
    )
    return model, oracle, ref_att


def _shared_text_state(model, oracle, ref_att, images, gt):
    """Init flax, perturb, splice the torch attention in, transfer the
    remaining text modules, and load the flagship surface via the d2
    naming. Returns (flax_params, oracle ready)."""
    rngs = {
        "params": jax.random.PRNGKey(0),
        "sampling": jax.random.PRNGKey(1),
        "dropout": jax.random.PRNGKey(2),
    }
    variables = model.init(rngs, images, gt, train=True)
    params = _perturb(jax.device_get(variables["params"]))

    # the torch LV_attention's tensors become OUR attention params
    params["roi_heads"]["attention"] = jax.tree_util.tree_map(
        np.asarray, _lv_params_from_torch(ref_att)
    )

    # flagship surface through the d2 naming contract
    state, exported, skipped = export_d2_state(params)
    assert {s.split("/")[0] for s in skipped} <= {
        "bg_feature", "to_rpn_input_proj", "roi_heads"
    }, skipped
    for s in skipped:  # only text modules may lack a d2 name
        assert (
            s.startswith(("bg_feature", "to_rpn_input_proj"))
            or s.startswith(("roi_heads/attention", "roi_heads/mlp_adapter"))
        ), s
    tstate = {
        k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in state.items()
    }
    missing, unexpected = oracle.load_state_dict(tstate, strict=False)
    assert not unexpected, unexpected

    # remaining text modules: flax -> torch
    with torch.no_grad():
        oracle.bg_feature.copy_(torch.from_numpy(params["bg_feature"]))
        proj = params["to_rpn_input_proj"]
        oracle.to_rpn_input_proj.weight.copy_(
            torch.from_numpy(np.ascontiguousarray(proj["kernel"].T))
        )
        oracle.to_rpn_input_proj.bias.copy_(torch.from_numpy(proj["bias"]))
        mlp = params["roi_heads"]["mlp_adapter"]
        for tl, fl in ((0, "layers_0"), (2, "layers_2")):
            oracle.roi_heads.mlp_adapter[tl].weight.copy_(
                torch.from_numpy(np.ascontiguousarray(mlp[fl]["kernel"].T))
            )
            oracle.roi_heads.mlp_adapter[tl].bias.copy_(
                torch.from_numpy(mlp[fl]["bias"])
            )
    return params


LOSS_KEYS = (
    "loss_rpn_cls", "loss_rpn_loc", "loss_cls", "loss_box_reg",
    "loss_cls_t", "loss_box_reg_t", "loss_kl", "loss_student_feat",
)


def test_text_full_network_train_losses_and_grads_match_torch_oracle():
    model, oracle, ref_att = _build_pair()
    images, gt, canvas, hw, gt_boxes, gt_classes, gt_valid = _inputs(False)
    params = _shared_text_state(model, oracle, ref_att, images, gt)

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

    # gradient parity: every text-specific module + the stem through the
    # paint-fuse wiring and the GDL contract
    flat_grads = traverse_util.flatten_dict(jax.device_get(grads))

    def tgrad(t):
        return t.grad.detach().numpy()

    checks = [
        (("bg_feature",), tgrad(oracle.bg_feature)),
        (
            ("to_rpn_input_proj", "kernel"),
            tgrad(oracle.to_rpn_input_proj.weight).T,
        ),
        (
            ("roi_heads", "attention", "proj2", "kernel"),
            tgrad(ref_att.proj2.weight).T,
        ),
        (
            ("roi_heads", "attention", "attention", "w_q", "kernel"),
            tgrad(ref_att.attention.w_q.weight).T,
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


def test_text_full_network_painted_inference_matches_torch_oracle():
    model, oracle, ref_att = _build_pair()
    images, gt, canvas, hw, gt_boxes, gt_classes, gt_valid = _inputs(False)
    params = _shared_text_state(model, oracle, ref_att, images, gt)

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
