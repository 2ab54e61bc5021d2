"""Numerical parity against the reference's OWN torch code, executed as
oracles.

The reference modules can't be imported directly (detectron2/torchnlp are
absent, device strings say 'cuda'), but their math is pure torch: we exec
the exact class sources read from /root/reference at test time — with
sys.modules stubs for the absent deps and a mechanical 'cuda'->'cpu'
device redirection — then drive reference module and our flax module with
IDENTICAL weights and inputs and require matching outputs/gradients.

Covers:
  * SingleHeadSiameseAttention + FFN (attentive_modules.py:36-177) — the
    attention core under every text head;
  * LV_attention (attentive_modules.py:297-437) — the teacher-forcing
    flagship (GloVe stubbed with deterministic vectors fed to both sides);
  * OptimalTransportFcn (my_module.py:185-329) — forward P and the
    implicit backward in all three gradient modes (approx/full/block)
    for dJ/dM, dJ/dr, dJ/dc.
"""

import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

REF = "/root/reference/defrcn/modeling/roi_heads"

needs_ref = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference source not available"
)


# ---------------------------------------------------------------------------
# oracle loaders
# ---------------------------------------------------------------------------
def _attention_ns(extra_src_end=None):
    """Exec attentive_modules.py classes up to `extra_src_end` (exclusive
    marker string) in an isolated namespace."""
    src = open(os.path.join(REF, "attentive_modules.py")).read()
    start = src.index("class ScaledDotProductAttention")
    end = src.index(extra_src_end or "class SematicProposalAttention")
    segment = src[start:end]
    segment = segment.replace("'cuda'", "'cpu'").replace(".cuda()", ".cpu()")
    import torch.nn.functional as F
    from torch import nn

    ns = {"torch": torch, "nn": nn, "F": F, "np": np}
    exec(compile(segment, "ref_attentive_modules", "exec"), ns)
    return ns


def _lv_ns(stub_glove, stub_metadata):
    """Exec through LV_attention with GloVe/MetadataCatalog stubbed."""
    src = open(os.path.join(REF, "attentive_modules.py")).read()
    start = src.index("class ScaledDotProductAttention")
    end = src.index("class LV_attention_VKV")
    segment = src[start:end]
    segment = segment.replace("'cuda'", "'cpu'").replace(".cuda()", ".cpu()")
    import torch.nn.functional as F
    from torch import nn

    # _init_parameters is defined earlier in the file — extract it too
    ip_start = src.index("def _init_parameters")
    ip_end = src.index("class", ip_start)
    ns = {
        "torch": torch, "nn": nn, "F": F, "np": np,
        "GloVe": stub_glove, "MetadataCatalog": stub_metadata,
    }
    exec(compile(src[ip_start:ip_end], "ref_init_parameters", "exec"), ns)
    exec(compile(segment, "ref_attentive_modules", "exec"), ns)
    return ns


def _my_module_ns():
    """Exec my_module.py whole, stubbing detectron2.data."""
    src = open(os.path.join(REF, "my_module.py")).read()
    stub_data = types.ModuleType("detectron2.data")
    stub_data.MetadataCatalog = object()
    stub_data.DatasetCatalog = object()
    stub_d2 = types.ModuleType("detectron2")
    stub_d2.data = stub_data
    saved = {k: sys.modules.get(k) for k in ("detectron2", "detectron2.data")}
    sys.modules["detectron2"] = stub_d2
    sys.modules["detectron2.data"] = stub_data
    try:
        ns = {}
        exec(compile(src, "ref_my_module", "exec"), ns)
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    return ns


# ---------------------------------------------------------------------------
# weight transfer helpers
# ---------------------------------------------------------------------------
def _t(x):
    return np.asarray(x.detach().numpy())


def _siamese_params_from_torch(mod):
    """torch SingleHeadSiameseAttention -> our flax param dict."""
    return {
        "w_q": {"kernel": _t(mod.w_q.weight).T},
        "w_k": {"kernel": _t(mod.w_k.weight).T},
        "w_v": {"kernel": _t(mod.w_v.weight).T},
        "dummy": _t(mod.dummy),
        "linear1": {
            "kernel": _t(mod.linear1[0].weight).T,
            "bias": _t(mod.linear1[0].bias),
        },
        "linear2": {
            "kernel": _t(mod.linear2[0].weight).T,
            "bias": _t(mod.linear2[0].bias),
        },
        "linear3": {
            "kernel": _t(mod.linear3.weight).T,
            "bias": _t(mod.linear3.bias),
        },
        "ffn": {
            "linear1": {
                "kernel": _t(mod.ffn.linear1.weight).T,
                "bias": _t(mod.ffn.linear1.bias),
            },
            "linear2": {
                "kernel": _t(mod.ffn.linear2.weight).T,
                "bias": _t(mod.ffn.linear2.bias),
            },
            "norm3": {
                "scale": _t(mod.ffn.norm3.weight),
                "bias": _t(mod.ffn.norm3.bias),
            },
        },
    }


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------
@needs_ref
def test_siamese_attention_matches_reference():
    from fewshotobjectdetection_imporove_via_text_feature_tpu.models.attention import (
        SingleHeadSiameseAttention,
    )

    ns = _attention_ns()
    torch.manual_seed(0)
    d, b, lq, lk = 32, 2, 5, 4
    ref = ns["SingleHeadSiameseAttention"](d)
    ref.eval()

    rng = np.random.RandomState(1)
    q = rng.randn(b, lq, d).astype(np.float32)
    k = rng.randn(b, lk, d).astype(np.float32)
    v = rng.randn(b, lk, d).astype(np.float32)
    with torch.no_grad():
        out_ref, attn_ref = ref(
            torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v)
        )

    ours = SingleHeadSiameseAttention(d)
    params = {"params": _siamese_params_from_torch(ref)}
    out, attn = ours.apply(
        params, jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)
    )
    np.testing.assert_allclose(
        np.asarray(out), _t(out_ref), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(attn), _t(attn_ref), rtol=1e-4, atol=1e-6
    )


@needs_ref
def test_lv_attention_matches_reference():
    """Teacher-forcing attention: same GloVe stub vectors, same weights
    -> same sim2stext, including the background (label == C) rows."""
    from fewshotobjectdetection_imporove_via_text_feature_tpu.models.attention import (
        LVAttention,
    )

    words = {}

    class StubGloVe:
        def __init__(self, name="6B", dim=300):
            self.dim = dim

        def __getitem__(self, word):
            if word not in words:
                r = np.random.RandomState(  # stable across runs (hash() is salted)
                    __import__("zlib").crc32(word.encode()) % (2**31)
                )
                words[word] = torch.from_numpy(
                    r.randn(self.dim).astype(np.float32)
                )
            return words[word]

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
    torch.manual_seed(0)
    d = 32
    ref = ns["LV_attention"](d, cfg=cfg)
    ref.eval()

    n = 7
    rng = np.random.RandomState(2)
    vis = rng.randn(n, d).astype(np.float32)
    labels = np.array([0, 1, 2, 3, 4, 5, 5])  # 5 == background bucket
    with torch.no_grad():
        _, out_ref = ref(
            torch.from_numpy(vis), torch.from_numpy(labels).long()
        )

    ours = LVAttention(
        input_size=d,
        class_embed=_t(ref.embed),  # identical bank both sides
        text_dim=300,
    )
    params = {
        "params": {
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
    }
    _, out = ours.apply(params, jnp.asarray(vis), jnp.asarray(labels))
    # f32 both sides, but the GloVe-scale embeddings drive a sharp softmax
    # whose tiny logit differences are re-amplified by the FFN LayerNorm —
    # observed max |diff| ~8e-4 on O(1) outputs (pure reduction-order
    # noise; the intermediate text/value features agree to 1e-6).
    np.testing.assert_allclose(
        np.asarray(out["sim2stext"]),
        _t(out_ref["sim2stext"][0]),
        rtol=0,
        atol=3e-3,
    )


@needs_ref
def test_sematic_proposal_attention_matches_reference():
    """ROI-over-embedding-bank attention (attentive_modules.py:191-294):
    same bank (class embeds + bg stub) and weights -> same attention
    scores and sim2stext. The reference computes its bg vector with a
    formula that is NOT actually orthogonal (documented deviation #4), so
    the bank including bg is injected identically into both sides and
    only the math downstream is compared."""
    from fewshotobjectdetection_imporove_via_text_feature_tpu.models.attention import (
        SematicProposalAttention,
    )

    rng = np.random.RandomState(5)
    sem_dim, d, n_cls = 300, 32, 5
    class_embed = rng.randn(n_cls, sem_dim).astype(np.float32)
    bg = rng.randn(1, sem_dim).astype(np.float32)

    src = open(os.path.join(REF, "attentive_modules.py")).read()
    ip_start = src.index("def _init_parameters")
    ip_end = src.index("class", ip_start)
    start = src.index("class ScaledDotProductAttention")
    end = src.index("class LV_attention")
    segment = (
        src[start:end].replace("'cuda'", "'cpu'").replace(".cuda()", ".cpu()")
    )
    import torch.nn.functional as F
    from torch import nn

    ns = {
        "torch": torch, "nn": nn, "F": F, "np": np,
        "get_class_name": lambda cfg: [f"c{i}" for i in range(n_cls)],
        "get_class_embed": lambda names, model, include_bg=False: (
            torch.from_numpy(class_embed)
        ),
        "create_normalized_orthogonal_tensor": lambda avg: (
            torch.from_numpy(bg)
        ),
    }
    exec(compile(src[ip_start:ip_end], "ref_init_parameters", "exec"), ns)
    exec(compile(segment, "ref_attentive_modules", "exec"), ns)

    cfg = types.SimpleNamespace(
        MODEL=types.SimpleNamespace(
            ADDITION=types.SimpleNamespace(NAME="glove"),
            ROI_HEADS=types.SimpleNamespace(NUM_CLASSES=n_cls),
        )
    )
    torch.manual_seed(3)
    ref = ns["SematicProposalAttention"](d, cfg=cfg)
    ref.eval()

    n = 6
    vis = rng.randn(n, d).astype(np.float32)
    with torch.no_grad():
        attn_ref, out_ref = ref(torch.from_numpy(vis))

    ours = SematicProposalAttention(
        input_size=d, class_embed=class_embed, bg_embed=bg
    )
    params = {
        "params": {
            "key_projection": {
                "kernel": _t(ref.key_projection.weight).T,
                "bias": _t(ref.key_projection.bias),
            },
            "value_projection": {
                "kernel": _t(ref.value_projection.weight).T,
                "bias": _t(ref.value_projection.bias),
            },
            "attention": _siamese_params_from_torch(ref.attention),
        }
    }
    attn, out = ours.apply(params, jnp.asarray(vis))
    np.testing.assert_allclose(
        np.asarray(attn), _t(attn_ref), rtol=0, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(out["sim2stext"]),
        _t(out_ref["sim2stext"]),
        rtol=0,
        atol=3e-3,
    )
    np.testing.assert_allclose(
        np.asarray(out["text_feat"]), _t(out_ref["text_feat"]), atol=1e-6
    )


@needs_ref
@pytest.mark.parametrize("method", ["approx", "full", "block"])
@pytest.mark.parametrize("logspace", [False, True])
def test_optimal_transport_matches_reference_backward(method, logspace):
    """Forward P and backward dJ/dM, dJ/dr, dJ/dc vs the reference's
    OptimalTransportFcn (exec'd my_module.py) on the same inputs. The
    oracle runs float64; ours runs float32 — tolerances reflect that."""
    from fewshotobjectdetection_imporove_via_text_feature_tpu.models.modules_zoo import (
        optimal_transport,
    )

    ns = _my_module_ns()
    fcn = ns["OptimalTransportFcn"]

    rng = np.random.RandomState(0)
    b, h, w = 2, 5, 7
    M = rng.uniform(0.1, 1.0, (b, h, w))
    r = rng.uniform(0.5, 1.5, (b, h))
    c = rng.uniform(0.5, 1.5, (b, w))
    w0 = rng.randn(b, h, w)
    gamma, maxiters = 2.0, 2000

    M_t = torch.tensor(M, dtype=torch.float64, requires_grad=True)
    r_t = torch.tensor(r, dtype=torch.float64, requires_grad=True)
    c_t = torch.tensor(c, dtype=torch.float64, requires_grad=True)
    P_ref = fcn.apply(M_t, r_t, c_t, gamma, 1e-9, maxiters, logspace, method)
    (P_ref * torch.tensor(w0)).sum().backward()

    M_j = jnp.asarray(M, jnp.float32)
    r_j = jnp.asarray(r, jnp.float32)
    c_j = jnp.asarray(c, jnp.float32)
    w0_j = jnp.asarray(w0, jnp.float32)

    P = optimal_transport(M_j, r_j, c_j, gamma, maxiters, logspace, method)
    np.testing.assert_allclose(
        np.asarray(P), _t(P_ref), rtol=0, atol=2e-6
    )

    grads = jax.grad(
        lambda M_, r_, c_: jnp.sum(
            optimal_transport(M_, r_, c_, gamma, maxiters, logspace, method)
            * w0_j
        ),
        argnums=(0, 1, 2),
    )(M_j, r_j, c_j)
    for name, ours_g, ref_g in zip(
        ("dM", "dr", "dc"), grads, (M_t.grad, r_t.grad, c_t.grad)
    ):
        ref_np = _t(ref_g)
        scale = np.max(np.abs(ref_np)) + 1e-12
        np.testing.assert_allclose(
            np.asarray(ours_g),
            ref_np,
            atol=2e-3 * scale,
            err_msg=f"{method} {name}",
        )


@needs_ref
def test_gdl_and_affine_match_reference():
    """GDL (identity fwd, grad x lambda bwd) + AffineLayer vs the exec'd
    reference gdl.py (defrcn/modeling/meta_arch/gdl.py:6-38)."""
    from fewshotobjectdetection_imporove_via_text_feature_tpu.models.meta_arch import (
        AffineLayer,
    )
    from fewshotobjectdetection_imporove_via_text_feature_tpu.ops.gdl import (
        decouple_layer,
    )

    src = open(
        "/root/reference/defrcn/modeling/meta_arch/gdl.py"
    ).read()
    from torch import nn
    from torch.autograd import Function

    ns = {"torch": torch, "nn": nn, "Function": Function}
    exec(compile(src, "ref_gdl", "exec"), ns)

    rng = np.random.RandomState(7)
    x = rng.randn(2, 4, 5, 3).astype(np.float32)  # ours NHWC
    lam = 0.75

    # gradient of a nonlinear readout through the decouple layer
    x_t = torch.tensor(
        x.transpose(0, 3, 1, 2), requires_grad=True
    )  # torch NCHW
    y_t = ns["decouple_layer"](x_t, lam)
    (y_t * y_t).sum().backward()
    g_ref = _t(x_t.grad).transpose(0, 2, 3, 1)

    g = jax.grad(
        lambda v: jnp.sum(decouple_layer(v, lam) ** 2)
    )(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(g), g_ref, rtol=1e-6)
    # forward is identity both sides
    np.testing.assert_allclose(
        np.asarray(decouple_layer(jnp.asarray(x), lam)), x
    )

    # AffineLayer with bias: same scale/bias values -> same output
    torch.manual_seed(0)
    ref_aff = ns["AffineLayer"](3, bias=True)
    with torch.no_grad():
        ref_aff.weight.copy_(torch.randn(1, 3, 1, 1))
        ref_aff.bias.copy_(torch.randn(1, 3, 1, 1))
        out_ref = ref_aff(torch.tensor(x.transpose(0, 3, 1, 2)))
    ours = AffineLayer(channels=3, use_bias=True)
    params = {
        "params": {
            "weight": _t(ref_aff.weight).reshape(3),
            "bias": _t(ref_aff.bias).reshape(3),
        }
    }
    out = ours.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(out), _t(out_ref).transpose(0, 2, 3, 1), rtol=1e-6
    )


@needs_ref
def test_loss_fn_kd_only_matches_reference():
    """KD loss with the 1.5x bg weighting vs the reference's actual
    loss_fn_kd_only (exec'd my_module.py:408-437)."""
    from fewshotobjectdetection_imporove_via_text_feature_tpu.models.attention import (
        loss_fn_kd_only,
    )

    ns = _my_module_ns()
    rng = np.random.RandomState(11)
    n, k = 24, 16
    student = rng.randn(n, k).astype(np.float32) * 3
    teacher = rng.randn(n, k).astype(np.float32) * 3
    labels = rng.randint(0, k, n)
    bg = k - 1
    T, alpha = 5.0, 1.0

    ref = ns["loss_fn_kd_only"](
        torch.from_numpy(student),
        torch.from_numpy(labels).long(),
        bg,
        torch.from_numpy(teacher),
        {"alpha": alpha, "temperature": T},
    )
    ours = loss_fn_kd_only(
        jnp.asarray(student), jnp.asarray(labels), bg,
        jnp.asarray(teacher), temperature=T, alpha=alpha,
    )
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


@needs_ref
def test_dandr_loss_matches_reference():
    """DKD-style fg/bg-decomposed loss vs the exec'd reference
    (defrcn/utils/kdloss.py:5-50), values AND student gradient."""
    from fewshotobjectdetection_imporove_via_text_feature_tpu.utils.kdloss import (
        dandr_loss,
    )

    src = open("/root/reference/defrcn/utils/kdloss.py").read()
    import torch.nn.functional as F

    ns = {"torch": torch, "F": F}
    exec(compile(src, "ref_kdloss", "exec"), ns)

    rng = np.random.RandomState(13)
    n, k = 20, 11
    student = rng.randn(n, k).astype(np.float32) * 2
    teacher = rng.randn(n, k).astype(np.float32) * 2
    # mix of fg rows and bg rows (bg = last column)
    labels = np.concatenate([rng.randint(0, k - 1, n - 6), [k - 1] * 6])
    alpha, beta, T = 1.0, 8.0, 4.0

    s_t = torch.tensor(student, requires_grad=True)
    ref = ns["dandr_loss"](
        s_t, torch.from_numpy(teacher), torch.from_numpy(labels).long(),
        alpha, beta, T,
    )
    ref.backward()

    val, grad = jax.value_and_grad(
        lambda s: dandr_loss(
            s, jnp.asarray(teacher), jnp.asarray(labels), alpha, beta, T
        )
    )(jnp.asarray(student))
    np.testing.assert_allclose(float(val), float(ref), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(grad), _t(s_t.grad), rtol=1e-4, atol=1e-7
    )


@needs_ref
def test_zoo_functions_match_reference():
    """sim_matrix / bsim_matrix / blogits_matrix / loss_fn_kd and the two
    label-smoothing losses vs the exec'd reference my_module.py
    (:393-406, :440-469, :939-979)."""
    from fewshotobjectdetection_imporove_via_text_feature_tpu.models import (
        modules_zoo as z,
    )

    ns = _my_module_ns()
    rng = np.random.RandomState(17)

    a = rng.randn(6, 9).astype(np.float32)
    b2 = rng.randn(8, 9).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(z.sim_matrix(jnp.asarray(a), jnp.asarray(b2))),
        _t(ns["sim_matrix"](torch.from_numpy(a), torch.from_numpy(b2))),
        rtol=1e-5, atol=1e-6,
    )

    ab = rng.randn(3, 5, 9).astype(np.float32)
    bb = rng.randn(3, 7, 9).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(z.bsim_matrix(jnp.asarray(ab), jnp.asarray(bb), 2.0)),
        _t(ns["bsim_matrix"](torch.from_numpy(ab), torch.from_numpy(bb), 2.0)),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(z.blogits_matrix(jnp.asarray(ab), jnp.asarray(bb))),
        _t(ns["blogits_matrix"](torch.from_numpy(ab), torch.from_numpy(bb))),
        rtol=1e-5, atol=1e-5,
    )

    n, k = 12, 7
    logits = (rng.randn(n, k) * 2).astype(np.float32)
    teacher = (rng.randn(n, k) * 2).astype(np.float32)
    labels = rng.randint(0, k, n)
    np.testing.assert_allclose(
        float(z.loss_fn_kd(
            jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(teacher),
            alpha=0.7, temperature=3.0,
        )),
        float(ns["loss_fn_kd"](
            torch.from_numpy(logits), torch.from_numpy(labels).long(),
            torch.from_numpy(teacher), {"alpha": 0.7, "temperature": 3.0},
        )),
        rtol=1e-5,
    )

    np.testing.assert_allclose(
        float(z.label_smoothing_cross_entropy(
            jnp.asarray(logits), jnp.asarray(labels), epsilon=0.1
        )),
        float(ns["LabelSmoothingCrossEntropy"](0.1)(
            torch.from_numpy(logits), torch.from_numpy(labels).long()
        )),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        float(z.label_smoothing_loss(
            jnp.asarray(logits), jnp.asarray(labels), smoothing=0.2
        )),
        float(ns["LabelSmoothingLoss"](smoothing=0.2)(
            torch.from_numpy(logits), torch.from_numpy(labels).long()
        )),
        rtol=1e-5,
    )


@needs_ref
def test_contrastive_loss_matches_reference_call_loss3():
    """InfoNCE vs the reference's live branch (contrastive_loss.call_loss3,
    my_module.py:1152-1199): normalize-after-mean positive, top-40 hardest
    negatives, CE at label 0."""
    from fewshotobjectdetection_imporove_via_text_feature_tpu.models.modules_zoo import (
        contrastive_loss,
    )

    src = open(os.path.join(REF, "my_module.py")).read()
    src = src.replace(".cuda()", ".cpu()")
    stub_data = types.ModuleType("detectron2.data")
    stub_data.MetadataCatalog = object()
    stub_data.DatasetCatalog = object()
    stub_d2 = types.ModuleType("detectron2")
    stub_d2.data = stub_data
    saved = {k: sys.modules.get(k) for k in ("detectron2", "detectron2.data")}
    sys.modules["detectron2"] = stub_d2
    sys.modules["detectron2.data"] = stub_data
    try:
        ns = {}
        exec(compile(src, "ref_my_module_cpu", "exec"), ns)
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v

    rng = np.random.RandomState(19)
    n, c, cap, d = 6, 5, 16, 32  # (c-1)*cap = 64 > topk 40
    x = rng.randn(n, d).astype(np.float32)
    y = rng.randint(0, c, n)
    mem = rng.randn(c, cap, d).astype(np.float32)

    ref_mod = ns["contrastive_loss"]()
    ref = ref_mod(
        torch.from_numpy(x), torch.from_numpy(y).long(),
        torch.from_numpy(mem),
    )
    ours = contrastive_loss(
        jnp.asarray(x), jnp.asarray(y), jnp.asarray(mem), tau=ref_mod.tau
    )
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


@needs_ref
def test_memory_bank_update_matches_reference_update4():
    """EMA class-bank update vs the exec'd reference memory_bank.update4
    (my_module.py:657-684): push class instances in front, keep cap,
    blend each slot toward its LEAST-similar fixed anchor with 1-k."""
    from fewshotobjectdetection_imporove_via_text_feature_tpu.models.modules_zoo import (
        memory_bank_update,
    )

    ns = _my_module_ns()
    rng = np.random.RandomState(23)
    c, cap, d, n, m = 4, 6, 12, 10, 15
    mem0 = rng.randn(c, cap, d).astype(np.float32)
    instances = rng.randn(n, d).astype(np.float32)
    # includes the bg bucket (== num_classes) which update4 skips,
    # and one class with MORE instances than cap after concat truncation
    classes = np.array([0, 0, 0, 0, 0, 0, 0, 1, 4, 4])
    fixed = {i: torch.from_numpy(rng.randn(5, d).astype(np.float32))
             for i in range(3)}

    ref_bank = ns["memory_bank"](
        num_classes=c, capacity=cap, input_dim=d, device="cpu", mem=fixed
    )
    with torch.no_grad():
        ref_bank.memory = torch.from_numpy(mem0.copy())
        ref_bank.update4(
            torch.from_numpy(instances), torch.from_numpy(classes).long()
        )
    ref_mem = _t(ref_bank.memory)

    fixed_bank = np.concatenate([v.numpy() for v in fixed.values()], axis=0)
    ours = memory_bank_update(
        jnp.asarray(mem0), jnp.asarray(instances), jnp.asarray(classes),
        jnp.asarray(fixed_bank), num_classes=c, k=0.99,
    )
    np.testing.assert_allclose(np.asarray(ours), ref_mem, rtol=1e-5, atol=1e-6)


@needs_ref
def test_bbox_aug_and_pair_distance_match_reference():
    """augment_bbox / covert_center2_xywh / pair_L2_distance vs the
    exec'd reference (my_module.py:1200-1243)."""
    from fewshotobjectdetection_imporove_via_text_feature_tpu.models.modules_zoo import (
        augment_bbox,
        pair_l2_distance,
    )

    ns = _my_module_ns()
    rng = np.random.RandomState(29)
    for _ in range(5):
        x, y = rng.uniform(0, 200, 2)
        bbox = [x, y, x + rng.uniform(5, 120), y + rng.uniform(5, 120)]
        shape = (320, 240)
        np.testing.assert_allclose(
            np.array(augment_bbox(bbox, shape, 2)),
            np.array(ns["augment_bbox"](bbox, shape, 2)),
            rtol=1e-6,
        )

    f1 = rng.randn(6, 8).astype(np.float32)
    f2 = rng.randn(9, 8).astype(np.float32)
    src = open(os.path.join(REF, "my_module.py")).read()
    # pair_L2_distance calls .cuda(); redirect
    ref_fn_src = src[src.index("def pair_L2_distance"):src.index("# class loss()")]
    ref_fn_src = ref_fn_src.replace(".cuda()", ".cpu()")
    ns3 = {"torch": torch}
    exec(compile(ref_fn_src, "ref_pair_l2", "exec"), ns3)
    np.testing.assert_allclose(
        np.asarray(pair_l2_distance(jnp.asarray(f1), jnp.asarray(f2))),
        _t(ns3["pair_L2_distance"](
            torch.from_numpy(f1), torch.from_numpy(f2)
        )),
        rtol=1e-4, atol=1e-5,
    )


@needs_ref
def test_feature_generator_matches_reference_deterministic():
    """generator (my_module.py:982-1020) vs FeatureGenerator with the
    noise path disabled (std head forced to relu(-1)=0, so z == mean
    exactly on both sides) and identical weights."""
    from fewshotobjectdetection_imporove_via_text_feature_tpu.models.modules_zoo import (
        FeatureGenerator,
    )

    ns = _my_module_ns()
    torch.manual_seed(5)
    c, n, r = 16, 4, 3
    ref = ns["generator"](c)
    with torch.no_grad():
        ref.std_layer[0].weight.zero_()
        ref.std_layer[0].bias.fill_(-1.0)

    rng = np.random.RandomState(31)
    x = rng.randn(n, c).astype(np.float32)
    label = np.arange(n)
    with torch.no_grad():
        out_ref, lab_ref = ref(
            torch.from_numpy(x), torch.from_numpy(label).long(),
            repeat_time=r,
        )

    ours = FeatureGenerator(input_size=c, repeat_time=r)
    params = {
        "params": {
            "mean_layer": {
                "kernel": _t(ref.mean_layer.weight).T,
                "bias": _t(ref.mean_layer.bias),
            },
            "std_layer": {
                "kernel": _t(ref.std_layer[0].weight).T,
                "bias": _t(ref.std_layer[0].bias),
            },
            "mlp0": {"kernel": _t(ref.mlp[0].weight).T},
            "mlp1": {"kernel": _t(ref.mlp[2].weight).T},
        }
    }
    out, lab = ours.apply(
        params, jnp.asarray(x), jnp.asarray(label),
        rngs={"generator": jax.random.PRNGKey(0)},
    )
    np.testing.assert_allclose(
        np.asarray(out), _t(out_ref), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(lab), _t(lab_ref))


@needs_ref
@pytest.mark.parametrize("vkv", [False, True])
def test_lv_textdomination_matches_reference(vkv):
    """Text-space attention (LV_attention_textDomination{,_VKV},
    attentive_modules.py:490-686): attention carried in the 300-d text
    space, vis projected in, output projected back."""
    from fewshotobjectdetection_imporove_via_text_feature_tpu.models.attention import (
        LVAttentionTextDomination,
    )

    words = {}

    class StubGloVe:
        def __init__(self, name="6B", dim=300):
            self.dim = dim

        def __getitem__(self, word):
            if word not in words:
                r = np.random.RandomState(  # stable across runs (hash() is salted)
                    __import__("zlib").crc32(word.encode()) % (2**31)
                )
                words[word] = torch.from_numpy(
                    r.randn(self.dim).astype(np.float32)
                )
            return words[word]

    classes = ["cat", "dog", "diningtable", "pottedplant", "tvmonitor"]

    class StubMeta:
        @staticmethod
        def get(name):
            m = types.SimpleNamespace()
            m.base_classes = classes
            return m

    cfg = types.SimpleNamespace(
        DATASETS=types.SimpleNamespace(TRAIN=("voc_2007_trainval_base1",)),
        MODEL=types.SimpleNamespace(
            ROI_HEADS=types.SimpleNamespace(
                DISTILLATE=False,
                STUDENT_TRAINING=False,
                TEACHER_TRAINING=True,
            )
        ),
    )

    src = open(os.path.join(REF, "attentive_modules.py")).read()
    start = src.index("class ScaledDotProductAttention")
    segment = src[start:]
    segment = segment.replace("'cuda'", "'cpu'").replace(".cuda()", ".cpu()")
    ip_start = src.index("def _init_parameters")
    ip_end = src.index("class", ip_start)
    import torch.nn.functional as F
    from torch import nn

    ns = {
        "torch": torch, "nn": nn, "F": F, "np": np,
        "GloVe": StubGloVe, "MetadataCatalog": StubMeta,
    }
    exec(compile(src[ip_start:ip_end], "ref_init_parameters", "exec"), ns)
    exec(compile(segment, "ref_attentive_modules", "exec"), ns)

    torch.manual_seed(0)
    d = 32
    cls_name = (
        "LV_attention_textDomination_VKV" if vkv
        else "LV_attention_textDomination"
    )
    ref = ns[cls_name](d, cfg=cfg)
    ref.eval()

    n = 7
    rng = np.random.RandomState(2)
    vis = rng.randn(n, d).astype(np.float32)
    labels = np.array([0, 1, 2, 3, 4, 5, 5])
    with torch.no_grad():
        _, out_ref = ref(
            torch.from_numpy(vis), torch.from_numpy(labels).long()
        )

    ours = LVAttentionTextDomination(
        input_size=d, class_embed=_t(ref.embed), text_dim=300, vkv=vkv
    )
    params = {
        "params": {
            "w_bg": _t(ref.w_bg),
            "proj_visual": {
                "kernel": _t(ref.proj_visual.weight).T,
                "bias": _t(ref.proj_visual.bias),
            },
            "proj_value": {
                "kernel": _t(ref.proj_value.weight).T,
                "bias": _t(ref.proj_value.bias),
            },
            "proj2": {
                "kernel": _t(ref.proj2.weight).T,
                "bias": _t(ref.proj2.bias),
            },
            "attention": _siamese_params_from_torch(ref.attention),
        }
    }
    _, out = ours.apply(params, jnp.asarray(vis), jnp.asarray(labels))
    np.testing.assert_allclose(
        np.asarray(out["sim2stext"]),
        _t(out_ref["sim2stext"][0]),
        rtol=0,
        atol=3e-3,
    )
