"""Module-zoo numerics: sinkhorn constraints + gradcheck-style gradient
test (the reference's only numeric unit test, my_module.py:1252-1328),
label smoothing, KD/dandr losses vs torch re-implementations."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from fewshotobjectdetection_imporove_via_text_feature_tpu.models.modules_zoo import (
    contrastive_loss,
    label_smoothing_cross_entropy,
    label_smoothing_loss,
    loss_fn_kd,
    memory_bank_update,
    optimal_transport,
    sim_matrix,
    sinkhorn,
)
from fewshotobjectdetection_imporove_via_text_feature_tpu.utils.kdloss import (
    dandr_loss,
)

torch = pytest.importorskip("torch")


def test_sinkhorn_satisfies_marginals():
    rng = np.random.RandomState(0)
    M = jnp.asarray(rng.rand(2, 5, 7), jnp.float32)
    r = jnp.asarray(rng.rand(2, 5) + 0.1)
    c = jnp.asarray(rng.rand(2, 7) + 0.1)
    P = sinkhorn(M, r, c, gamma=10.0, maxiters=500)
    rn = np.asarray(r / r.sum(1, keepdims=True))
    cn = np.asarray(c / c.sum(1, keepdims=True))
    np.testing.assert_allclose(np.asarray(P.sum(2)), rn, atol=1e-4)
    np.testing.assert_allclose(np.asarray(P.sum(1)), cn, atol=1e-4)


def test_sinkhorn_gradcheck_vs_numeric():
    """Finite-difference check of the unrolled sinkhorn gradient
    (analogue of the reference's torch.autograd.gradcheck run)."""
    rng = np.random.RandomState(1)
    M0 = rng.rand(1, 3, 4).astype(np.float64)

    with jax.enable_x64():

        def f(M):
            return jnp.sum(
                sinkhorn(M, None, None, gamma=2.0, maxiters=200) ** 2
            )

        g = np.asarray(jax.grad(f)(jnp.asarray(M0)))
        eps = 1e-6
        for i in range(3):
            for j in range(4):
                Mp = M0.copy(); Mp[0, i, j] += eps
                Mm = M0.copy(); Mm[0, i, j] -= eps
                num = (
                    float(f(jnp.asarray(Mp))) - float(f(jnp.asarray(Mm)))
                ) / (2 * eps)
                assert abs(num - g[0, i, j]) < 1e-6, (i, j, num, g[0, i, j])


def test_optimal_transport_approx_grad_direction():
    rng = np.random.RandomState(2)
    M = jnp.asarray(rng.rand(1, 4, 4), jnp.float32)

    def f(M):
        return jnp.sum(optimal_transport(M, None, None, 1.0, 100, False) ** 2)

    g = jax.grad(f)(M)
    # approx gradient: -gamma * P * dJdP = -gamma * P * 2P <= 0 everywhere
    assert np.all(np.asarray(g) <= 0)


def test_label_smoothing_vs_torch():
    rng = np.random.RandomState(3)
    logits = rng.randn(6, 5).astype(np.float32)
    target = rng.randint(0, 5, 6)

    lt = torch.tensor(logits)
    tt = torch.tensor(target)
    # LabelSmoothingLoss reference formula
    smoothing = 0.2
    logp = torch.log_softmax(lt, dim=1)
    true = torch.full_like(logp, smoothing / 4)
    true.scatter_(1, tt.unsqueeze(1), 1 - smoothing)
    ref = torch.mean(torch.sum(-true * logp, dim=1))
    got = label_smoothing_loss(jnp.asarray(logits), jnp.asarray(target), 0.2)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)

    # epsilon=0 reduces to plain CE for the CrossEntropy variant
    ce = torch.nn.functional.cross_entropy(lt, tt)
    got2 = label_smoothing_cross_entropy(
        jnp.asarray(logits), jnp.asarray(target), epsilon=0.0
    )
    np.testing.assert_allclose(float(got2), float(ce), rtol=1e-5)


def test_loss_fn_kd_vs_torch():
    rng = np.random.RandomState(4)
    s = rng.randn(8, 6).astype(np.float32)
    t = rng.randn(8, 6).astype(np.float32)
    y = rng.randint(0, 6, 8)
    T, alpha = 4.0, 0.7
    st, tt, yt = torch.tensor(s), torch.tensor(t), torch.tensor(y)
    ref = torch.nn.KLDivLoss()(
        torch.log_softmax(st / T, dim=1), torch.softmax(tt / T, dim=1)
    ) * (alpha * T * T) + torch.nn.functional.cross_entropy(st, yt) * (1 - alpha)
    got = loss_fn_kd(jnp.asarray(s), jnp.asarray(y), jnp.asarray(t), alpha, T)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-4)


def test_dandr_loss_finite_and_positive():
    rng = np.random.RandomState(5)
    s = jnp.asarray(rng.randn(10, 7), jnp.float32)
    t = jnp.asarray(rng.randn(10, 7), jnp.float32)
    y = jnp.asarray(rng.randint(0, 7, 10))
    out = float(dandr_loss(s, t, y, alpha=1.0, beta=1.0, temperature=2.0))
    assert np.isfinite(out)
    assert out >= 0


def test_memory_bank_update_blends():
    mem = jnp.zeros((3, 4, 8))
    fixed = jnp.ones((5, 8))
    inst = jnp.full((2, 8), 2.0)
    classes = jnp.asarray([1, 1])
    new = memory_bank_update(mem, inst, classes, fixed, num_classes=3, k=0.5)
    new = np.asarray(new)
    # class 0 and 2 untouched
    assert (new[0] == 0).all() and (new[2] == 0).all()
    # class 1 slots 0..1 = 0.5*2 + 0.5*1 = 1.5; slots 2..3 = 0.5*0 + 0.5*1
    np.testing.assert_allclose(new[1][:2], 1.5)
    np.testing.assert_allclose(new[1][2:], 0.5)


def test_contrastive_loss_prefers_own_class():
    rng = np.random.RandomState(6)
    mem = jnp.asarray(rng.randn(3, 4, 8), jnp.float32)
    x_pos = np.asarray(mem[1]).mean(axis=0, keepdims=True)
    loss_aligned = float(
        contrastive_loss(jnp.asarray(x_pos), jnp.asarray([1]), mem)
    )
    loss_mis = float(
        contrastive_loss(jnp.asarray(x_pos), jnp.asarray([2]), mem)
    )
    assert loss_aligned < loss_mis


def test_sim_matrix():
    a = jnp.asarray([[1.0, 0.0], [0.0, 2.0]])
    out = np.asarray(sim_matrix(a, a))
    np.testing.assert_allclose(out, np.eye(2), atol=1e-6)


def test_optimal_transport_full_block_grads_match_unrolled():
    """The 'full' and 'block' implicit gradients (DDN KKT solves, ref
    OptimalTransportFcn my_module.py:236-329) must equal the true gradient
    — computed here by backprop through a fully-converged sinkhorn unroll —
    for dJ/dM, dJ/dr and dJ/dc; 'full' and 'block' must agree with each
    other to numerical precision (mirrors the reference's __main__
    gradcheck at my_module.py:1252-1328)."""
    import jax

    rng = np.random.RandomState(0)
    b, h, w = 2, 5, 7
    M = jnp.asarray(rng.uniform(0.1, 1.0, (b, h, w)), jnp.float32)
    r = jnp.asarray(rng.uniform(0.5, 1.5, (b, h)), jnp.float32)
    c = jnp.asarray(rng.uniform(0.5, 1.5, (b, w)), jnp.float32)
    w0 = jnp.asarray(rng.randn(b, h, w), jnp.float32)
    gamma, iters = 2.0, 3000

    def loss_unrolled(M, r, c):
        return jnp.sum(sinkhorn(M, r, c, gamma, iters) * w0)

    def loss_implicit(method):
        def f(M, r, c):
            return jnp.sum(
                optimal_transport(M, r, c, gamma, iters, False, method) * w0
            )
        return f

    g_true = jax.grad(loss_unrolled, argnums=(0, 1, 2))(M, r, c)
    g_full = jax.grad(loss_implicit("full"), argnums=(0, 1, 2))(M, r, c)
    g_block = jax.grad(loss_implicit("block"), argnums=(0, 1, 2))(M, r, c)

    for name, t, f_, bl in zip(
        ("dM", "dr", "dc"), g_true, g_full, g_block
    ):
        scale = float(jnp.max(jnp.abs(t))) + 1e-8
        np.testing.assert_allclose(
            np.asarray(f_), np.asarray(t), atol=5e-3 * scale, err_msg=f"full {name}"
        )
        np.testing.assert_allclose(
            np.asarray(bl), np.asarray(t), atol=5e-3 * scale, err_msg=f"block {name}"
        )
        np.testing.assert_allclose(
            np.asarray(f_), np.asarray(bl), atol=1e-4 * scale,
            err_msg=f"full vs block {name}",
        )


def test_optimal_transport_approx_zero_rc_grads():
    """'approx' returns zero (not garbage) gradients for provided r/c,
    like the reference's zero-initialized dJdr/dJdc (my_module.py:231)."""
    import jax

    rng = np.random.RandomState(1)
    M = jnp.asarray(rng.uniform(0.1, 1.0, (1, 4, 6)), jnp.float32)
    r = jnp.asarray(rng.uniform(0.5, 1.5, (1, 4)), jnp.float32)
    c = jnp.asarray(rng.uniform(0.5, 1.5, (1, 6)), jnp.float32)
    _, dr, dc = jax.grad(
        lambda M, r, c: jnp.sum(
            optimal_transport(M, r, c, 1.0, 50, False, "approx") ** 2
        ),
        argnums=(0, 1, 2),
    )(M, r, c)
    assert not np.any(np.asarray(dr)) and not np.any(np.asarray(dc))


def test_feature_generator_near_identity_init():
    """ref init_weights (my_module.py:986-991): mlp weights start as
    eye(out, in) + N(0, 0.02), so the (2C->C) layer initially passes the
    x half of cat(x, z) through — generated features begin near the real
    feature, not at relu-squashed noise."""
    from fewshotobjectdetection_imporove_via_text_feature_tpu.models.modules_zoo import (
        FeatureGenerator,
    )

    c = 32
    m = FeatureGenerator(input_size=c, repeat_time=2)
    x = np.random.RandomState(0).randn(4, c).astype(np.float32)
    v = m.init(
        {"params": jax.random.PRNGKey(0),
         "generator": jax.random.PRNGKey(1)},
        jnp.asarray(x), jnp.zeros(4, jnp.int32),
    )
    k0 = np.asarray(v["params"]["mlp0"]["kernel"])  # (2c, c), flax (in,out)
    noise0 = k0 - np.eye(2 * c, c)
    assert abs(noise0.mean()) < 0.01
    assert 0.005 < noise0.std() < 0.05
    k1 = np.asarray(v["params"]["mlp1"]["kernel"])
    assert np.abs(np.diag(k1) - 1.0).mean() < 0.1
