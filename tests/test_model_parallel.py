"""ZeRO-style model-parallel sharding (TPU.MODEL_PARALLEL) — optional
headroom beyond the reference's DP-only surface (SURVEY.md §2.3): large
params + optimizer state live 1/M-sharded over a second mesh axis; GSPMD
all-gathers at use and reduce-scatters the grads. Losses must be identical
to pure DP (only the layout differs)."""

import functools

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from fewshotobjectdetection_imporove_via_text_feature_tpu.parallel import (
    get_mesh,
    init_sharded,
    param_partition_spec,
    replicate,
    shard_batch,
    shard_params,
)


def test_param_partition_spec_rules():
    # shard the largest divisible dim; ties -> LAST (conv output channels)
    assert param_partition_spec((3, 3, 512, 512), 2, min_size=1) == P(
        None, None, None, "model"
    )
    assert param_partition_spec((2048, 21), 2, min_size=1) == P("model", None)
    # indivisible largest dim: fall back to the biggest divisible one
    assert param_partition_spec((21, 2048), 2, min_size=1) == P(None, "model")
    # nothing divisible -> replicated
    assert param_partition_spec((21, 5), 2, min_size=1) == P()
    # small tensors stay replicated regardless
    assert param_partition_spec((512,), 2) == P()
    # model=1 -> replicated
    assert param_partition_spec((3, 3, 512, 512), 1, min_size=1) == P()


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_zero_step_matches_dp():
    """One full train step (fwd+bwd+SGD) on a (4, 2) data x model mesh with
    sharded params must produce the same losses as the 8-way DP step."""
    import optax

    from fewshotobjectdetection_imporove_via_text_feature_tpu.engine.trainer import (
        make_train_step,
    )
    from tests.test_model_smoke import tiny_batch, tiny_model

    model = tiny_model()
    images, gt = tiny_batch(b=8)
    rngs = {
        "params": jax.random.PRNGKey(0),
        "sampling": jax.random.PRNGKey(1),
    }
    variables = jax.jit(functools.partial(model.init, train=True))(
        rngs, images, gt
    )
    tx = optax.sgd(1e-3, momentum=0.9)
    step = jax.jit(make_train_step(model, tx))

    mesh_dp = get_mesh(8)
    with mesh_dp:
        p = replicate(mesh_dp, variables["params"])
        opt = jax.jit(tx.init)(p)
        im, g_ = shard_batch(mesh_dp, (images, gt))
        p_dp, _, losses_dp = step(p, opt, im, g_, jax.random.PRNGKey(3), 0)
        losses_dp = jax.device_get(losses_dp)

    mesh_mp = get_mesh(8, model=2)
    with mesh_mp:
        p = shard_params(mesh_mp, variables["params"], min_size=256)
        # at least one leaf must actually be model-sharded
        specs = {
            jax.tree_util.keystr(k): v.sharding.spec
            for k, v in jax.tree_util.tree_flatten_with_path(p)[0]
        }
        assert any("model" in s for s in specs.values()), specs
        opt = init_sharded(mesh_mp, tx.init, p, min_size=256)
        # optimizer momentum gets the param layout (the HBM win)
        mom = jax.tree_util.tree_leaves(opt[0].trace)
        assert any(
            "model" in leaf.sharding.spec for leaf in mom
        ), [leaf.sharding.spec for leaf in mom]
        # the point of ZeRO: device 0 stores materially less than the
        # full param set
        dev0 = jax.devices()[0]

        def dev0_bytes(tree):
            total = 0
            for leaf in jax.tree_util.tree_leaves(tree):
                for s in leaf.addressable_shards:
                    if s.device == dev0:
                        total += s.data.nbytes
            return total

        full = sum(
            leaf.nbytes for leaf in jax.tree_util.tree_leaves(p)
        )
        assert dev0_bytes(p) < 0.75 * full, (dev0_bytes(p), full)
        assert dev0_bytes(opt[0].trace) < 0.75 * full

        im, g_ = shard_batch(mesh_mp, (images, gt))
        p_mp, _, losses_mp = step(p, opt, im, g_, jax.random.PRNGKey(3), 0)
        losses_mp = jax.device_get(losses_mp)

    for k in losses_dp:
        np.testing.assert_allclose(
            float(losses_mp[k]), float(losses_dp[k]), rtol=2e-4, atol=1e-6,
            err_msg=k,
        )

    # updated params agree too (gather the sharded ones to compare)
    flat_dp = jax.tree_util.tree_leaves(jax.device_get(p_dp))
    flat_mp = jax.tree_util.tree_leaves(jax.device_get(p_mp))
    for a, b in zip(flat_dp, flat_mp):
        np.testing.assert_allclose(a, b, rtol=5e-4, atol=1e-5)


def test_trainer_rejects_inert_parallel_knobs(tmp_path):
    """Fail-loudly contract: a serving-only or indivisible parallelism
    override must not silently train plain DP."""
    from fewshotobjectdetection_imporove_via_text_feature_tpu.engine import (
        Trainer,
    )
    from tests.test_end_to_end import setup_dataset, tiny_cfg

    setup_dataset(str(tmp_path))
    cfg = tiny_cfg(tmp_path)
    cfg.TPU.SPATIAL_PARTITION = 2
    with pytest.raises(ValueError, match="SPATIAL_PARTITION"):
        Trainer(cfg)

    cfg = tiny_cfg(tmp_path)
    cfg.TPU.MODEL_PARALLEL = len(jax.devices()) + 1
    with pytest.raises(ValueError, match="MODEL_PARALLEL"):
        Trainer(cfg)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
def test_trainer_model_parallel_end_to_end(tmp_path):
    """Trainer with TPU.MODEL_PARALLEL=2: trains, checkpoints, resumes —
    and the resumed state keeps the model-sharded layout."""
    from fewshotobjectdetection_imporove_via_text_feature_tpu.engine import (
        Trainer,
    )
    from tests.test_end_to_end import setup_dataset, tiny_cfg

    setup_dataset(str(tmp_path))
    cfg = tiny_cfg(tmp_path)
    cfg.TPU.MODEL_PARALLEL = 2
    cfg.SOLVER.MAX_ITER = 2
    cfg.SOLVER.CHECKPOINT_PERIOD = 2

    trainer = Trainer(cfg)
    assert dict(
        zip(trainer.mesh.axis_names, trainer.mesh.devices.shape)
    )["model"] == 2
    specs = [
        leaf.sharding.spec
        for leaf in jax.tree_util.tree_leaves(trainer.params)
    ]
    assert any("model" in s for s in specs)
    params = trainer.train()
    assert all(
        np.all(np.isfinite(leaf))
        for leaf in jax.tree_util.tree_leaves(jax.device_get(params))
    )

    # the steady-state layout must survive the train steps: the jitted
    # step pins its outputs (Trainer._jit_step) so GSPMD can't silently
    # flip the updated params back to replicated
    assert any(
        "model" in leaf.sharding.spec
        for leaf in jax.tree_util.tree_leaves(params)
    )

    # evaluation consumes the model-sharded params through the PRODUCTION
    # path (cli.do_test uses a local 1-D eval mesh when ndev>1):
    # replicate() must reshard the 2-D model-sharded leaves onto it
    from fewshotobjectdetection_imporove_via_text_feature_tpu.data import (
        build_detection_test_loader,
    )
    from fewshotobjectdetection_imporove_via_text_feature_tpu.evaluation import (
        PascalVOCDetectionEvaluator,
        inference_on_dataset,
    )

    loader = build_detection_test_loader(
        cfg, cfg.DATASETS.TEST[0], batch_size=2
    )
    res = inference_on_dataset(
        trainer.model, params, loader,
        PascalVOCDetectionEvaluator(cfg.DATASETS.TEST[0]),
        mesh=get_mesh(2, local=True),
    )
    assert np.isfinite(res["bbox"]["AP50"])

    trainer2 = Trainer(cfg)
    trainer2.resume_or_load(resume=True)
    assert trainer2.start_iter == cfg.SOLVER.MAX_ITER
    specs2 = [
        leaf.sharding.spec
        for leaf in jax.tree_util.tree_leaves(trainer2.params)
    ]
    assert specs2 == specs
    # restored values == saved values, bit-exact through the host roundtrip
    a = jax.tree_util.tree_leaves(jax.device_get(params))
    b = jax.tree_util.tree_leaves(jax.device_get(trainer2.params))
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
