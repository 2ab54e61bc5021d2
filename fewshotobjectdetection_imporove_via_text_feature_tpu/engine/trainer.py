"""Trainer — jit-compiled train step over a data mesh + hook loop.

Replaces the reference's DefaultTrainer/SimpleTrainer stack
(defrcn/engine/defaults.py:131-516): build model/optimizer/loader, resume,
then per iteration run ONE jit-compiled fused step (forward + backward +
SGD update) with the batch sharded over the mesh ``data`` axis. Hooks keep
the reference's contract: IterationTimer -> LRScheduler (inside the step) ->
periodic checkpoint -> periodic eval -> writers.
"""

from __future__ import annotations

import json
import os
import time
from functools import partial
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..checkpoint import Checkpointer
from ..data import build_detection_train_loader
from ..models import build_model
from ..parallel import (
    get_mesh,
    init_sharded,
    place_like,
    replicate,
    shard_batch,
    shard_params,
)
from ..solver import build_optimizer
from ..structures import GTInstances, ImageBatch
from ..utils.events import MetricsLogger


def default_setup(cfg, args=None):
    os.makedirs(cfg.OUTPUT_DIR, exist_ok=True)
    # rank 0 writes the config dump (ref defaults.py:100-120 gates on
    # is_main_process); concurrent writers on a shared OUTPUT_DIR could
    # interleave and corrupt the file
    if jax.process_index() == 0:
        with open(os.path.join(cfg.OUTPUT_DIR, "config.yaml"), "w") as f:
            f.write(cfg.dump())
    # SEED >= 0 is a fixed seed (0 is valid and reproducible); only a
    # negative value draws a random one — ref defaults.py:123
    # seed_all_rng(None if cfg.SEED < 0 else ...).
    seed = cfg.SEED if cfg.SEED >= 0 else int.from_bytes(os.urandom(3), "little")
    return seed


def make_train_step(model, tx, preprocess=None):
    """Returns train_step(params, opt_state, images, gt, rng, step
    [, short, flip]).

    With ``preprocess=(max_size, out_hw)`` the batch arrives as RAW pixels
    and resize/flip fuse into the same jit program
    (TPU.DEVICE_PREPROCESS; data/xla_preprocess.py).
    """

    def _forward(params, images, gt, srng, drng):
        losses = model.apply(
            {"params": params}, images, gt, train=True,
            rngs={"sampling": srng, "dropout": drng},
        )
        # "metric/" entries are stop-gradient training diagnostics
        # (cls accuracy, fg/bg counts, anchor stats — the reference's
        # EventStorage scalars); they ride along for logging but are NOT
        # part of the optimized objective.
        total = sum(
            v for k, v in losses.items() if not k.startswith("metric/")
        )
        return total, losses

    def train_step(params, opt_state, images, gt, rng, step):
        step_rng = jax.random.fold_in(rng, step)
        srng, drng = jax.random.split(step_rng)

        def loss_fn(p):
            return _forward(p, images, gt, srng, drng)

        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        losses["total_loss"] = total
        return params, opt_state, losses

    if preprocess is None:
        return train_step

    max_size, out_hw = preprocess

    def train_step_raw(params, opt_state, images, gt, rng, step, short, flip):
        from ..data.xla_preprocess import device_resize_batch

        resized, _ = device_resize_batch(
            images.image, images.orig_hw, flip, short, max_size, out_hw,
            out_s2d=out_hw[0] % 2 == 0 and out_hw[1] % 2 == 0,
        )
        images = images.replace(image=resized)
        return train_step(params, opt_state, images, gt, rng, step)

    return train_step_raw


class Trainer:
    """End-to-end training driver (DefaultTrainer parity)."""

    def __init__(self, cfg, model=None):
        self.cfg = cfg
        self.model = model if model is not None else build_model(cfg)
        pcount = jax.process_count()
        # Largest device count that divides the global batch (the reference
        # asserts batch % world_size == 0, dataloader/build.py:250-255; we
        # shrink the mesh instead of failing). Under multi-host the mesh is
        # GLOBAL: each process loads its 1/pcount slice of the batch and
        # shard_batch assembles the global array; pjit's gradient psum
        # rides ICI/DCN (reference DDP analog, engine/defaults.py:252-258).
        if pcount > 1 and cfg.SOLVER.IMS_PER_BATCH % pcount:
            raise ValueError(
                f"SOLVER.IMS_PER_BATCH {cfg.SOLVER.IMS_PER_BATCH} must be "
                f"divisible by the process count {pcount}"
            )
        if cfg.TPU.SPATIAL_PARTITION > 1:
            # serving-only knob (DefaultPredictor); accepting it here
            # would silently train plain DP — fail loudly instead
            # (models/build.py convention for inert overrides)
            raise ValueError(
                "TPU.SPATIAL_PARTITION applies to DefaultPredictor "
                "serving only; training parallelism is TPU.MODEL_PARALLEL "
                "+ the data mesh"
            )
        ndev = len(jax.devices())
        mp = cfg.TPU.MODEL_PARALLEL
        if mp > 1:
            # params/opt-state live model-sharded on a (data, model) mesh.
            # Checkpoint save and the resume path reassemble through the
            # host, which needs every shard addressable — single-process
            # only (multi-host ZeRO would need a gather-on-save; the
            # reference has no analog and DP covers multi-host).
            if pcount > 1:
                raise ValueError(
                    "TPU.MODEL_PARALLEL > 1 is single-process only "
                    "(multi-host runs use the pure-DP mesh)"
                )
            if ndev % mp:
                raise ValueError(
                    f"TPU.MODEL_PARALLEL {mp} must divide the device "
                    f"count {ndev}"
                )
            data = ndev // mp
            while cfg.SOLVER.IMS_PER_BATCH % data:
                data -= 1
            self.mesh = get_mesh(data * mp, model=mp)
        elif pcount > 1:
            # no mesh shrinking across processes: every process's local
            # devices must be in the mesh for host-local batch assembly
            if cfg.SOLVER.IMS_PER_BATCH % ndev:
                raise ValueError(
                    f"multi-host: SOLVER.IMS_PER_BATCH "
                    f"{cfg.SOLVER.IMS_PER_BATCH} must be divisible by the "
                    f"global device count {ndev}"
                )
            self.mesh = get_mesh(ndev)
        else:
            while cfg.SOLVER.IMS_PER_BATCH % ndev:
                ndev -= 1
            self.mesh = get_mesh(ndev)
        self.seed = default_setup(cfg)
        if pcount > 1:
            # all processes must init identical params / step rngs
            from jax.experimental import multihost_utils

            self.seed = int(
                multihost_utils.broadcast_one_to_all(
                    np.asarray(self.seed, np.int32)
                )
            )
        self.rng = jax.random.PRNGKey(self.seed)
        self.start_iter = 0
        self.max_iter = cfg.SOLVER.MAX_ITER

        # per-process data slice: all ranks run the SAME seeded shuffle and
        # metadata-only bucket grouping, each decoding its 1/P slice of
        # every global batch (reference: one TrainingSampler shuffle split
        # across ranks, dataloader/build.py:250-290). Bucket choices agree
        # across ranks by construction, so multi-bucket multi-host works.
        self.loader = build_detection_train_loader(
            cfg,
            seed=self.seed,
            batch_size=cfg.SOLVER.IMS_PER_BATCH,
            rank=jax.process_index(),
            world_size=pcount,
        )
        # peek the first batch for shape-driven init, then REPLAY it as
        # training step 0 (the reference trains on every sampled batch)
        peeked = next(iter(self.loader))
        self._peeked_batches = [peeked]
        images, gt = peeked[0], peeked[1]

        init_rngs = {
            "params": jax.random.PRNGKey(self.seed),
            "sampling": jax.random.PRNGKey(self.seed + 1),
            "dropout": jax.random.PRNGKey(self.seed + 2),
        }
        variables = jax.jit(partial(self.model.init, train=True))(
            init_rngs,
            jax.tree_util.tree_map(jnp.asarray, images),
            jax.tree_util.tree_map(jnp.asarray, gt),
        )
        self.params = variables["params"]

        if cfg.MODEL.WEIGHTS:
            from ..checkpoint.torch_import import maybe_load_reference_weights

            self.params = maybe_load_reference_weights(
                cfg.MODEL.WEIGHTS, self.params
            )

        self.tx, self.schedule = build_optimizer(cfg, self.params)

        if cfg.TPU.MODEL_PARALLEL > 1:
            # ZeRO-style layout: large params live 1/M-sharded over the
            # model axis; init_sharded pins each momentum buffer to its
            # param's layout (the actual HBM win).
            self.params = shard_params(self.mesh, self.params)
            self.opt_state = init_sharded(
                self.mesh, self.tx.init, self.params
            )
        else:
            self.opt_state = self.tx.init(self.params)
            self.params = replicate(self.mesh, self.params)
            self.opt_state = replicate(self.mesh, self.opt_state)

        self._train_step = self._jit_step(make_train_step(self.model, self.tx))
        self._raw_steps = {}  # target_hw -> jitted device-preprocess step

        self.checkpointer = Checkpointer(
            cfg.OUTPUT_DIR, backend=cfg.TPU.CHECKPOINT_BACKEND
        )
        # rank 0 owns metrics.json / tensorboard (ref: writers only on the
        # main process, defaults.py:371-377); other ranks log to a
        # rank-suffixed dir so concurrent writes never collide
        out = (
            cfg.OUTPUT_DIR
            if jax.process_index() == 0
            else os.path.join(
                cfg.OUTPUT_DIR, f"rank{jax.process_index()}"
            )
        )
        self.metrics = MetricsLogger(out)
        self.hooks = []

    def _jit_step(self, fn):
        """jit a train step; under MODEL_PARALLEL, pin the returned
        params/opt_state to the live ZeRO layout. The updated state has no
        sharding annotation of its own (optax update = elementwise tree
        math), and GSPMD propagation is free to pick a different output
        layout — which would silently recompile step 2 and lose the
        per-chip HBM win (the same propagation freedom init_sharded pins
        for the momentum zeros)."""
        if self.cfg.TPU.MODEL_PARALLEL <= 1:
            return jax.jit(fn, donate_argnums=(0, 1))
        param_layout = jax.tree_util.tree_map(
            lambda x: x.sharding, self.params
        )
        opt_layout = jax.tree_util.tree_map(
            lambda x: x.sharding, self.opt_state
        )

        def pinned(params, opt_state, *rest):
            new_p, new_o, losses = fn(params, opt_state, *rest)
            new_p = jax.lax.with_sharding_constraint(new_p, param_layout)
            new_o = jax.lax.with_sharding_constraint(new_o, opt_layout)
            return new_p, new_o, losses

        return jax.jit(pinned, donate_argnums=(0, 1))

    def resume_or_load(self, resume: bool = True):
        if resume:
            loaded = self.checkpointer.load_latest()
            if loaded is not None:
                # keep the live layout: model-sharded under MODEL_PARALLEL
                # (place_like copies each live leaf's sharding); replicate
                # otherwise (it alone handles meshes spanning processes)
                if self.cfg.TPU.MODEL_PARALLEL > 1:
                    restore = partial(place_like, self.params)
                else:
                    restore = partial(replicate, self.mesh)
                self.params = restore(loaded["params"])
                restored = loaded.get("opt_state")
                if restored is not None:
                    try:
                        # host-side staging (np, not jnp): jnp.asarray
                        # would materialize every leaf UNSHARDED on the
                        # default device before placement — under
                        # MODEL_PARALLEL that alone can OOM a chip that
                        # only fits the 1/M-sharded state
                        new_state = jax.tree_util.tree_map(
                            lambda ref, new: np.asarray(new),
                            self.opt_state,
                            restored,
                        )
                    except ValueError:
                        # orbax restores namedtuple states as plain dicts;
                        # map them back onto the live optax structure
                        from flax import serialization

                        new_state = serialization.from_state_dict(
                            self.opt_state, restored
                        )
                    if self.cfg.TPU.MODEL_PARALLEL > 1:
                        self.opt_state = place_like(
                            self.opt_state, new_state
                        )
                    else:
                        self.opt_state = replicate(self.mesh, new_state)
                self.start_iter = int(loaded.get("iteration", 0)) + 1

    def train(self):
        cfg = self.cfg
        rng = self.rng
        it = self.start_iter
        t_last = time.time()
        params = self.params

        # Graceful preemption (beyond reference parity — SURVEY §5.3: the
        # reference is crash-and-resume only): SIGTERM (what preemptible
        # TPU VMs / cluster schedulers send) sets a flag; the loop saves a
        # resumable checkpoint at the end of the current iteration and
        # exits cleanly instead of dying mid-step and losing everything
        # since the last CHECKPOINT_PERIOD. Multi-host: every process must
        # receive the signal (the standard preemption contract) — a
        # partially-delivered TERM leaves peers at the next collective,
        # the same failure mode as a crash, recoverable by restart.
        self.preempted = False
        prev_handler = None
        try:
            import signal

            def _on_term(signum, frame):
                self.preempted = True

            prev_handler = signal.signal(signal.SIGTERM, _on_term)
        except ValueError:
            pass  # not the main thread (e.g. a test harness): no handler

        # Upload batches to the device from a prefetch thread so
        # host->device transfer overlaps the in-flight steps (the step
        # loop only syncs on losses every 20 iterations). Behind the dev
        # relay a batch upload can take longer than the step itself;
        # on any host this also hides normal NIC/PCIe latency.
        from ..data.loader import Prefetcher

        def batches():
            while self._peeked_batches:
                yield self._peeked_batches.pop(0)
            yield from self.loader

        def uploaded():
            for images, gt, meta in batches():
                images_d, gt_d = shard_batch(self.mesh, (images, gt))
                extras = None
                if cfg.TPU.DEVICE_PREPROCESS:
                    extras = shard_batch(
                        self.mesh, (meta["short"], meta["flip"])
                    )
                yield images_d, gt_d, meta, extras

        data_iter = iter(Prefetcher(uploaded, maxsize=2))

        if cfg.TPU.DEBUG_NANS:
            jax.config.update("jax_debug_nans", True)
        profile_start = cfg.TPU.PROFILE_START_STEP
        profile_stop = profile_start + cfg.TPU.PROFILE_NUM_STEPS
        profiling = False  # a resume can land INSIDE the window: stop only
        # if this run actually started a trace

        # The loop runs under try/finally: if it raises and the caller
        # catches, the process must not be left with _on_term installed
        # (future SIGTERMs would only set a flag on an abandoned trainer,
        # making the process non-terminable by SIGTERM) nor with undrained
        # async checkpoint writes.
        try:
            while it < self.max_iter:
                if it == profile_start:
                    jax.profiler.start_trace(
                        os.path.join(cfg.OUTPUT_DIR, "profile")
                    )
                    profiling = True
                images_d, gt_d, meta, extras = next(data_iter)

                if cfg.TPU.DEVICE_PREPROCESS:
                    key = tuple(meta["target_hw"])
                    fn = self._raw_steps.get(key)
                    if fn is None:
                        fn = self._jit_step(
                            make_train_step(
                                self.model, self.tx,
                                preprocess=(cfg.INPUT.MAX_SIZE_TRAIN, key),
                            )
                        )
                        self._raw_steps[key] = fn
                    short_d, flip_d = extras
                    step_args = (
                        params, self.opt_state, images_d, gt_d, rng, it,
                        short_d, flip_d,
                    )
                else:
                    fn = self._train_step
                    step_args = (params, self.opt_state, images_d, gt_d, rng, it)

                if (
                    it == self.start_iter
                    and jax.process_count() > 1
                    and jax.default_backend() == "cpu"
                ):
                    # CPU multi-process: the step's psum runs over gloo, whose
                    # communicator init at the FIRST execution has a ~30 s
                    # connect window — easily blown by cross-rank compile-time
                    # skew. Compile first (no execution; the dispatch-path
                    # recompile reloads from the persistent cache), then
                    # rendezvous so all ranks execute the first collective
                    # together. See parallel.mesh.coordination_barrier.
                    from ..parallel import coordination_barrier

                    fn.lower(*step_args).compile()
                    coordination_barrier("fsodtf/train_step0")

                params, self.opt_state, losses = fn(*step_args)

                if it % 20 == 0 or it == self.max_iter - 1:
                    losses = {k: float(v) for k, v in losses.items()}
                    dt = time.time() - t_last
                    t_last = time.time()
                    lr = float(self.schedule(it))
                    self.metrics.log(
                        it,
                        {**losses, "lr": lr, "time_per_20iter": dt},
                    )

                if (
                    cfg.SOLVER.CHECKPOINT_PERIOD > 0
                    and (it + 1) % cfg.SOLVER.CHECKPOINT_PERIOD == 0
                ):
                    self.save(params, it)

                # keep self.params pointing at LIVE buffers: the loop-local
                # `params` the step returned (its input was donated/deleted) —
                # a hook calling trainer.test() mid-training must not see the
                # pre-step donated array
                self.params = params
                for hook in self.hooks:
                    hook(it, params)
                if it + 1 == profile_stop and profiling:
                    jax.block_until_ready(losses)
                    jax.profiler.stop_trace()
                    profiling = False
                if self.preempted:
                    # end-of-iteration boundary: params/opt_state are a
                    # consistent post-step state — save it and stop. Resume
                    # restarts at it+1 (same contract as periodic saves).
                    self.save(params, it)
                    self.checkpointer.wait()
                    from ..utils.events import logger as _log

                    if jax.process_index() == 0:
                        _log.info(
                            "SIGTERM: checkpoint saved at iteration %d; "
                            "restart with --resume to continue", it,
                        )
                    else:
                        # save() is a rank-0 no-op: this rank only exits
                        _log.info(
                            "SIGTERM: exiting for preemption at iteration "
                            "%d (rank 0 saved the checkpoint)", it,
                        )
                    break
                it += 1

            if profiling:  # window extended past max_iter (or NUM_STEPS<=0)
                jax.block_until_ready(losses)
                jax.profiler.stop_trace()
            self.params = params
            if not self.preempted:
                # a preempted run must NOT write model_final — that name
                # means "training completed" to workflow scripts and eval
                self.save(self.params, self.max_iter - 1, name="model_final")
        finally:
            if prev_handler is not None:
                import signal

                signal.signal(signal.SIGTERM, prev_handler)
            # train() must not return (or unwind) before every checkpoint
            # is durable on disk (callers read model_final right after;
            # multi-host smokes stat the files) — drain the async writer
            # on ALL exit paths, including exceptions. When already
            # unwinding, a writer error must not mask the original
            # exception (raising in a finally replaces it).
            import sys

            if sys.exc_info()[0] is None:
                self.checkpointer.wait()
            else:
                try:
                    self.checkpointer.wait()
                except Exception:
                    from ..utils.events import logger as _log

                    _log.exception("async checkpoint writer also failed")
        return self.params

    def save(self, params, iteration, name=None):
        if jax.process_index() != 0:
            # rank 0 writes. Multi-process params are replicated (full
            # value in local shards). MODEL_PARALLEL params are sharded
            # but single-process (enforced in __init__) — device_get
            # assembles the global value; lifting that restriction needs
            # a gather-on-save here.
            return
        state = {
            # device_get stays synchronous (the step donates these buffers
            # next iteration — the snapshot must complete first); only the
            # serialization + fsync move off-thread under ASYNC_CHECKPOINT
            "params": jax.device_get(params),
            "opt_state": jax.device_get(self.opt_state),
            "iteration": iteration,
        }
        name = name or f"model_{iteration:07d}"
        if self.cfg.TPU.ASYNC_CHECKPOINT:
            self.checkpointer.save_async(state, name)
        else:
            self.checkpointer.save(state, name)

    def test(self, cfg=None, params=None):
        """Evaluate on cfg.DATASETS.TEST — DefaultTrainer.test parity
        (ref engine/defaults.py:461-516). Returns {dataset: results}."""
        import main as cli

        return cli.do_test(
            cfg or self.cfg,
            params=self.params if params is None else params,
            model=self.model,
        )
