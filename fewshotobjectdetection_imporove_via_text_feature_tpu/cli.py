"""CLI entry point — parity with the reference's main.py:36-132.

Installed as the ``fsodtf`` console script (pyproject.toml); the repo-root
``main.py`` shim re-exports this module so the reference's
``python3 main.py ...`` invocation shape keeps working from a checkout.

Usage:
    fsodtf --config-file configs/voc/defrcn_det_r101_base1.yaml \
        --opts MODEL.WEIGHTS path/to/R-101.pkl OUTPUT_DIR out/base1
    python main.py --config-file ... --eval-only --opts MODEL.WEIGHTS ...

Differences from the reference (documented):
  * no multi-process `launch` — data parallelism is a jax.sharding mesh
    inside one process (all local devices used automatically);
  * the experiment keys the reference adds at runtime (MODEL.ADDITION.*)
    are part of the committed schema (config/defaults.py).
"""

from __future__ import annotations

import argparse
import logging
import os
import sys


def default_argument_parser():
    parser = argparse.ArgumentParser(description="TPU DeFRCN few-shot detection")
    parser.add_argument("--config-file", default="", metavar="FILE")
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--eval-only", action="store_true")
    parser.add_argument("--eval-iter", type=int, default=-1)
    # --num-gpus is accepted for CLI compat with reference run scripts and
    # ignored (the mesh picks up all local devices). --num-machines /
    # --machine-rank / --dist-url map onto jax.distributed.initialize: the
    # multi-host analog of the reference's launch() + NCCL init
    # (ref main.py:125-132, engine/defaults.py:57-67).
    parser.add_argument("--num-gpus", type=int, default=1)
    parser.add_argument("--num-machines", type=int, default=1)
    parser.add_argument("--machine-rank", type=int, default=0)
    parser.add_argument("--dist-url", default="auto")
    parser.add_argument(
        "--opts", default=[], nargs=argparse.REMAINDER,
        help="Modify config options via 'KEY VALUE' pairs",
    )
    return parser


def setup(args):
    from fewshotobjectdetection_imporove_via_text_feature_tpu.config import (
        get_cfg,
        set_global_cfg,
    )

    cfg = get_cfg()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    # EVAL_PERIOD heuristics. Ref main.py:81-82 rewrites an explicit 1000
    # to MAX_ITER//3 + 100 (precedence: the whole sum is the if-branch);
    # the committed configs never set the key, so the d2 default 0 flows
    # through, which we additionally map to eval-at-end.
    if cfg.TEST.EVAL_PERIOD == 1000:
        cfg.TEST.EVAL_PERIOD = cfg.SOLVER.MAX_ITER // 3 + 100
    if cfg.TEST.EVAL_PERIOD == 0 and cfg.SOLVER.MAX_ITER > 0:
        cfg.TEST.EVAL_PERIOD = cfg.SOLVER.MAX_ITER
    set_global_cfg(cfg)
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(name)s %(levelname)s: %(message)s",
    )
    # ALSO log to OUTPUT_DIR/log.txt like the reference's setup_logger
    # (defaults.py:90-93; rank-suffixed off rank 0): tools/
    # extract_results.py scrapes the trailing "copypaste:" lines from
    # exactly this file, so without it every run_*.sh aggregate breaks
    if cfg.OUTPUT_DIR:
        import jax

        os.makedirs(cfg.OUTPUT_DIR, exist_ok=True)
        rank = jax.process_index()
        name = "log.txt" if rank == 0 else f"log.txt.rank{rank}"
        fh = logging.FileHandler(os.path.join(cfg.OUTPUT_DIR, name))
        fh.setFormatter(logging.Formatter(
            "%(asctime)s %(name)s %(levelname)s: %(message)s"
        ))
        logging.getLogger().addHandler(fh)
    if not cfg.MUTE_HEADER:
        # ref default_setup (engine/defaults.py:100-112): environment +
        # full running-config dump, gated by MUTE_HEADER (default True;
        # run scripts pass `MUTE_HEADER True` explicitly)
        import platform

        import jax

        log = logging.getLogger("fsodtf_tpu")
        log.info(
            "environment: python %s, jax %s, devices %s",
            platform.python_version(), jax.__version__,
            [str(d) for d in jax.devices()],
        )
        log.info("Running with full config:\n%s", cfg)
    return cfg


def resolve_eval_iter_checkpoint(output_dir: str, eval_iter: int) -> str:
    """--eval-iter N -> OUTPUT_DIR's iteration checkpoint. Periodic
    checkpoints carry the 0-based iteration (saved when (it+1) % period
    == 0 -> model_0000999 for period 1000), so a period-multiple N
    resolves to N-1; both namings are accepted, in either backend
    format. (Upstream DeFRCN's eval-by-iteration workflow; this fork's
    reference parses the flag but dropped the consuming code.)"""
    candidates = [
        os.path.join(output_dir, f"model_{i:07d}{ext}")
        for i in (eval_iter, eval_iter - 1)
        for ext in (".ckpt", ".orbax")
        if i >= 0
    ]
    found = next((c for c in candidates if os.path.exists(c)), None)
    if found is None:
        raise FileNotFoundError(
            f"--eval-iter {eval_iter}: none of {candidates} exist"
        )
    return found


def build_evaluator(cfg, dataset_name, output_dir):
    from fewshotobjectdetection_imporove_via_text_feature_tpu.data import (
        MetadataCatalog,
    )
    from fewshotobjectdetection_imporove_via_text_feature_tpu.evaluation import (
        COCOEvaluator,
        PascalVOCDetectionEvaluator,
    )

    etype = MetadataCatalog.get(dataset_name).get("evaluator_type")
    if etype == "pascal_voc":
        return PascalVOCDetectionEvaluator(dataset_name, output_dir)
    if etype == "coco":
        return COCOEvaluator(dataset_name, output_dir)
    raise NotImplementedError(f"no evaluator for {dataset_name} ({etype})")


def do_test(cfg, params=None, model=None):
    import jax

    from fewshotobjectdetection_imporove_via_text_feature_tpu.checkpoint.torch_import import (
        maybe_load_reference_weights,
    )
    from fewshotobjectdetection_imporove_via_text_feature_tpu.data import (
        build_detection_test_loader,
    )
    from fewshotobjectdetection_imporove_via_text_feature_tpu.evaluation import (
        inference_on_dataset,
        print_csv_format,
        verify_results,
    )
    from fewshotobjectdetection_imporove_via_text_feature_tpu.models import (
        build_model,
    )
    from fewshotobjectdetection_imporove_via_text_feature_tpu.structures import (
        ImageBatch,
    )

    if cfg.TPU.SPATIAL_PARTITION > 1:
        # serving-only knob (DefaultPredictor); evaluation parallelizes by
        # sharding the batch over the local mesh instead — accepting it
        # here would silently evaluate unpartitioned (fail-loudly
        # convention, models/build.py)
        raise ValueError(
            "TPU.SPATIAL_PARTITION applies to DefaultPredictor serving "
            "only; evaluation shards batches over the local data mesh"
        )
    if model is None:
        model = build_model(cfg)
    if params is None:
        import functools

        import jax.numpy as jnp

        h, w = cfg.TPU.IMAGE_BUCKETS[-1]
        dummy = ImageBatch(
            image=jnp.zeros((1, h, w, 3), jnp.float32),
            hw=jnp.asarray([[h, w]], jnp.int32),
            orig_hw=jnp.asarray([[h, w]], jnp.int32),
        )
        variables = jax.jit(functools.partial(model.init, train=False))(
            {"params": jax.random.PRNGKey(0)}, dummy
        )
        params = maybe_load_reference_weights(
            cfg.MODEL.WEIGHTS, variables["params"]
        )

    pcb = None
    if cfg.TEST.PCB_ENABLE:
        from fewshotobjectdetection_imporove_via_text_feature_tpu.evaluation.pcb import (
            PrototypicalCalibrationBlock,
        )

        pcb = PrototypicalCalibrationBlock(cfg)

    # multi-device eval: shard the test batch across the LOCAL data mesh
    # (detections are fetched to the host, so the mesh must not span other
    # processes). Across processes, inference_on_dataset slices batches
    # round-robin and all-gathers detections (InferenceSampler +
    # comm.gather parity, ref dataloader/build.py:385).
    mesh = None
    ndev = len(jax.local_devices())
    # batch 32 is the throughput-tuned inference batch (bench.py sweep:
    # 8/16/32 -> 108/113/120 img/s); trailing partial batches pad with
    # flagged copies, so larger batches only cost a few wasted pad slots
    # on the last batch of each bucket group
    batch_size = 32
    if ndev > 1:
        from fewshotobjectdetection_imporove_via_text_feature_tpu.parallel.mesh import (
            get_mesh,
        )

        while batch_size % ndev:
            ndev -= 1
        mesh = get_mesh(ndev, local=True)

    results = {}
    for dataset_name in cfg.DATASETS.TEST:
        loader = build_detection_test_loader(
            cfg, dataset_name, batch_size=batch_size,
            # multi-host: decode only this rank's round-robin slice (the
            # driver skips foreign batches by the same k % pcount rule)
            shard=(
                (jax.process_index(), jax.process_count())
                if jax.process_count() > 1 else None
            ),
        )
        evaluator = build_evaluator(cfg, dataset_name, cfg.OUTPUT_DIR)
        res = inference_on_dataset(
            model, params, loader, evaluator, pcb=pcb, mesh=mesh,
            no_gt=cfg.TEST.NO_GT_EVAL,
        )
        results[dataset_name] = res
        print_csv_format(res)
        if not verify_results(cfg, res):
            sys.exit(1)
    return results


def _setup_compilation_cache():
    """Persistent jit-compilation cache across CLI processes.

    The few-shot workflow (run_voc.sh: shots x seeds x stages) launches
    main.py dozens of times with a handful of distinct programs; each
    fresh process would otherwise pay the full 20-40 s remote compile per
    program. JAX_COMPILATION_CACHE_DIR overrides the location; an empty
    value disables."""
    import jax

    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(
            os.path.expanduser("~"), ".cache", "fsodtf", "jax_cache"
        ),
    )
    if not cache_dir:
        return
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # detector programs all take >>1 s to compile; skip tiny host ops
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    # optional platform override (e.g. FSODTF_PLATFORM=cpu for smoke runs —
    # env JAX_PLATFORMS alone is pre-empted by the container sitecustomize)
    platform = os.environ.get("FSODTF_PLATFORM")
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)
    _setup_compilation_cache()

    args = default_argument_parser().parse_args()

    if args.num_machines > 1:
        # Multi-host: one process per machine joins a global mesh.
        # jax.distributed.initialize makes jax.devices() global, so the
        # trainer's data mesh spans hosts and pjit's gradient psum rides
        # ICI/DCN — the reference's launch()+DDP equivalent.
        import jax

        if args.dist_url in ("auto", ""):
            raise ValueError(
                "--num-machines > 1 needs an explicit --dist-url "
                "host:port for the jax.distributed coordinator "
                "(machine-rank 0's address)"
            )
        jax.distributed.initialize(
            coordinator_address=args.dist_url.replace("tcp://", ""),
            num_processes=args.num_machines,
            process_id=args.machine_rank,
        )

    cfg = setup(args)

    if args.num_gpus > 1:
        # reference launch() spawns per-GPU processes; here one process
        # drives a jax.sharding mesh over ALL local devices, so the flag
        # is accepted but the device count comes from the runtime. Logged
        # after setup() — that's where logging handlers are configured.
        logging.getLogger("fsodtf_tpu").info(
            "--num-gpus %d: data parallelism uses every local device via "
            "the in-process mesh (flag accepted for run-script compat)",
            args.num_gpus,
        )

    from fewshotobjectdetection_imporove_via_text_feature_tpu.data import (
        register_all,
    )

    # FSODTF_DATASETS relocates the dataset root (the reference hardcodes
    # "datasets", builtin.py:9; this is an additive escape hatch, same
    # spirit as detectron2's DETECTRON2_DATASETS)
    register_all(os.environ.get("FSODTF_DATASETS", "datasets"))

    if args.eval_only:
        # --eval-iter N evaluates OUTPUT_DIR's model_{N:07d} checkpoint
        # (upstream DeFRCN's eval-by-iteration workflow; this fork's
        # reference parses the flag but dropped the consuming code — we
        # keep the behavior rather than silently ignoring the flag)
        if args.eval_iter >= 0:
            cfg.MODEL.WEIGHTS = resolve_eval_iter_checkpoint(
                cfg.OUTPUT_DIR, args.eval_iter
            )
        return do_test(cfg)

    from fewshotobjectdetection_imporove_via_text_feature_tpu.engine import (
        Trainer,
    )

    trainer = Trainer(cfg)
    trainer.resume_or_load(resume=args.resume)

    # periodic in-training eval (ref EvalHookDeFRCN, hooks.py:15-83)
    if 0 < cfg.TEST.EVAL_PERIOD < cfg.SOLVER.MAX_ITER and cfg.DATASETS.TEST:
        from fewshotobjectdetection_imporove_via_text_feature_tpu.engine.hooks import (
            EvalHook,
        )

        trainer.hooks.append(
            EvalHook(
                cfg.TEST.EVAL_PERIOD,
                cfg.SOLVER.MAX_ITER,
                cfg.OUTPUT_DIR,
                lambda p: do_test(cfg, params=p, model=trainer.model),
            )
        )

    params = trainer.train()
    if getattr(trainer, "preempted", False):
        # SIGTERM mid-training: a resumable checkpoint was saved; skip the
        # final eval so the process yields the machine promptly
        return None
    if cfg.DATASETS.TEST:
        return do_test(cfg, params=params, model=trainer.model)


if __name__ == "__main__":
    main()
