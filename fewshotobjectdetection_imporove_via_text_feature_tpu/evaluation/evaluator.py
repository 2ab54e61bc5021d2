"""Inference driver — loops the test loader through the jit-compiled
inference program, with the reference's warmup-skipped timing convention
(defrcn/evaluation/evaluator.py:82-162) and optional PCB rescoring."""

from __future__ import annotations

import logging
import time
from functools import partial
from typing import Optional

import jax
import numpy as np

logger = logging.getLogger(__name__)

# Traced inference programs, reused across inference_on_dataset calls
# (periodic EvalHook evals would otherwise re-trace the full detector
# every period — compilation is disk-cached but tracing is not). Keyed by
# id(model) — NOT by the module itself: text-family modules carry numpy
# class-embedding attributes and are unhashable (a WeakKeyDictionary here
# crashed every text/semantic model evaluation). The entry's jitted
# bound method pins the model alive, so an id can never be recycled into
# a stale hit. Bounded FIFO: a long multi-checkpoint sweep must not pin
# every model + traced program it ever evaluated — evicting drops the
# pin, after which a recycled id simply misses and re-traces.
_jit_cache: dict = {}
_JIT_CACHE_CAP = 8


def _model_cache(model):
    key = id(model)
    entry = _jit_cache.get(key)
    if entry is None:
        entry = {
            "apply": jax.jit(partial(model.apply, train=False)),
            "raw": {},
        }
        while len(_jit_cache) >= _JIT_CACHE_CAP:
            _jit_cache.pop(next(iter(_jit_cache)))
        _jit_cache[key] = entry
    return entry


class DatasetEvaluator:
    def reset(self):
        pass

    def process_detections(self, image_ids, boxes, scores, classes, valid):
        raise NotImplementedError

    def evaluate(self):
        raise NotImplementedError


def inference_on_dataset(
    model,
    params,
    data_loader,
    evaluator: Optional[DatasetEvaluator],
    pcb=None,
    mesh=None,
    no_gt: bool = False,
):
    """Run inference over the loader; returns evaluator results.

    model/params: flax module + params; pcb: optional
    PrototypicalCalibrationBlock applied to each batch's detections
    (ref evaluator.py:104-124). With ``mesh`` (a 1-D data mesh), batches
    whose size divides the mesh shard over devices — the TPU equivalent of
    the reference's InferenceSampler test-set sharding across ranks
    (dataloader/build.py:385, comm.gather in the evaluators); detections
    gather back to host when converted to numpy.
    """
    if evaluator is not None:
        evaluator.reset()

    use_mesh = mesh is not None and mesh.size > 1
    if use_mesh:
        from ..parallel.mesh import replicate

        params = replicate(mesh, params)

    def maybe_shard(images, extra=()):
        if not use_mesh or images.image.shape[0] % mesh.size:
            return (images, *extra)
        from ..parallel.mesh import shard_batch

        return (shard_batch(mesh, images),
                *(shard_batch(mesh, e) for e in extra))

    cache = _model_cache(model)
    apply_fn = cache["apply"]

    # Painting meta-archs (Semantic/Text families) evaluate with test-time
    # GT fed to the model — the reference's own eval protocol (its
    # inference() passes gt_instances, rcnn.py:64-67, and its test mapper
    # keeps annotations, dataset_mapper.py:146-150). GT-LEAKY by design;
    # see PARITY. Plain archs keep gt out of evaluation entirely.
    # no_gt=True (cfg.TEST.NO_GT_EVAL) withholds GT even from painting
    # archs: the non-leaky serving-path evaluation (all-bg paint fallback)
    role = getattr(model, "eval_gt_role", "teacher")
    if no_gt and role == "paint" and getattr(
        model, "paint_replaces_features", False
    ):
        # Semantic family: detection features are SOLELY the painted map;
        # withholding GT leaves an input-independent all-bg constant map,
        # so a "non-leaky serving eval" would silently report meaningless
        # metrics. Only the Text family (visual features concat'd with the
        # paint) has a meaningful serving-path evaluation (ADVICE r4).
        raise ValueError(
            "TEST.NO_GT_EVAL is not meaningful for "
            f"{type(model).__name__}: its detection features are solely "
            "the painted semantic map, so withholding GT evaluates a "
            "constant feature map. Use the Text family for non-leaky "
            "serving evaluation, or drop TEST.NO_GT_EVAL."
        )
    feed_gt = not no_gt and role == "paint"

    # device-preprocess mode: fuse raw->resize into the inference program,
    # one compiled variant per target bucket
    raw_fns = cache["raw"]

    def apply_raw(variables, images, gt, short, flip, target_hw, max_size):
        fn = raw_fns.get((target_hw, max_size))
        if fn is None:

            def run(v, im, g, sh, fl):
                from ..data.xla_preprocess import device_resize_batch

                resized, _ = device_resize_batch(
                    im.image, im.orig_hw, fl, sh, max_size, target_hw,
                    out_s2d=(
                        target_hw[0] % 2 == 0 and target_hw[1] % 2 == 0
                    ),
                )
                return model.apply(
                    v, im.replace(image=resized), g, train=False
                )

            fn = jax.jit(run)
            raw_fns[(target_hw, max_size)] = fn
        return fn(variables, images, gt, short, flip)

    # multi-host: slice batches round-robin across processes
    # (InferenceSampler semantics, ref dataloader/build.py:385) and
    # all-gather each batch's detections so every rank evaluates full
    # metrics (comm.gather + broadcast analog).
    pcount = jax.process_count()
    pindex = jax.process_index()

    # Pipelined drive: keep up to DEPTH batches in flight on the device and
    # read back / evaluate the oldest while newer ones compute. Behind the
    # time-shared relay every synchronous batch pays a full dispatch +
    # readback round trip (~30 ms floor) on top of compute; dispatch-ahead
    # overlaps that with execution. Detections drain strictly in batch
    # order, so the per-batch multi-host all-gathers stay in lockstep.
    import os
    from collections import deque

    depth = int(os.environ.get("FSODTF_EVAL_PIPELINE", "2"))
    num_warmup = 5
    start_time = time.perf_counter()
    steady_start = None
    steady_images = 0
    num_images = 0
    inflight = deque()

    def feed(entries):
        """Feed gathered (ids, det) payloads to the evaluator; every image
        of the dataset passes through here exactly once on every rank."""
        nonlocal num_images, steady_images
        for ids, d in entries:
            num_images += len(ids)
            if steady_start is not None:
                steady_images += len(ids)
            if evaluator is not None:
                evaluator.process_detections(
                    ids, d["boxes"], d["scores"], d["classes"], d["valid"]
                )

    def process(det, meta):
        nvalid = meta.get("valid_count", len(meta["image_ids"]))
        det_np = {
            "boxes": np.array(det.boxes)[:nvalid],
            "scores": np.array(det.scores)[:nvalid],
            "classes": np.array(det.classes)[:nvalid],
            "valid": np.array(det.valid)[:nvalid],
        }
        if pcb is not None:
            fnames = meta.get("file_names")
            det_np = pcb.execute_calibration(
                meta["image_ids"][:nvalid], det_np,
                file_names=None if fnames is None else fnames[:nvalid],
            )
        if pcount > 1:
            from ..parallel.gather import allgather_pyobj

            entries = filter(
                None,
                allgather_pyobj((list(meta["image_ids"][:nvalid]), det_np)),
            )
        else:
            entries = [(meta["image_ids"][:nvalid], det_np)]
        feed(entries)

    def drain(target_len):
        nonlocal steady_start
        while len(inflight) > target_len:
            kind, det, meta, k = inflight.popleft()
            if kind == "skip":
                from ..parallel.gather import allgather_pyobj

                feed(filter(None, allgather_pyobj(None)))
            else:
                process(det, meta)
            if k + 1 == num_warmup:
                # steady-state clock starts once the compile/cache warmup
                # batches have fully drained (reference convention: skip
                # warmup in the s/img accounting, evaluator.py:114-140)
                steady_start = time.perf_counter()

    # Upload batches from a prefetch thread: host->device transfer of the
    # next batch overlaps the in-flight executions (behind the dev relay
    # an upload can take longer than the step itself). Foreign ranks'
    # batches are never uploaded, only marked for the lockstep gather.
    from ..data.loader import Prefetcher

    def uploaded():
        for i, (images, gt, meta) in enumerate(data_loader):
            # a shard-aware loader marks foreign batches itself (and never
            # decoded their pixels); the index check keeps the same
            # round-robin for plain loaders
            if images is None and meta.get("skip"):
                yield "skip", None, None, None
                continue
            if pcount > 1 and i % pcount != pindex:
                yield "skip", None, None, None
                continue
            gt_in = (gt,) if feed_gt else ()
            if "short" in meta:
                images, *rest = maybe_shard(
                    images,
                    (*gt_in,
                     np.asarray(meta["short"]), np.asarray(meta["flip"])),
                )
                gt_d = rest[0] if feed_gt else None
                yield "raw", images, (gt_d, *rest[-2:]), meta
            else:
                images, *rest = maybe_shard(images, gt_in)
                gt_d = rest[0] if feed_gt else None
                yield "plain", images, (gt_d,), meta

    idx = 0
    for kind, images, extras, meta in Prefetcher(uploaded, maxsize=2):
        if kind == "skip":
            inflight.append(("skip", None, None, idx))
            drain(depth)
            idx += 1
            continue
        if kind == "raw":
            gt_d, short, flip = extras
            det = apply_raw(
                {"params": params}, images, gt_d, short, flip,
                tuple(meta["target_hw"]),
                int(meta["max_size"]),
            )
        else:
            (gt_d,) = extras
            det = apply_fn({"params": params}, images, gt_d)
        inflight.append(("det", det, meta, idx))
        drain(depth)
        idx += 1
    drain(0)

    total_time = time.perf_counter() - start_time
    steady = (
        (time.perf_counter() - steady_start) / max(steady_images, 1)
        if steady_start is not None and steady_images
        else total_time / max(num_images, 1)
    )
    logger.info(
        "Inference done: %d images, %.4f s/img compute (warmup-skipped), "
        "%.4f s/img wall",
        num_images,
        steady,
        total_time / max(num_images, 1),
    )
    if evaluator is None:
        return {}
    return evaluator.evaluate()
