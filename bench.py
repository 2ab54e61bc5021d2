"""Benchmark: flagship DeFRCN-style R-101 C4 throughput + MFU on TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} plus
"inference_imgs_per_sec", "train_imgs_per_sec", and "mfu" (model FLOP
utilization, computed from the compiled programs' cost_analysis() FLOPs
over measured step time — not guessed).

Protocol mirrors the reference's measurement convention (s/img with warmup
skipped, defrcn/evaluation/evaluator.py:114-140) at the reference's test
resolution (shortest edge 800, max 1333 -> padded 800x1344); the train
step uses the reference's production batch 16 (configs/Base-RCNN.yaml).
The baseline divisor is the driver north star's batch-1 CPU reference
point (BASELINE.md: ">=5x images/sec/chip vs batch-1 CPU baseline on
v5e"), measured once with this same model on the host CPU (see
CPU_BASELINE_IPS provenance note).
"""

from __future__ import annotations

import json
import time

import jax
import numpy as np

from fewshotobjectdetection_imporove_via_text_feature_tpu.cli import (
    _setup_compilation_cache,
)

# persistent compile cache: only affects COMPILATION time (timed regions
# measure execution with device readbacks — NOTES.md protocol); genuinely
# new programs still reach the remote compiler, so the compiler-outage
# watchdog's novel-shape probe keeps discriminating
_setup_compilation_cache()

# images/sec for the same R-101 C4 inference program, batch 1 at 800x1344,
# on this container's host CPU: measured 515.5 s/img (python bench.py
# --cpu-baseline under jax_platforms=cpu, 2026-08-16). Re-measure if the
# model changes materially.
CPU_BASELINE_IPS = 1.0 / 515.5

BATCH = 32  # throughput-optimal (sweep 2026-08-17: 8/16/32 -> 108/113/120 img/s)
TRAIN_BATCH = 16  # the reference's production batch (configs/Base-RCNN.yaml:13)
H, W = 800, 1344

# bf16 peak matmul throughput per chip, by device kind. The axon tunnel
# exposes a v5e (v5 lite) chip; fall back to its 197 TFLOP/s if the kind
# string is unrecognized.
_PEAK_FLOPS = {
    "v4": 275e12,
    "v5 lite": 197e12,
    "v5litepod": 197e12,
    "v5e": 197e12,
    "v5p": 459e12,
    "v6 lite": 918e12,
    "v6e": 918e12,
}


def _peak_flops():
    kind = jax.devices()[0].device_kind.lower()
    for k, v in _PEAK_FLOPS.items():
        if k in kind:
            return v
    return 197e12


def _program_flops(lowered_compiled):
    """FLOPs of a compiled program from XLA's cost analysis (0 if the
    backend doesn't report one)."""
    try:
        cost = lowered_compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get("flops", 0.0))
    except Exception:
        return 0.0


def make_inputs(batch, host_s2d=True, seed=0):
    """Batches in the production loader's format: uint8 pixels, host-side
    2x2 space-to-depth (TPU.HOST_SPACE_TO_DEPTH; data/mapper.py)."""
    from fewshotobjectdetection_imporove_via_text_feature_tpu.models.backbone import (
        space_to_depth,
    )
    from fewshotobjectdetection_imporove_via_text_feature_tpu.structures import (
        ImageBatch,
    )

    rng = np.random.RandomState(seed)
    imgs = rng.randint(0, 256, (batch, H, W, 3), dtype=np.uint8)
    if host_s2d:
        imgs = np.stack([space_to_depth(im) for im in imgs])
    return ImageBatch(
        image=imgs,
        hw=np.asarray([[H, W]] * batch, np.int32),
        orig_hw=np.asarray([[H, W]] * batch, np.int32),
    )


def build():
    from fewshotobjectdetection_imporove_via_text_feature_tpu.config import (
        get_cfg,
    )
    from fewshotobjectdetection_imporove_via_text_feature_tpu.models import (
        build_model,
    )

    cfg = get_cfg()
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 20
    model = build_model(cfg)
    return model


def build_text():
    """The fork's flagship training program: TextRes5ROIHeads student with
    the active distillation recipe (run_text_train_teacher_novel.sh:55-70
    flags — STUDENT_TRAINING + DISTILLATE + KL_TEMP 5), 15 base classes,
    glove bank (synthetic fallback vectors when datasets/glove is absent,
    same layer shapes)."""
    from fewshotobjectdetection_imporove_via_text_feature_tpu.config import (
        get_cfg,
    )
    from fewshotobjectdetection_imporove_via_text_feature_tpu.models import (
        build_model,
    )

    cfg = get_cfg()
    cfg.merge_from_list([
        "MODEL.ROI_HEADS.NAME", "TextRes5ROIHeads",
        "MODEL.ROI_HEADS.NUM_CLASSES", "15",
        "MODEL.ROI_HEADS.TEACHER_TRAINING", "False",
        "MODEL.ROI_HEADS.STUDENT_TRAINING", "True",
        "MODEL.ROI_HEADS.DISTILLATE", "True",
        "MODEL.ROI_HEADS.L2", "False",  # the recipe disables the L2 distill
        "MODEL.ROI_HEADS.KL_TEMP", "5",
        "MODEL.ADDITION.NAME", "glove",
        "DATASETS.TRAIN", "('voc_2007_trainval_base1',)",
    ])
    return build_model(cfg)


def make_gt(batch, g=16, seed=1, num_classes=20):
    from fewshotobjectdetection_imporove_via_text_feature_tpu.structures import (
        GTInstances,
    )

    rng = np.random.RandomState(seed)
    boxes = rng.uniform(10, 380, (batch, g, 4)).astype(np.float32)
    boxes[..., 2:] += boxes[..., :2]
    return GTInstances(
        boxes=boxes,
        classes=rng.randint(0, num_classes, (batch, g)).astype(np.int32),
        valid=np.ones((batch, g), bool),
    )


def bench_train(model, watchdog=None, num_classes=20, budget=240.0,
                hard_budget=480.0, quiet_per_img=0.018):
    """Train-step throughput (fwd+bwd+SGD, batch 16) + program FLOPs.

    Protocol (NOTES.md relay traps): chain N donated steps whose param
    dependencies force sequential execution, distinct pre-placed inputs
    every iteration, read the final loss back; MIN over gapped rounds.
    Returns (imgs_per_sec, flops_per_step)."""
    from fewshotobjectdetection_imporove_via_text_feature_tpu.config import (
        get_cfg,
    )
    from fewshotobjectdetection_imporove_via_text_feature_tpu.engine.trainer import (
        make_train_step,
    )
    from fewshotobjectdetection_imporove_via_text_feature_tpu.solver import (
        build_optimizer,
    )
    from fewshotobjectdetection_imporove_via_text_feature_tpu.structures import (
        ImageBatch,
    )

    batch = TRAIN_BATCH
    images = make_inputs(batch, seed=5)
    gt = make_gt(batch, num_classes=num_classes)
    init_rngs = {
        "params": jax.random.PRNGKey(0),
        "sampling": jax.random.PRNGKey(1),
        "dropout": jax.random.PRNGKey(2),
    }
    variables = jax.jit(lambda r, i, g: model.init(r, i, g, train=True))(
        init_rngs, images, gt
    )
    params = variables["params"]
    cfg = get_cfg()
    tx, _ = build_optimizer(cfg, params)
    opt_state = jax.jit(tx.init)(params)

    rng_key = jax.random.PRNGKey(7)
    # AOT-compile once; the SAME executable serves cost_analysis, warmup
    # and measurement (a later step() call through jit dispatch would
    # re-trace and re-compile the identical multi-minute program)
    step = (
        jax.jit(make_train_step(model, tx), donate_argnums=(0, 1))
        .lower(params, opt_state, images, gt, rng_key, 0)
        .compile()
    )
    flops = _program_flops(step)
    # warmup (first execution)
    params, opt_state, losses = step(params, opt_state, images, gt, rng_key, 0)
    np.asarray(losses["total_loss"])

    nonce = np.frombuffer(__import__("os").urandom(4), np.uint8)

    def fresh(k):
        imgs = np.array(images.image)
        imgs[0, 0, 0, :2] = (k // 256, k % 256)
        imgs[0, 0, 1, :4] = nonce
        return ImageBatch(image=imgs, hw=images.hw, orig_hw=images.orig_hw)

    rounds, iters, gap = 20, 3, 8.0
    # default 0.018: ~1.1x the measured ~270 ms device floor of the plain
    # train step; the text teacher+student step passes a higher floor
    quiet_cutoff = quiet_per_img * batch
    dt = float("inf")
    k = 0
    quiet_seen = 0
    start = time.perf_counter()
    gt_d = jax.device_put(gt)
    for r in range(rounds):
        if r:
            quiet_seen += dt <= quiet_cutoff
            elapsed = time.perf_counter() - start
            if quiet_seen >= 2:
                break
            if elapsed > budget and (
                dt <= 3 * quiet_cutoff or elapsed > hard_budget
            ):
                break
            time.sleep(gap)
        ims = [jax.device_put(fresh(k + i)) for i in range(iters)]
        for im in ims:
            jax.block_until_ready(im.image)
        k += iters
        t0 = time.perf_counter()
        for i, im in enumerate(ims):
            params, opt_state, losses = step(
                params, opt_state, im, gt_d, rng_key, k + i
            )
        np.asarray(losses["total_loss"])  # forces the whole chain
        dt = min(dt, (time.perf_counter() - t0) / len(ims))
        if watchdog is not None:
            watchdog.beat()
    return batch / dt, flops


class _Watchdog:
    """The time-shared TPU relay can become globally unresponsive (a
    trivial matmul was observed to block >2 min); a hung bench leaves the
    driver with NO artifact. If no progress beat arrives within
    ``timeout_s``, emit an honest error record and exit nonzero."""

    def __init__(self, timeout_s: float = None):
        import os
        import threading

        if timeout_s is None:
            timeout_s = float(os.environ.get("FSODTF_BENCH_WATCHDOG_S", 1500))
        self.timeout_s = timeout_s
        self._poll_s = min(30.0, max(timeout_s / 2.0, 0.05))
        self._last = time.monotonic()
        self._done = threading.Event()
        self._partial = None
        self.phase = "inference"  # updated by main() as phases start
        threading.Thread(target=self._run, daemon=True).start()

    def beat(self):
        self._last = time.monotonic()

    def set_partial(self, rec: dict):
        """Record an already-measured headline result: if a later phase
        (MFU cost-analysis compile, train bench) hangs the relay, the
        watchdog emits THIS record instead of a null artifact — the
        headline inference metric must never be lost to a train fault."""
        self._partial = dict(rec)
        self.beat()

    def disarm(self):
        self._done.set()

    def _run(self):
        import os

        while not self._done.wait(self._poll_s):
            stalled = time.monotonic() - self._last
            if stalled > self.timeout_s:
                if self._partial is not None:
                    rec = dict(self._partial)
                    rec["error"] = (
                        f"post-measurement phase ({self.phase}) stalled "
                        f"{stalled:.0f}s; headline metric already measured"
                    )
                    print(json.dumps(rec), flush=True)
                    os._exit(0)
                print(
                    json.dumps(
                        {
                            "metric": "r101_c4_inference_throughput_800x1344",
                            "value": None,
                            "unit": "images/sec/chip",
                            "vs_baseline": None,
                            "error": (
                                f"TPU relay unresponsive for {stalled:.0f}s"
                            ),
                        }
                    ),
                    flush=True,
                )
                os._exit(3)


def main(cpu_baseline: bool = False):
    import os

    watchdog = None if cpu_baseline else _Watchdog()
    batch = 1 if cpu_baseline else BATCH
    model = build()
    images = make_inputs(batch)

    # EVERY timed execution gets a never-seen-before input: repeated
    # executions of an already-seen (program, args) pair can be served
    # from a relay-side cache and read impossibly fast (measured 16 ms/step
    # vs a >=28 ms MXU-peak floor for this program, even when cycling a
    # small pool of inputs). The per-iteration pixel mutation happens on
    # the host OUTSIDE the timed region.
    from fewshotobjectdetection_imporove_via_text_feature_tpu.structures import (
        ImageBatch,
    )

    # per-run nonce: without it a SECOND bench.py invocation would replay
    # the exact (program, args) sequence of the first and could be served
    # from the relay-side result cache across processes
    nonce = np.frombuffer(os.urandom(4), np.uint8)

    def fresh_input(k):
        imgs = np.array(images.image)  # host copy
        imgs[0, 0, 0, :2] = (k // 256, k % 256)
        imgs[0, 0, 1, :4] = nonce
        return ImageBatch(
            image=imgs, hw=images.hw, orig_hw=images.orig_hw
        )

    init = jax.jit(lambda r, i: model.init(r, i, train=False))
    variables = init({"params": jax.random.PRNGKey(0)}, images)

    # AOT-compile ONCE and reuse the executable for warmup, measurement,
    # and cost_analysis — a fresh jit of the same program later would be a
    # second multi-minute compile (and relay-hang surface) for no reason.
    def _compile_apply():
        return (
            jax.jit(lambda v, i: model.apply(v, i, train=False))
            .lower(variables, images)
            .compile()
        )

    # compile + warmup; if the Pallas NMS path ever fails to compile on
    # this backend, fall back to the XLA tiled NMS rather than dying
    try:
        apply_fn = _compile_apply()
        out = jax.block_until_ready(apply_fn(variables, images))
    except Exception:
        os.environ["FSODTF_NMS"] = "xla"
        apply_fn = _compile_apply()
        out = jax.block_until_ready(apply_fn(variables, images))
    jax.block_until_ready(apply_fn(variables, images))
    if watchdog is not None:
        watchdog.beat()

    # The TPU behind the tunnel is time-shared with other tenants and
    # shows multi-second contention stalls; the MIN per-iteration time is
    # the chip's actual capability for this program. Contention bursts can
    # last longer than one measurement window, so sample several rounds
    # separated by short sleeps and take the global minimum.
    if cpu_baseline:
        rounds, iters, gap = 1, 3, 0.0
        budget = hard_budget = float("inf")
        quiet_cutoff = 0.0
    else:
        # contention bursts can last minutes: sample gapped rounds until a
        # near-quiet window shows up (a step within ~1.6x of this program's
        # ~50 ms device floor) or the time budget runs out, then report the
        # global min
        rounds, iters, gap = 60, 4, 10.0
        budget = 420.0       # normal sampling horizon
        hard_budget = 900.0  # keep hunting this long if dt is still garbage
        quiet_cutoff = 0.010 * batch  # ~1.3x the per-image device floor
    # Steady-state protocol: dispatch `iters` executions with DISTINCT
    # inputs back to back, then read a few bytes from EVERY output.
    # - distinct inputs: an already-seen (program, args) pair can be served
    #   from a relay-side cache (measured 16 ms/step vs the >=28 ms
    #   MXU-peak floor of this program);
    # - readback of every output: block_until_ready through the relay can
    #   resolve before the computation ran (measured 5.5 ms/step);
    # - dispatch-then-read: keeps the dispatch pipeline full, like a real
    #   serving loop — per-request relay latency overlaps execution.
    dt = float("inf")
    k = 0
    quiet_seen = 0
    bench_start = time.perf_counter()
    for r in range(rounds):
        if r:
            quiet_seen += dt <= quiet_cutoff
            elapsed = time.perf_counter() - bench_start
            if quiet_seen >= 3:  # a few quiet rounds pin the min
                break
            if elapsed > budget and (
                dt <= 4 * quiet_cutoff  # plausible sample in hand
                or elapsed > hard_budget  # relay stall outlasted us
            ):
                break
            time.sleep(gap)
        # Pre-place this round's inputs on the device OUTSIDE the timed
        # region: the dev relay's host->device link runs as low as
        # ~9 MB/s (a 26 MB batch upload measured 3.0 s while the same
        # step on device-resident input ran 75 ms), which is an artifact
        # of the tunnel, not of a TPU host. Inputs stay distinct per
        # iteration AND per round, so no relay-side result caching. The
        # uploads themselves can blow through the budget — bail to
        # whatever min we have if they do (but always finish round 0).
        ims = []
        for i in range(iters):
            if (
                (r or i >= 2)
                and time.perf_counter() - bench_start > hard_budget
            ):
                break
            ims.append(jax.device_put(fresh_input(k + i)))
        for im in ims:
            jax.block_until_ready(im.image)
        k += iters
        if len(ims) < 2:
            break
        t0 = time.perf_counter()
        outs = [apply_fn(variables, im) for im in ims]
        for out in outs:
            np.asarray(out.scores)
        dt = min(dt, (time.perf_counter() - t0) / len(ims))
        if watchdog is not None:
            watchdog.beat()
    ips = batch / dt

    if cpu_baseline:
        print(f"CPU baseline: {ips:.4f} images/sec (batch 1)")
        return

    peak = _peak_flops()
    if watchdog is not None:
        # from here on a relay stall must surface the measured result,
        # not a null artifact
        watchdog.set_partial(
            {
                "metric": "r101_c4_inference_throughput_800x1344",
                "value": round(ips, 3),
                "unit": "images/sec/chip",
                "vs_baseline": round(ips / CPU_BASELINE_IPS, 2),
                "inference_imgs_per_sec": round(ips, 3),
            }
        )
    inf_flops = _program_flops(apply_fn)
    inf_mfu = (inf_flops / batch) * ips / peak if inf_flops else None

    train_ips = train_mfu = train_flops = None
    try:
        if watchdog is not None:
            watchdog.phase = "train (MFU/compile/measure)"
        train_ips, train_flops = bench_train(model, watchdog)
        if train_flops:
            train_mfu = (train_flops / TRAIN_BATCH) * train_ips / peak
    except Exception as e:  # never lose the inference line to a train fault
        import traceback

        traceback.print_exc()
        print(f"train bench failed: {e}", flush=True)

    if watchdog is not None and train_ips is not None:
        part = dict(watchdog._partial or {})
        part["train_imgs_per_sec"] = round(train_ips, 3)
        watchdog.set_partial(part)

    # The fork's flagship: text teacher+student distillation step (shared
    # backbone, dual predictors, KL+L2 distill) — same hardened protocol.
    text_ips = text_mfu = text_flops = None
    try:
        if watchdog is not None:
            watchdog.phase = "text-distill (compile/measure)"
        text_ips, text_flops = bench_train(
            model=build_text(), watchdog=watchdog, num_classes=15,
            budget=150.0, hard_budget=300.0, quiet_per_img=0.021,
        )
        if text_flops:
            text_mfu = (text_flops / TRAIN_BATCH) * text_ips / peak
    except Exception as e:  # never lose earlier metrics to a text fault
        import traceback

        traceback.print_exc()
        print(f"text-distill bench failed: {e}", flush=True)

    # Batch-1 serving latency (DefaultPredictor shape): per-request
    # dispatch -> execute -> readback of the SAME inference program at
    # batch 1 — the serving-relevant number throughput scaling cannot
    # express (TPU.SPATIAL_PARTITION is the multi-chip lever for it).
    # Unlike the pipelined throughput loop, each request is timed alone:
    # this is what one caller of DefaultPredictor experiences, relay
    # overhead included. Distinct device-resident inputs per request
    # (relay result-cache trap), full readback, min over gapped rounds.
    lat_ms = None
    try:
        if watchdog is not None:
            watchdog.phase = "batch-1 latency (compile/measure)"
        img1 = make_inputs(1, seed=3)

        def fresh1(k):
            imgs = np.array(img1.image)
            imgs[0, 0, 0, :2] = (k // 256, k % 256)
            imgs[0, 0, 2, :4] = nonce
            return ImageBatch(image=imgs, hw=img1.hw, orig_hw=img1.orig_hw)

        apply1 = (
            jax.jit(lambda v, i: model.apply(v, i, train=False))
            .lower(variables, img1)
            .compile()
        )
        jax.block_until_ready(apply1(variables, img1).scores)
        if watchdog is not None:
            watchdog.beat()
        best = float("inf")
        quiet1 = 0
        start1 = time.perf_counter()
        k1 = 0
        for r in range(30):
            if r:
                quiet1 += best <= 0.050  # ~1.5x the ~30 ms relay floor
                if quiet1 >= 3 or time.perf_counter() - start1 > 180.0:
                    break
                time.sleep(5.0)
            for _ in range(3):
                im = jax.device_put(fresh1(k1))
                k1 += 1
                jax.block_until_ready(im.image)
                t0 = time.perf_counter()
                out = apply1(variables, im)
                # read back EVERYTHING a DefaultPredictor caller reads,
                # the way the predictor reads it: ONE device_get (four
                # sequential np.asarray fetches measured ~15-20 ms of
                # relay round trip EACH — 95 ms/request vs 41 batched)
                jax.device_get(
                    (out.boxes, out.scores, out.classes, out.valid)
                )
                best = min(best, time.perf_counter() - t0)
            if watchdog is not None:
                watchdog.beat()
        lat_ms = best * 1000.0
    except Exception as e:  # never lose earlier metrics to this phase
        import traceback

        traceback.print_exc()
        print(f"batch-1 latency bench failed: {e}", flush=True)

    rec = {
        "metric": "r101_c4_inference_throughput_800x1344",
        "value": round(ips, 3),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / CPU_BASELINE_IPS, 2),
        "inference_imgs_per_sec": round(ips, 3),
        "train_imgs_per_sec": (
            round(train_ips, 3) if train_ips is not None else None
        ),
        # headline MFU = the inference program (the metric's program);
        # train MFU reported alongside. FLOPs come from XLA cost_analysis
        # of the exact compiled programs, peak from the device kind table.
        "mfu": round(inf_mfu, 4) if inf_mfu is not None else None,
        "train_mfu": (
            round(train_mfu, 4) if train_mfu is not None else None
        ),
        "inference_flops_per_image": (
            round(inf_flops / batch) if inf_flops else None
        ),
        "train_flops_per_image": (
            round(train_flops / TRAIN_BATCH) if train_flops else None
        ),
        # text teacher+student distillation step (TextRes5ROIHeads student
        # recipe) — the fork's headline contribution, measured like train
        "text_distill_imgs_per_sec": (
            round(text_ips, 3) if text_ips is not None else None
        ),
        "text_distill_mfu": (
            round(text_mfu, 4) if text_mfu is not None else None
        ),
        "text_distill_flops_per_image": (
            round(text_flops / TRAIN_BATCH) if text_flops else None
        ),
        # one caller's end-to-end request time at batch 1 (relay/dispatch
        # included) — the serving latency DefaultPredictor delivers
        "serving_batch1_latency_ms": (
            round(lat_ms, 2) if lat_ms is not None else None
        ),
        "peak_flops": peak,
    }
    if watchdog is not None:
        watchdog.disarm()
    print(json.dumps(rec))


if __name__ == "__main__":
    import sys

    main(cpu_baseline="--cpu-baseline" in sys.argv)
