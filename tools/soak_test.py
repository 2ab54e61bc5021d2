"""Production-scale soak test (VERDICT r2 task 8).

Drives the real CLI for a ~2k-iteration R-101 800x1344 bf16 training run
on the TPU with async checkpoints enabled, injects a SIGTERM mid-run
once metrics.json shows the target iteration, then resumes with
--resume to completion and validates:

  * leg 1 exits rc 0 with a resumable checkpoint and NO model_final,
  * leg 2 resumes at the saved iteration and reaches model_final,
  * metrics.json across both legs: iterations strictly increasing with
    no gap at the preemption boundary, every loss finite (no NaN/inf),
  * loss trend: mean total_loss over the last decile < mean over the
    first decile (catches slow divergence a 300-iter smoke cannot),
  * step-time stability: median time_per_20iter over the steady tail
    and its IQR are printed for the ledger; a hung relay surfaces as
    the subprocess timeout.

Usage:  python tools/soak_test.py [--iters 2000] [--preempt-at 900]
        [--save-dir /tmp/soak] [--tiny]   (--tiny: CPU-profile smoke of
        the soak driver itself)

Reference budget semantics: configs/voc/defrcn_det_r101_base1.yaml:20-24.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _opts(args, out):
    common = [
        "MODEL.WEIGHTS", "",
        "SOLVER.MAX_ITER", str(args.iters),
        "SOLVER.STEPS", f"({args.iters * 3 // 4},{args.iters * 9 // 10})",
        "SOLVER.CHECKPOINT_PERIOD", str(args.ckpt_period),
        "TEST.EVAL_PERIOD", "0",
        "DATASETS.TEST", "()",
        "SEED", "13",
        "OUTPUT_DIR", out,
    ]
    if args.tiny:
        common += [
            "MODEL.RESNETS.DEPTH", "14",
            "MODEL.RESNETS.STEM_OUT_CHANNELS", "8",
            "MODEL.RESNETS.RES2_OUT_CHANNELS", "16",
            "MODEL.RESNETS.WIDTH_PER_GROUP", "4",
            "MODEL.BACKBONE.FREEZE_AT", "0",
            "MODEL.RPN.PRE_NMS_TOPK_TRAIN", "256",
            "MODEL.RPN.POST_NMS_TOPK_TRAIN", "64",
            "MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE", "16",
            "TPU.IMAGE_BUCKETS", "((256,384),)",
            "TPU.MAX_GT", "10",
            "TPU.MAX_DETECTIONS_PRE_NMS", "128",
            "TPU.COMPUTE_DTYPE", "float32",
            "INPUT.MIN_SIZE_TRAIN", "(256,)",
            "INPUT.MAX_SIZE_TRAIN", "384",
            "SOLVER.IMS_PER_BATCH", "2",
            "SOLVER.BASE_LR", "0.001",
            "SOLVER.WARMUP_ITERS", "0",
        ]
    else:
        # FULL production profile: R-101 C4, 800x1344, bf16, device
        # preprocessing, native IO, Pallas NMS (all defaults), batch 16.
        common += [
            "MODEL.BACKBONE.FREEZE_AT", "2",
            "SOLVER.IMS_PER_BATCH", "16",
            "SOLVER.BASE_LR", "0.02",
            "SOLVER.WARMUP_ITERS", "100",
        ]
    return common


def _read_metrics(out):
    path = os.path.join(out, "metrics.json")
    if not os.path.exists(path):
        return []
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                try:
                    rows.append(json.loads(line))
                except json.JSONDecodeError:
                    pass  # torn tail line during a live write
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=2000)
    ap.add_argument("--preempt-at", type=int, default=900)
    ap.add_argument("--ckpt-period", type=int, default=200)
    ap.add_argument("--save-dir", default="/tmp/soak_test")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--timeout", type=int, default=5400,
                    help="per-leg wall timeout seconds")
    args = ap.parse_args()

    save = args.save_dir
    shutil.rmtree(save, ignore_errors=True)
    os.makedirs(save, exist_ok=True)
    data_root = os.path.join(save, "datasets")
    subprocess.run(
        # base1 trains on BOTH years' trainval splits — 2012 must be
        # non-empty or the loader fails fast
        [sys.executable, "tools/_make_generalization_voc.py",
         "--root", data_root, "--train-2007", "16", "--train-2012", "8",
         "--val", "4", "--shots", "1"],
        cwd=REPO, check=True,
    )
    out = os.path.join(save, "run")
    env = dict(
        os.environ,
        FSODTF_DATASETS=data_root,
    )
    if args.tiny:
        env["FSODTF_PLATFORM"] = "cpu"
        env.pop("JAX_PLATFORMS", None)

    base_cmd = [
        sys.executable, "main.py",
        "--config-file", "configs/voc/defrcn_det_r101_base1.yaml",
    ]
    # --resume must precede --opts (argparse gives --opts every later token)
    cmd = base_cmd + ["--opts", *_opts(args, out)]
    resume_cmd = base_cmd + ["--resume", "--opts", *_opts(args, out)]

    # ---- leg 1: train, SIGTERM once metrics pass the preempt iteration
    print(f"[soak] leg 1: {args.iters} iters, SIGTERM at ~{args.preempt_at}")
    t0 = time.time()
    with open(os.path.join(save, "leg1.log"), "w") as logf:
        proc = subprocess.Popen(
            cmd, cwd=REPO, env=env, stdout=logf, stderr=subprocess.STDOUT
        )
        sent = False
        while proc.poll() is None:
            if time.time() - t0 > args.timeout:
                proc.kill()
                raise SystemExit("[soak] leg 1 timed out")
            rows = _read_metrics(out)
            if not sent and rows and rows[-1]["iteration"] >= args.preempt_at:
                print(f"[soak] SIGTERM at iter {rows[-1]['iteration']} "
                      f"({time.time()-t0:.0f}s)")
                proc.send_signal(signal.SIGTERM)
                sent = True
            time.sleep(2.0)
    assert sent, "training finished before the preemption point"
    assert proc.returncode == 0, f"leg 1 rc={proc.returncode}"
    assert not os.path.exists(os.path.join(out, "model_final.ckpt")), \
        "preempted run must not write model_final"
    ckpts = [f for f in os.listdir(out) if f.startswith("model_0")]
    assert ckpts, "no resumable checkpoint written"
    leg1_rows = _read_metrics(out)
    leg1_last = leg1_rows[-1]["iteration"]
    print(f"[soak] leg 1 done: preempted cleanly, last metric iter "
          f"{leg1_last}, ckpts={sorted(ckpts)[-2:]}")

    # ---- leg 2: resume to completion
    print("[soak] leg 2: --resume to completion")
    t1 = time.time()
    with open(os.path.join(save, "leg2.log"), "w") as logf:
        rc = subprocess.run(
            resume_cmd, cwd=REPO, env=env, stdout=logf,
            stderr=subprocess.STDOUT, timeout=args.timeout,
        ).returncode
    assert rc == 0, f"leg 2 rc={rc}"
    assert os.path.exists(os.path.join(out, "model_final.ckpt"))

    # ---- validate the merged metrics stream
    rows = _read_metrics(out)
    iters = [r["iteration"] for r in rows]
    assert iters == sorted(set(iters)), "iterations not strictly increasing"
    # no gap at the preemption boundary beyond the 20-iter logging period
    gaps = [b - a for a, b in zip(iters, iters[1:])]
    assert max(gaps) <= 20, f"metric gap {max(gaps)} > logging period"
    assert iters[-1] == args.iters - 1, (iters[-1], args.iters)
    for r in rows:
        for k, v in r.items():
            if k.startswith("loss") or k == "total_loss":
                assert v == v and abs(v) != float("inf"), (r["iteration"], k, v)

    dec = max(1, len(rows) // 10)
    first = sum(r["total_loss"] for r in rows[:dec]) / dec
    last = sum(r["total_loss"] for r in rows[-dec:]) / dec
    assert last < first, f"loss did not trend down: {first:.3f} -> {last:.3f}"

    times = sorted(
        r["time_per_20iter"] for r in rows[len(rows) // 4 :]
        if "time_per_20iter" in r
    )
    med = times[len(times) // 2]
    iqr = times[3 * len(times) // 4] - times[len(times) // 4]
    print(
        f"[soak] PASSED: {args.iters} iters across a SIGTERM+resume, "
        f"loss {first:.3f} -> {last:.3f}, steady step time "
        f"median {med:.2f}s/20it (IQR {iqr:.2f}), "
        f"walls {time.time()-t1:.0f}s+{t1-t0:.0f}s"
    )


if __name__ == "__main__":
    main()
