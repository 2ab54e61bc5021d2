"""Interleaved on-chip A/B of train-step variants (NOTES perf items).

Builds one executable per variant (env knobs are read at trace time),
then times them ROUND-ROBIN in a single process with the bench.py
chained-donated-steps protocol — contention hits every variant equally,
and MIN over rounds gives the clean-window figure per variant.

Usage: python tools/train_ab.py [--rounds 12] [--iters 3]
       VARIANTS="base,blk16,blk4" python tools/train_ab.py
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import numpy as np  # noqa: E402

import bench  # noqa: E402

VARIANT_ENVS = {
    "base": {},
    "blk16": {"FSODTF_NMS_BLK": "16"},
    "blk4": {"FSODTF_NMS_BLK": "4"},
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=12)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--gap", type=float, default=4.0)
    args = ap.parse_args()

    names = os.environ.get("VARIANTS", "base,blk16,blk4").split(",")

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

    model = bench.build()
    batch = bench.TRAIN_BATCH
    images = bench.make_inputs(batch, seed=5)
    gt = bench.make_gt(batch)
    init_rngs = {
        "params": jax.random.PRNGKey(0),
        "sampling": jax.random.PRNGKey(1),
        "dropout": jax.random.PRNGKey(2),
    }
    variables = jax.jit(lambda r, i, g: model.init(r, i, g, train=True))(
        init_rngs, images, gt
    )
    params0 = variables["params"]
    cfg = get_cfg()
    tx, _ = build_optimizer(cfg, params0)
    rng_key = jax.random.PRNGKey(7)

    steps = {}
    for name in names:
        saved = {}
        for k, v in VARIANT_ENVS[name].items():
            saved[k] = os.environ.get(k)
            os.environ[k] = v
        # donation: give each variant its OWN params/opt buffers
        p = jax.tree.map(lambda a: a.copy(), params0)
        o = jax.jit(tx.init)(p)
        t0 = time.time()
        step = (
            jax.jit(make_train_step(model, tx), donate_argnums=(0, 1))
            .lower(p, o, images, gt, rng_key, 0)
            .compile()
        )
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
        p, o, losses = step(p, o, images, gt, rng_key, 0)  # warmup
        np.asarray(losses["total_loss"])
        steps[name] = (step, p, o)
        print(f"[ab] {name}: compiled+warm in {time.time()-t0:.0f}s",
              flush=True)

    nonce = np.frombuffer(os.urandom(4), np.uint8)

    def fresh(k):
        imgs = np.array(images.image)
        imgs[0, 0, 0, :2] = (k // 256, k % 256)
        imgs[0, 0, 1, :4] = nonce
        return ImageBatch(image=imgs, hw=images.hw, orig_hw=images.orig_hw)

    gt_d = jax.device_put(gt)
    best = {n: float("inf") for n in names}
    k = 0
    for r in range(args.rounds):
        if r:
            time.sleep(args.gap)
        for name in names:
            step, p, o = steps[name]
            ims = [jax.device_put(fresh(k + i)) for i in range(args.iters)]
            for im in ims:
                jax.block_until_ready(im.image)
            k += args.iters
            t0 = time.perf_counter()
            for i, im in enumerate(ims):
                p, o, losses = step(p, o, im, gt_d, rng_key, k + i)
            np.asarray(losses["total_loss"])
            dt = (time.perf_counter() - t0) / args.iters
            steps[name] = (step, p, o)
            best[name] = min(best[name], dt)
            print(f"[ab] round {r} {name}: {dt*1000:.1f} ms/step "
                  f"(best {best[name]*1000:.1f})", flush=True)

    print("== results (min ms/step, imgs/s) ==")
    for name in names:
        print(f"  {name}: {best[name]*1000:.1f} ms  "
              f"{batch/best[name]:.1f} img/s")


if __name__ == "__main__":
    main()
