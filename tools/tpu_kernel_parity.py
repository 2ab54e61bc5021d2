"""On-hardware numeric parity for the custom TPU kernels.

The pytest suite validates the kernels on CPU (Pallas in interpret mode,
XLA on the host backend); this tool re-asserts the same contracts on the
REAL chip, where Mosaic lowering and MXU rounding are in play:

  1. Pallas NMS keep set == XLA tiled NMS keep set (identical greedy
     semantics) at the production sizes (12000 train / 6000 test / 2048
     detection candidates), across iou thresholds.
  2. roi_align_mxu (two-matmul formulation) == gather-based roi_align on
     the same inputs, f32, under jax.default_matmul_precision("float32")
     (the MXU otherwise rounds f32 operands to bf16 — NOTES.md).
  3. The same pair in bf16 stays within bf16 tolerance.
  4. Box encode/decode roundtrip on-chip == numpy reference.

Usage: python tools/tpu_kernel_parity.py   (exit 0 = all parities hold)

No reference analog (the reference trusts detectron2's CUDA kernels);
this is the TPU build's equivalent of detectron2's kernel unit tests run
against the deployed backend.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _rand_boxes(rng, n, hw=(800, 1344), cluster=True):
    h, w = hw
    if cluster:
        # clustered boxes create real suppression chains (the hard case
        # for greedy-order parity); uniform boxes barely overlap
        centers = rng.uniform(0, [w, h], (max(n // 50, 1), 2))
        pick = centers[rng.randint(0, len(centers), n)]
        jitter = rng.normal(0, 40, (n, 2))
        cxy = np.clip(pick + jitter, 0, [w, h])
        wh = rng.uniform(8, 160, (n, 2))
    else:
        cxy = rng.uniform(0, [w, h], (n, 2))
        wh = rng.uniform(4, 300, (n, 2))
    x1y1 = np.clip(cxy - wh / 2, 0, [w, h])
    x2y2 = np.clip(cxy + wh / 2, 0, [w, h])
    return np.concatenate([x1y1, x2y2], 1).astype(np.float32)


def check_nms(jax, jnp):
    from fewshotobjectdetection_imporove_via_text_feature_tpu.ops.nms import (
        nms_fixed,
    )
    from fewshotobjectdetection_imporove_via_text_feature_tpu.ops.nms_pallas import (
        nms_fixed_pallas,
    )

    rng = np.random.RandomState(0)
    fails = 0
    for n in (2048, 6144, 12288):
        for thresh in (0.5, 0.7):
            boxes = _rand_boxes(rng, n)
            # well-separated scores: rank order is unambiguous, so both
            # implementations must walk the identical greedy order (ties
            # under bf16/f32 rank noise are a measurement artifact, not a
            # semantics difference — tests pin tie-breaking separately)
            scores = rng.permutation(n).astype(np.float32) / n
            valid = rng.uniform(size=n) > 0.1
            keep_x, _ = jax.jit(nms_fixed, static_argnames="iou_threshold")(
                boxes, scores, valid, thresh
            )
            keep_p, _ = jax.jit(
                nms_fixed_pallas, static_argnames=("iou_threshold", "interpret")
            )(boxes, scores, valid, thresh)
            keep_x = np.asarray(keep_x)
            keep_p = np.asarray(keep_p)
            same = (keep_x == keep_p).all()
            print(
                f"  nms n={n} thresh={thresh}: kept xla={int(keep_x.sum())} "
                f"pallas={int(keep_p.sum())} identical={bool(same)}"
            )
            fails += not same

            # max_keep early exit (the production callers' mode): both
            # backends stop at the same tile boundary, and the kept set is
            # a prefix (in score order) of the full run's
            mk = max(1, int(keep_x.sum()) // 2)
            order = np.argsort(-scores, kind="stable")
            sb = jnp.asarray(boxes[order])
            sv = jnp.asarray(valid[order])
            lim_x, _ = jax.jit(
                nms_fixed,
                static_argnames=("iou_threshold", "assume_sorted", "max_keep"),
            )(sb, jnp.asarray(scores[order]), sv, thresh,
              assume_sorted=True, max_keep=mk)
            lim_p, _ = jax.jit(
                nms_fixed_pallas,
                static_argnames=(
                    "iou_threshold", "interpret", "assume_sorted", "max_keep"
                ),
            )(sb, jnp.asarray(scores[order]), sv, thresh,
              assume_sorted=True, max_keep=mk)
            lim_x = np.asarray(lim_x)
            lim_p = np.asarray(lim_p)
            full_sorted = keep_x[order]
            prefix_ok = (
                (lim_x == lim_p).all()
                and not (lim_x & ~full_sorted).any()
                and lim_x.sum() >= min(mk, full_sorted.sum())
                and (
                    np.where(lim_x)[0]
                    == np.where(full_sorted)[0][: int(lim_x.sum())]
                ).all()
            )
            print(
                f"  nms n={n} thresh={thresh} max_keep={mk}: kept "
                f"xla={int(lim_x.sum())} pallas={int(lim_p.sum())} "
                f"prefix_exact={bool(prefix_ok)}"
            )
            fails += not prefix_ok
    return fails


def check_roi_align(jax, jnp):
    from fewshotobjectdetection_imporove_via_text_feature_tpu.ops.roi_align import (
        roi_align,
    )
    from fewshotobjectdetection_imporove_via_text_feature_tpu.ops.roi_align_mxu import (
        roi_align_mxu,
    )

    rng = np.random.RandomState(1)
    h, w, c = 50, 84, 256
    feat = rng.normal(size=(h, w, c)).astype(np.float32)
    boxes = _rand_boxes(rng, 512, hw=(h * 16, w * 16), cluster=False)
    fails = 0

    with jax.default_matmul_precision("float32"):
        a = np.asarray(jax.jit(roi_align)(feat, boxes))
        b = np.asarray(jax.jit(roi_align_mxu)(feat, boxes))
    rel = np.abs(a - b).max() / max(np.abs(a).max(), 1e-6)
    print(f"  roi_align f32 (matmul_precision=float32): max rel {rel:.2e}")
    fails += rel > 1e-5

    af = np.asarray(jax.jit(roi_align)(feat.astype(jnp.bfloat16), boxes))
    bf = np.asarray(
        jax.jit(roi_align_mxu)(feat.astype(jnp.bfloat16), boxes)
    ).astype(np.float32)
    rel16 = np.abs(af.astype(np.float32) - bf).max() / max(
        np.abs(af.astype(np.float32)).max(), 1e-6
    )
    print(f"  roi_align bf16: max rel {rel16:.2e}")
    fails += rel16 > 0.05  # bf16 has ~3 decimal digits; gather vs matmul

    # adaptive sampling_ratio=0 (the production config): same contract
    with jax.default_matmul_precision("float32"):
        aa = np.asarray(
            jax.jit(lambda f, b: roi_align(f, b, 7, 1 / 16.0, 0))(feat, boxes)
        )
        ba = np.asarray(
            jax.jit(lambda f, b: roi_align_mxu(f, b, 7, 1 / 16.0, 0))(
                feat, boxes
            )
        )
    rel0 = np.abs(aa - ba).max() / max(np.abs(aa).max(), 1e-6)
    print(f"  roi_align adaptive (ratio=0) f32: max rel {rel0:.2e}")
    fails += rel0 > 1e-5
    return fails


def check_box_transform(jax, jnp):
    from fewshotobjectdetection_imporove_via_text_feature_tpu.ops.box_ops import (
        decode_deltas,
        encode_deltas,
    )

    def boxes_of(rng, n):
        # un-clipped, non-degenerate boxes with w/h ratios inside the
        # SCALE_CLAMP window so the decode clamp never engages
        cxy = rng.uniform(100, 700, (n, 2)).astype(np.float32)
        wh = rng.uniform(8, 160, (n, 2)).astype(np.float32)
        return np.concatenate([cxy - wh / 2, cxy + wh / 2], 1)

    rng = np.random.RandomState(2)
    src = boxes_of(rng, 4096)
    dst = boxes_of(rng, 4096)
    weights = (10.0, 10.0, 5.0, 5.0)
    deltas = jax.jit(encode_deltas, static_argnames="weights")(
        src, dst, weights=weights
    )
    back = np.asarray(
        jax.jit(decode_deltas, static_argnames="weights")(
            np.asarray(deltas), src, weights=weights
        )
    )
    err = np.abs(back - dst).max()
    print(f"  box encode->decode roundtrip on-chip: max abs err {err:.2e}")
    return int(err > 1e-2)


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"backend: {dev.platform} ({dev.device_kind})")
    if dev.platform != "tpu" and "--allow-cpu" not in sys.argv:
        # a CPU fallback would test neither Mosaic lowering nor MXU
        # rounding — exactly what this tool exists to validate; a green
        # exit there would be a false on-hardware pass
        print("not a TPU backend; refusing (pass --allow-cpu to override)")
        return 2
    fails = 0
    print("NMS: Pallas kernel vs XLA tiled (exact keep-set match)")
    fails += check_nms(jax, jnp)
    print("ROIAlign: MXU two-matmul vs gather formulation")
    fails += check_roi_align(jax, jnp)
    print("Box2Box transform roundtrip")
    fails += check_box_transform(jax, jnp)
    print("ALL PARITIES HOLD" if not fails else f"{fails} PARITY FAILURES")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
