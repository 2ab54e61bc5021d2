"""ROIAlign (V2 / "aligned") for TPU — gather-based bilinear sampling.

TPU-native replacement for detectron2's CUDA ROIAlignV2, used by the
reference via ``ROIPooler`` at defrcn/modeling/roi_heads/roi_heads.py:300-305
(7x7 over res4, scale 1/16) and the PCB pooler at
defrcn/evaluation/calibration_layer.py:27 (1x1, scale 1/32).

Semantics (aligned=True):
  * continuous coordinates: x_feat = x_img * spatial_scale - 0.5
  * each output bin is sampled on an SxS sub-grid at bin-relative positions
    (i + 0.5)/S and averaged
  * samples outside [-1, H] (resp. W) contribute 0; in-range samples clamp
    to [0, H-1] for the bilinear corners.

Deviation from the reference config (documented): detectron2 uses
POOLER_SAMPLING_RATIO=0, i.e. a per-ROI adaptive ceil(roi/bin) sub-grid —
a data-dependent shape that XLA cannot tile. We use a static S (default 2,
detectron2's recommended explicit value); mAP impact is ~0.1 per upstream
ablations.

Everything is fixed-shape: R ROIs per image, vmap over the batch. Gradients
flow via XLA scatter-add from autodiff.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _bilinear_sample(feat: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray):
    """Sample feat (H, W, C) at continuous (ys, xs) of shape (...,).

    Out-of-range (< -1 or > size) samples return 0 (ROIAlign boundary rule).
    Returns (..., C).
    """
    h, w, _ = feat.shape
    oob = (ys < -1.0) | (ys > h) | (xs < -1.0) | (xs > w)

    y = jnp.clip(ys, 0.0, h - 1.0)
    x = jnp.clip(xs, 0.0, w - 1.0)

    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    y1 = jnp.minimum(y0 + 1.0, h - 1.0)
    x1 = jnp.minimum(x0 + 1.0, w - 1.0)

    ly = y - y0
    lx = x - x0
    hy = 1.0 - ly
    hx = 1.0 - lx

    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    y1i = y1.astype(jnp.int32)
    x1i = x1.astype(jnp.int32)

    flat = feat.reshape(h * w, -1)
    # Keep the big gathered intermediates in the feature dtype (bf16 on the
    # production path) — upcasting them to f32 quadruples peak HBM.
    dt = feat.dtype

    def take(yi, xi):
        return flat[yi * w + xi]  # gather: (..., C)

    val = (
        take(y0i, x0i) * (hy * hx)[..., None].astype(dt)
        + take(y0i, x1i) * (hy * lx)[..., None].astype(dt)
        + take(y1i, x0i) * (ly * hx)[..., None].astype(dt)
        + take(y1i, x1i) * (ly * lx)[..., None].astype(dt)
    )
    return jnp.where(oob[..., None], jnp.zeros((), dt), val)


def roi_sample_geometry(
    boxes: jnp.ndarray,
    spatial_scale: float,
    output_size: int,
    sampling_ratio: int,
    bin_stride: int,
    grid_dtype,
):
    """Shared aligned=True ROI geometry for both ROIAlign formulations.

    This is THE definition of the coordinate transform
    (``x_feat = x_img * scale - 0.5``), the 1e-6 degenerate-ROI clamp, and
    the per-bin sub-sample grid ``i + (j + 0.5)/S`` — ops/roi_align_mxu.py
    imports it so the two backends (switched by FSODTF_ROIALIGN) cannot
    silently diverge.

    Returns (y1, x1, bin_h, bin_w, grid, p_out): (R,) starts and bin sizes
    in feature coordinates, the flattened (P'*S,) in-ROI sample offsets,
    and P' = number of emitted bins per axis.
    """
    p = output_size
    s = sampling_ratio
    x1 = boxes[:, 0] * spatial_scale - 0.5
    y1 = boxes[:, 1] * spatial_scale - 0.5
    x2 = boxes[:, 2] * spatial_scale - 0.5
    y2 = boxes[:, 3] * spatial_scale - 0.5
    bin_w = jnp.maximum(x2 - x1, 1e-6) / p
    bin_h = jnp.maximum(y2 - y1, 1e-6) / p
    grid = (
        jnp.arange(0, p, bin_stride, dtype=grid_dtype)[:, None]
        + (jnp.arange(s, dtype=grid_dtype)[None, :] + 0.5) / s
    ).reshape(-1)  # (P'*S,)
    p_out = len(range(0, p, bin_stride))
    return y1, x1, bin_h, bin_w, grid, p_out


@partial(
    jax.jit,
    static_argnames=(
        "output_size", "spatial_scale", "sampling_ratio", "bin_stride"
    ),
)
def roi_align(
    feat: jnp.ndarray,
    boxes: jnp.ndarray,
    output_size: int = 7,
    spatial_scale: float = 1.0 / 16.0,
    sampling_ratio: int = 2,
    bin_stride: int = 1,
) -> jnp.ndarray:
    """ROIAlign over one feature map.

    Args:
        feat: (H, W, C) feature map (NHWC layout; channel-last is the
            TPU-friendly layout — lane dimension = C).
        boxes: (R, 4) XYXY in image coordinates.
        output_size: P — output is (R, P', P', C).
        spatial_scale: feature stride reciprocal.
        sampling_ratio: S — SxS samples per bin, averaged.
        bin_stride: emit only the bins range(0, P, bin_stride) per axis
            (bin geometry unchanged; P' = number of emitted bins). Used to
            skip pooled positions a following strided conv never reads.

    Returns:
        (R, P', P', C) pooled features.
    """
    s = sampling_ratio

    y1, x1, bin_h, bin_w, grid, p_out = roi_sample_geometry(
        boxes, spatial_scale, output_size, s, bin_stride, feat.dtype
    )

    ys = y1[:, None] + grid[None, :] * bin_h[:, None]  # (R, P'*S)
    xs = x1[:, None] + grid[None, :] * bin_w[:, None]  # (R, P'*S)

    yy = ys[:, :, None]  # (R, P'*S, 1)
    xx = xs[:, None, :]  # (R, 1, P'*S)
    yy, xx = jnp.broadcast_arrays(yy, xx)  # (R, P'*S, P'*S)

    vals = _bilinear_sample(feat, yy, xx)  # (R, P'*S, P'*S, C)
    r = boxes.shape[0]
    c = feat.shape[-1]
    vals = vals.reshape(r, p_out, s, p_out, s, c)
    return vals.mean(axis=(2, 4))


def roi_align_auto(
    feat, boxes, output_size=7, spatial_scale=1.0 / 16.0, sampling_ratio=2,
    bin_stride=1, roi_chunk=0,
):
    """Backend-aware ROIAlign: the MXU-matmul formulation by default (the
    gather version costs ~170 ms/step in HBM gathers on v5e; the matmul
    version is a few ms — see ops/roi_align_mxu.py). Identical numerics.
    Override with FSODTF_ROIALIGN=gather|mxu.

    roi_chunk=0 (default) runs all ROIs in one shot — callers that chunk
    (Res5ROIHeads.pooled_features) must not pay a second chunk split +
    concatenate inside (the concat re-copies the full pooled output,
    ~2.6 ms/step at batch 8 on v5e)."""
    import os

    if os.environ.get("FSODTF_ROIALIGN", "mxu") == "gather":
        return roi_align(
            feat, boxes, output_size, spatial_scale, sampling_ratio,
            bin_stride,
        )
    from .roi_align_mxu import roi_align_mxu

    return roi_align_mxu(
        feat, boxes, output_size, spatial_scale, sampling_ratio,
        roi_chunk, bin_stride,
    )


def roi_align_batched(
    feats: jnp.ndarray,
    boxes: jnp.ndarray,
    output_size: int = 7,
    spatial_scale: float = 1.0 / 16.0,
    sampling_ratio: int = 2,
) -> jnp.ndarray:
    """vmap over the batch: feats (B, H, W, C), boxes (B, R, 4) ->
    (B, R, P, P, C)."""
    fn = partial(
        roi_align,
        output_size=output_size,
        spatial_scale=spatial_scale,
        sampling_ratio=sampling_ratio,
    )
    return jax.vmap(fn)(feats, boxes)
