"""ROIAlign (V2 / "aligned") for TPU — gather-based bilinear sampling.

TPU-native replacement for detectron2's CUDA ROIAlignV2, used by the
reference via ``ROIPooler`` at defrcn/modeling/roi_heads/roi_heads.py:300-305
(7x7 over res4, scale 1/16) and the PCB pooler at
defrcn/evaluation/calibration_layer.py:27 (1x1, scale 1/32).

Semantics (aligned=True):
  * continuous coordinates: x_feat = x_img * spatial_scale - 0.5
  * each output bin is sampled on a sub-grid at bin-relative positions
    (j + 0.5)/S and averaged; S is either the static ``sampling_ratio`` or,
    for ``sampling_ratio=0`` (detectron2's POOLER_SAMPLING_RATIO default,
    the one every reference config runs), the per-ROI-per-axis adaptive
    count ceil(roi_size / output_size) of the CUDA kernel.
  * samples outside [-1, H] (resp. W) contribute 0; in-range samples clamp
    to [0, H-1] for the bilinear corners.

Adaptive sampling is data-dependent in the CUDA kernel but fixed-shape
here: each axis allocates the static worst case S_max = ceil(feat / P)
sample slots (an in-image ROI can never need more) and masks slot j with
weight (j < g)/g, g = ceil(bin). A ROI degenerate along an axis (g = 0)
gets all-zero weights — output 0, exactly the CUDA loop running zero
iterations. Boxes LARGER than the feature map (impossible for clipped
proposals/GT) clamp to S_max samples — the one documented deviation.

Everything is fixed-shape: R ROIs per image, vmap over the batch. Gradients
flow via XLA scatter-add from autodiff.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

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


class ROISampleGeometry(NamedTuple):
    """Per-axis sample plan shared by both ROIAlign formulations."""

    y1: jnp.ndarray      # (R,) continuous ROI starts, feature coords
    x1: jnp.ndarray
    bin_h: jnp.ndarray   # (R,) bin sizes (1e-6 degenerate clamp)
    bin_w: jnp.ndarray
    grid_y: jnp.ndarray  # (R|1, P'*Sy) in-ROI sample offsets (bin units)
    grid_x: jnp.ndarray  # (R|1, P'*Sx)
    wy: jnp.ndarray      # (R|1, Sy) per-sub-sample averaging weights
    wx: jnp.ndarray      # (R|1, Sx)
    p_out: int           # emitted bins per axis
    sy: int              # sample slots per bin along y (static)
    sx: int


def roi_sample_geometry(
    boxes: jnp.ndarray,
    spatial_scale: float,
    output_size: int,
    sampling_ratio: int,
    bin_stride: int,
    grid_dtype,
    feat_hw=None,
):
    """Shared aligned=True ROI geometry for both ROIAlign formulations.

    This is THE definition of the coordinate transform
    (``x_feat = x_img * scale - 0.5``), the 1e-6 degenerate-ROI clamp, the
    per-bin sub-sample grid ``i + (j + 0.5)/S``, and the adaptive
    ``sampling_ratio=0`` masking — ops/roi_align_mxu.py imports it so the
    two backends (switched by FSODTF_ROIALIGN) cannot silently diverge.

    ``sampling_ratio > 0``: the static SxS grid (weights uniform 1/S,
    grids shared across ROIs with leading dim 1). ``sampling_ratio == 0``:
    detectron2's adaptive g = ceil(roi/bin) per ROI per axis, realized as
    ``feat_hw``-derived static worst-case slots with masked 1/g weights
    (module docstring has the exactness argument). ``feat_hw`` (static
    feature H, W) is required for the adaptive mode.
    """
    p = output_size
    s = sampling_ratio
    x1 = boxes[:, 0] * spatial_scale - 0.5
    y1 = boxes[:, 1] * spatial_scale - 0.5
    x2 = boxes[:, 2] * spatial_scale - 0.5
    y2 = boxes[:, 3] * spatial_scale - 0.5
    bin_w = jnp.maximum(x2 - x1, 1e-6) / p
    bin_h = jnp.maximum(y2 - y1, 1e-6) / p
    bins = jnp.arange(0, p, bin_stride, dtype=grid_dtype)
    p_out = len(range(0, p, bin_stride))

    if s > 0:
        grid = (
            bins[:, None]
            + (jnp.arange(s, dtype=grid_dtype)[None, :] + 0.5) / s
        ).reshape(1, -1)  # (1, P'*S)
        w = jnp.full((1, s), 1.0 / s, grid_dtype)
        return ROISampleGeometry(
            y1, x1, bin_h, bin_w, grid, grid, w, w, p_out, s, s
        )

    if feat_hw is None:
        raise ValueError("sampling_ratio=0 (adaptive) needs feat_hw")
    h, w_ = feat_hw
    sy = max(1, -(-int(h) // p))
    sx = max(1, -(-int(w_) // p))

    def axis(raw_size, cap):
        # d2 CUDA: g = ceil(roi_size / pooled_size) from the UNCLAMPED
        # size; g = 0 (degenerate axis) -> zero iterations -> output 0,
        # reproduced by all-zero weights. Computed in f32 (bf16 grid
        # offsets would quantize sample positions by ~0.03 bins).
        g = jnp.clip(jnp.ceil(raw_size.astype(jnp.float32) / p), 0.0, cap)
        gs = jnp.maximum(g, 1.0)[:, None]  # (R, 1)
        j = jnp.arange(cap, dtype=jnp.float32)
        wgt = jnp.where(j[None, :] < g[:, None], 1.0, 0.0) / gs
        grid = (
            bins.astype(jnp.float32)[None, :, None]
            + (j[None, None, :] + 0.5) / gs[:, :, None]
        ).reshape(raw_size.shape[0], -1)  # (R, P'*cap)
        return grid.astype(grid_dtype), wgt.astype(grid_dtype)

    grid_y, wy = axis(y2 - y1, sy)
    grid_x, wx = axis(x2 - x1, sx)
    return ROISampleGeometry(
        y1, x1, bin_h, bin_w, grid_y, grid_x, wy, wx, p_out, sy, sx
    )


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
        sampling_ratio: S — SxS samples per bin, averaged; 0 = adaptive
            per-ROI ceil(roi/bin) sampling (detectron2 default).
        bin_stride: emit only the bins range(0, P, bin_stride) per axis
            (bin geometry unchanged; P' = number of emitted bins). Used to
            skip pooled positions a following strided conv never reads.

    Returns:
        (R, P', P', C) pooled features.
    """
    g = roi_sample_geometry(
        boxes, spatial_scale, output_size, sampling_ratio, bin_stride,
        feat.dtype, feat_hw=feat.shape[:2],
    )

    ys = g.y1[:, None] + g.grid_y * g.bin_h[:, None]  # (R, P'*Sy)
    xs = g.x1[:, None] + g.grid_x * g.bin_w[:, None]  # (R, P'*Sx)

    yy = ys[:, :, None]  # (R, P'*Sy, 1)
    xx = xs[:, None, :]  # (R, 1, P'*Sx)
    yy, xx = jnp.broadcast_arrays(yy, xx)  # (R, P'*Sy, P'*Sx)

    vals = _bilinear_sample(feat, yy, xx)  # (R, P'*Sy, P'*Sx, C)
    r = boxes.shape[0]
    c = feat.shape[-1]
    vals = vals.reshape(r, g.p_out, g.sy, g.p_out, g.sx, c)
    # weighted in-bin average; uniform 1/S weights for the static grid
    wy = jnp.broadcast_to(g.wy, (r, g.sy)).astype(vals.dtype)
    wx = jnp.broadcast_to(g.wx, (r, g.sx)).astype(vals.dtype)
    return jnp.einsum("rpjqkc,rj,rk->rpqc", vals, wy, wx)


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


