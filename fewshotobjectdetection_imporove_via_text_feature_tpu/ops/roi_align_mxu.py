"""ROIAlign as MXU matmuls — the TPU-native formulation.

Bilinear sampling is separable: every pooled output is
``out[r] = Wy[r] @ F @ Wx[r]^T`` with per-ROI interpolation matrices
Wy (P, H), Wx (P, W) whose rows are averaged bilinear tents over the
sub-sample positions (the S×S in-bin average folds into the weights).

Profiling the gather-based ROIAlign on v5e showed the gathers + relayouts
dominating the whole detector (~170 ms device time per batch-8 step vs
~23 ms for ALL backbone convs at 93% MXU). This version turns that HBM
gather storm into two dense matmuls (~1 TFLOP total at batch 8 — a few ms
on the MXU) with zero gathers.

Numerics are identical to ops/roi_align.py (same sample positions, same
aligned=True boundary rule) up to matmul accumulation order.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _interp_matrix(
    start, bin_size, size: int, p: int, s: int, dtype, bin_stride: int = 1
):
    """Pooled bilinear interpolation matrix along one axis.

    start: (R,) continuous ROI start (feature coords, aligned=True);
    bin_size: (R,). Returns (R, P', size) with P' = len(range(0, p,
    bin_stride)): row (r, i) holds the averaged bilinear weights of output
    bin range(0, p, bin_stride)[i] against the `size` feature positions.

    bin_stride > 1 emits only every bin_stride-th bin of the P-bin grid
    (bin geometry unchanged) — used to skip pooled positions that a
    following stride-`bin_stride` conv would never read.
    """
    # sample offsets within the ROI: (P'*S,)
    grid = (
        jnp.arange(0, p, bin_stride, dtype=dtype)[:, None]
        + (jnp.arange(s, dtype=dtype)[None, :] + 0.5) / s
    ).reshape(-1)
    t = start[:, None] + grid[None, :] * bin_size[:, None]  # (R, P*S)

    # boundary rule: out of [-1, size] contributes nothing; in-range
    # samples clamp to [0, size-1]
    oob = (t < -1.0) | (t > size)
    tc = jnp.clip(t, 0.0, size - 1.0)

    pos = jnp.arange(size, dtype=dtype)  # (size,)
    # bilinear tent around the clamped coordinate
    w = jnp.maximum(0.0, 1.0 - jnp.abs(tc[:, :, None] - pos[None, None, :]))
    # clamped-at-edge coordinates put full weight on the edge cell already
    w = jnp.where(oob[:, :, None], 0.0, w)
    r = start.shape[0]
    p_out = len(range(0, p, bin_stride))
    w = w.reshape(r, p_out, s, size).sum(axis=2) / s  # average sub-samples
    return w


@partial(
    jax.jit,
    static_argnames=(
        "output_size", "spatial_scale", "sampling_ratio", "roi_chunk",
        "bin_stride",
    ),
)
def roi_align_mxu(
    feat: jnp.ndarray,       # (H, W, C)
    boxes: jnp.ndarray,      # (R, 4) XYXY image coords
    output_size: int = 7,
    spatial_scale: float = 1.0 / 16.0,
    sampling_ratio: int = 2,
    roi_chunk: int = 128,
    bin_stride: int = 1,
) -> jnp.ndarray:
    """(R, P', P', C) pooled features via two matmuls per ROI chunk,
    P' = ceil(output_size / bin_stride) (the bins range(0, P, bin_stride))."""
    p = output_size
    s = sampling_ratio
    h, w, c = feat.shape
    rtot = boxes.shape[0]
    dt = feat.dtype
    wt = jnp.float32  # build weights in f32, cast for the MXU

    x1 = boxes[:, 0] * spatial_scale - 0.5
    y1 = boxes[:, 1] * spatial_scale - 0.5
    x2 = boxes[:, 2] * spatial_scale - 0.5
    y2 = boxes[:, 3] * spatial_scale - 0.5
    bin_w = jnp.maximum(x2 - x1, 1e-6) / p
    bin_h = jnp.maximum(y2 - y1, 1e-6) / p

    wy = _interp_matrix(
        y1.astype(wt), bin_h.astype(wt), h, p, s, wt, bin_stride
    )  # (R, P', H)
    wx = _interp_matrix(
        x1.astype(wt), bin_w.astype(wt), w, p, s, wt, bin_stride
    )  # (R, P', W)
    wy = wy.astype(dt)
    wx = wx.astype(dt)

    chunk = min(roi_chunk if roi_chunk > 0 else rtot, rtot)
    outs = []
    for start in range(0, rtot, chunk):
        wy_c = wy[start : start + chunk]  # (r, P, H)
        wx_c = wx[start : start + chunk]  # (r, P, W)
        # Contract the LONGER spatial axis first: the intermediate then
        # carries the shorter axis ((r,P,short,C) instead of (r,P,long,C)),
        # which cuts both its HBM footprint and the FLOPs of the second,
        # sublane-starved batched matmul. For 800x1344 inputs W>H, so the
        # W-first order shrinks the intermediate by ~40%.
        # preferred_element_type=dt: the MXU still accumulates in f32 and
        # rounds once on output — identical to f32-out + astype(dt), but
        # never materializes the f32 intermediate to HBM.
        if w >= h:
            # (r*P, W) @ (W, H*C) then per-ROI (P, H) @ (H, P*C)
            g = jnp.einsum(
                "rqw,hwc->rqhc", wx_c, feat, preferred_element_type=dt
            )
            o = jnp.einsum(
                "rph,rqhc->rpqc", wy_c, g, preferred_element_type=dt
            )
        else:
            # (r*P, H) @ (H, W*C) then per-ROI (P, W) @ (W, P*C)
            g = jnp.einsum(
                "rph,hwc->rpwc", wy_c, feat, preferred_element_type=dt
            )
            o = jnp.einsum(
                "rqw,rpwc->rpqc", wx_c, g, preferred_element_type=dt
            )
        outs.append(o)
    return jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]
