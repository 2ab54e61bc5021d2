"""Device-side fused preprocessing (BASELINE north star: "image
preprocessing (resize/normalize/augment) fuses into an XLA-compiled input
pipeline").

The host loader only decodes JPEGs and pads the RAW pixels into a source
bucket; resize-shortest-edge (per-image dynamic scale, static output
shape via jax.image.scale_and_translate), horizontal flip, and pixel
normalization all run on the TPU in one jit program. The reference does
all of this per image in Python/PIL on the host
(defrcn/dataloader/dataset_mapper.py:18-180).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


@partial(
    jax.jit,
    static_argnames=("max_size", "out_hw", "out_s2d"),
)
def device_resize_batch(
    raw: jnp.ndarray,       # (B, Hs, Ws, 3) uint8/float — raw pixels padded
    orig_hw: jnp.ndarray,   # (B, 2) valid (h, w) within raw
    flip: jnp.ndarray,      # (B,) bool
    short,                  # scalar or (B,) — per-image for multi-scale train
    max_size: int,
    out_hw: Tuple[int, int],
    out_s2d: bool = False,
):
    """ResizeShortestEdge + hflip into a fixed (B, H, W, 3) canvas.

    Returns (images float32 (B, H, W, 3), new_hw (B, 2) int32).
    detectron2 scale rule: scale = short / min(h, w), then shrink to keep
    max(h, w) * scale <= max_size; output rounded like the host mapper.

    out_s2d=True emits the backbone stem's 2x2 space-to-depth layout
    (B, H/2, W/2, 12) directly: the resize runs as four sub-grid
    scale_and_translate passes (one per 2x2 phase, translation shifted by
    (0.25 - p/2)) whose channel concatenation IS the s2d layout — same
    interpolation math as the plain resize, but no on-device relayout
    afterwards (the C=3 shuffle costs ~1.6 ms/step at batch 8).
    """
    oh, ow = out_hw
    short = jnp.broadcast_to(
        jnp.asarray(short, jnp.float32), (raw.shape[0],)
    )

    def per_image(img, hw, fl, sh):
        h = hw[0].astype(jnp.float32)
        w = hw[1].astype(jnp.float32)
        scale = sh / jnp.minimum(h, w)
        scale = jnp.minimum(scale, max_size / jnp.maximum(h, w))
        newh = jnp.floor(h * scale + 0.5)
        neww = jnp.floor(w * scale + 0.5)
        # effective scale after rounding (matches PIL resize of the host
        # path up to resampling differences)
        sy = newh / h
        sx = neww / w

        # One clamped-index gather does flip (x -> w-1-x within the valid
        # region) AND edge-replicates the last valid row/col into the pad,
        # all on uint8 (4x less traffic than the old f32 flip+roll+where).
        # Replication matters for upscaling: the linear kernel's last
        # output row/col taps the first pad row/col (e.g. h=480 short=800:
        # src 479.2 reads row 480 at weight 0.2) and scale_and_translate
        # does NOT renormalize taps that are in-range for the padded
        # canvas — zero pad darkened the bottom/right border of every
        # upscaled image. Replication reproduces the edge-clamped result
        # of resizing the unpadded image exactly (PIL semantics, matching
        # the host mapper path).
        hs, ws = img.shape[0], img.shape[1]
        rows = jnp.minimum(jnp.arange(hs), hw[0] - 1)
        cols = jnp.minimum(jnp.arange(ws), hw[1] - 1)
        cols = jnp.where(fl, hw[1] - 1 - cols, cols)
        img = img[rows][:, cols].astype(jnp.float32)

        new_hw = jnp.stack([newh, neww]).astype(jnp.int32)

        if not out_s2d:
            out = jax.image.scale_and_translate(
                img,
                shape=(oh, ow, 3),
                spatial_dims=(0, 1),
                scale=jnp.stack([sy, sx]),
                translation=jnp.zeros((2,), jnp.float32),
                method="linear",
                antialias=False,
            )
            # zero out beyond the valid resized extent
            yy = jnp.arange(oh, dtype=jnp.float32)[:, None]
            xx = jnp.arange(ow, dtype=jnp.float32)[None, :]
            mask = (yy < newh) & (xx < neww)
            out = out * mask[..., None]
            return out, new_hw

        # sub-grid pass (p, q): output rows 2i+p, cols 2j+q of the full
        # resize. scale_and_translate samples src(o) = (o + 0.5 - t)/s
        # - 0.5; with s' = s/2 and t' = 0.25 - p/2 this lands exactly on
        # the full-resolution sample positions (2i + p + 0.5)/s - 0.5.
        parts = []
        yy = jnp.arange(oh // 2, dtype=jnp.float32)[:, None]
        xx = jnp.arange(ow // 2, dtype=jnp.float32)[None, :]
        for p in (0, 1):
            for q in (0, 1):
                sub = jax.image.scale_and_translate(
                    img,
                    shape=(oh // 2, ow // 2, 3),
                    spatial_dims=(0, 1),
                    scale=jnp.stack([sy / 2.0, sx / 2.0]),
                    translation=jnp.asarray(
                        [0.25 - p / 2.0, 0.25 - q / 2.0], jnp.float32
                    ),
                    method="linear",
                    antialias=False,
                )
                mask = (2.0 * yy + p < newh) & (2.0 * xx + q < neww)
                parts.append(sub * mask[..., None])
        return jnp.concatenate(parts, axis=-1), new_hw

    return jax.vmap(per_image)(raw, orig_hw, flip, short)


def scale_boxes(boxes, orig_hw, new_hw, flip):
    """Host-side GT box transform matching device_resize_batch.

    boxes (G, 4) in original coords; returns resized/flipped boxes.
    """
    import numpy as np

    h0, w0 = float(orig_hw[0]), float(orig_hw[1])
    h1, w1 = float(new_hw[0]), float(new_hw[1])
    sy, sx = h1 / h0, w1 / w0
    b = np.asarray(boxes, np.float32).copy()
    if flip:
        x1 = w0 - b[:, 2]
        x2 = w0 - b[:, 0]
        b[:, 0], b[:, 2] = x1, x2
    b *= np.array([sx, sy, sx, sy], np.float32)
    b[:, 0::2] = b[:, 0::2].clip(0, w1)
    b[:, 1::2] = b[:, 1::2].clip(0, h1)
    return b
