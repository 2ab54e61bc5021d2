"""Fixed-shape batched detection structures (pytrees).

TPU-native replacement for detectron2's ragged ``Instances``/``Boxes``/
``ImageList`` (which the reference manipulates per image in Python loops):
every field is a dense, padded array with an explicit validity mask, so the
whole batch flows through one jit-compiled program.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class ImageBatch:
    """Batched padded images.

    image: (B, H, W, 3) float32 — raw pixels (normalization happens in the
        model, ref rcnn.py:108-115), BGR channel order to match the Caffe2
        pixel stats.
    hw: (B, 2) int32 — valid (height, width) of each image after resize,
        before padding (== detectron2 ImageList.image_sizes).
    orig_hw: (B, 2) int32 — original file size, for output rescaling.
    """

    image: jnp.ndarray
    hw: jnp.ndarray
    orig_hw: jnp.ndarray


@struct.dataclass
class GTInstances:
    """Padded ground truth: boxes (B, G, 4) XYXY in the resized image frame,
    classes (B, G) int32, valid (B, G) bool."""

    boxes: jnp.ndarray
    classes: jnp.ndarray
    valid: jnp.ndarray


@struct.dataclass
class Proposals:
    """Padded proposals: boxes (B, P, 4), objectness (B, P), valid (B, P)."""

    boxes: jnp.ndarray
    objectness: jnp.ndarray
    valid: jnp.ndarray


@struct.dataclass
class Detections:
    """Padded final detections per image.

    boxes (B, D, 4) in the ORIGINAL image frame; scores (B, D);
    classes (B, D) int32; valid (B, D) bool.
    """

    boxes: jnp.ndarray
    scores: jnp.ndarray
    classes: jnp.ndarray
    valid: jnp.ndarray
