"""Dataset mapper: file record -> fixed-shape numpy training example.

Replaces defrcn/dataloader/dataset_mapper.py: reads the image, applies
RandomCrop when INPUT.CROP.ENABLED (train only, before resize — reference
dataset_mapper.py:83-87), ResizeShortestEdge (multi-scale choice at train,
fixed at test) and random horizontal flip, transforms boxes, then pads
image and GT to static shapes (bucketed image sizes + MAX_GT slots) so
every batch compiles to one of a handful of XLA programs.
"""

from __future__ import annotations

import math
from typing import Dict, List, Sequence, Tuple

import numpy as np
from PIL import Image

__all__ = [
    "DatasetMapper",
    "crop_boxes",
    "pick_bucket",
    "random_crop_plan",
    "random_crop_size",
    "resize_shortest_edge_size",
]


def _open_oriented(file_name: str):
    """Open an image with EXIF orientation applied, like the reference's
    read_image -> _apply_exif_orientation (d2 detection_utils; annotations
    describe the displayed orientation). Returns (img, oriented): the
    orientation tag is read from the lazy header, and the pixel transpose
    only happens for the rare rotated file; `oriented` tells callers the
    stored pixels differ from the displayed ones (so the raw libjpeg
    decode path must not be used)."""
    img = Image.open(file_name)  # header only (lazy decode)
    try:
        orientation = img.getexif().get(0x0112, 1)
    except Exception:
        orientation = 1
    if orientation == 1:
        return img, False
    from PIL import ImageOps

    return ImageOps.exif_transpose(img), True


def resize_shortest_edge_size(h, w, short, max_size):
    """detectron2 ResizeShortestEdge.get_output_shape semantics."""
    scale = short / min(h, w)
    if h < w:
        newh, neww = short, scale * w
    else:
        newh, neww = scale * h, short
    if max(newh, neww) > max_size:
        scale2 = max_size / max(newh, neww)
        newh, neww = newh * scale2, neww * scale2
    return int(newh + 0.5), int(neww + 0.5)


def random_crop_size(crop_type: str, crop_size, h: int, w: int, rng):
    """d2 RandomCrop.get_crop_size (augmentation_impl.py): the (ch, cw)
    crop extent for an (h, w) image. Draws (for the *_range types) come
    from `rng`, our per-item stream, not np.random (documented deviation:
    this build's rngs are item-seeded for multi-host lockstep)."""
    if crop_type == "relative":
        fh, fw = crop_size
        return int(h * fh + 0.5), int(w * fw + 0.5)
    if crop_type == "relative_range":
        lo = np.asarray(crop_size, dtype=np.float32)
        fh, fw = lo + rng.rand(2).astype(np.float32) * (1 - lo)
        return int(h * fh + 0.5), int(w * fw + 0.5)
    if crop_type == "absolute":
        return min(int(crop_size[0]), h), min(int(crop_size[1]), w)
    if crop_type == "absolute_range":
        if crop_size[0] > crop_size[1]:
            raise ValueError(f"absolute_range needs lo <= hi: {crop_size}")
        ch = rng.randint(min(h, int(crop_size[0])), min(h, int(crop_size[1])) + 1)
        cw = rng.randint(min(w, int(crop_size[0])), min(w, int(crop_size[1])) + 1)
        return int(ch), int(cw)
    raise ValueError(f"Unknown INPUT.CROP.TYPE: {crop_type!r}")


def random_crop_plan(crop_type: str, crop_size, h: int, w: int, rng):
    """d2 RandomCrop.get_transform: draw the crop extent then a uniform
    offset; returns (y0, x0, ch, cw). Draw order (size -> y0 -> x0) is
    fixed so DatasetMapper.plan and __call__ stay rng-lockstep."""
    ch, cw = random_crop_size(crop_type, crop_size, h, w, rng)
    if not (h >= ch and w >= cw):
        raise ValueError(f"crop ({ch}, {cw}) larger than image ({h}, {w})")
    y0 = int(rng.randint(h - ch + 1))
    x0 = int(rng.randint(w - cw + 1))
    return y0, x0, ch, cw


def crop_boxes(boxes: np.ndarray, y0, x0, ch, cw) -> np.ndarray:
    """d2 CropTransform.apply_box + transform_instance_annotations clip:
    shift XYXY boxes into the crop frame and clip to its extent. Callers
    drop the resulting degenerate (zero-area) boxes, matching
    detection_utils.filter_empty_instances."""
    shifted = boxes - np.array([x0, y0, x0, y0], np.float32)
    shifted[:, 0::2] = shifted[:, 0::2].clip(0, cw)
    shifted[:, 1::2] = shifted[:, 1::2].clip(0, ch)
    return shifted


def pick_bucket(h: int, w: int, buckets: Sequence[Tuple[int, int]]):
    """Smallest bucket (by area) covering (h, w); orientation-aware (both
    (a, b) and (b, a) are considered). Falls back to round-up-to-64."""
    cands = []
    for bh, bw in buckets:
        for ch, cw in ((bh, bw), (bw, bh)):
            if ch >= h and cw >= w:
                cands.append((ch * cw, ch, cw))
    if cands:
        _, bh, bw = min(cands)
        return bh, bw
    up = lambda v: int(math.ceil(v / 64.0) * 64)
    return up(h), up(w)


class DatasetMapper:
    def __init__(
        self,
        is_train: bool,
        min_size,
        max_size: int,
        buckets: Sequence[Tuple[int, int]],
        max_gt: int = 100,
        image_format: str = "BGR",
        random_flip: bool = True,
        device_preprocess: bool = False,
        raw_buckets: Sequence[Tuple[int, int]] = (),
        native_io: bool = True,
        host_s2d: bool = False,
        sampling: str = "choice",
        crop=None,
    ):
        self.is_train = is_train
        self.min_sizes = (
            list(min_size) if isinstance(min_size, (list, tuple)) else [min_size]
        )
        # d2 ResizeShortestEdge sample_style: "choice" draws one of the
        # listed sizes; "range" draws uniformly from [min, max] inclusive
        # (augmentation_impl.py semantics behind INPUT.MIN_SIZE_TRAIN_SAMPLING)
        if sampling not in ("choice", "range"):
            raise ValueError(f"Unknown MIN_SIZE_TRAIN_SAMPLING: {sampling!r}")
        if sampling == "range" and (
            len(self.min_sizes) != 2
            or self.min_sizes[0] > self.min_sizes[1]
        ):
            raise ValueError(
                "range sampling needs MIN_SIZE_TRAIN = (min, max) with "
                f"min <= max, got {tuple(self.min_sizes)!r}"
            )
        self.sampling = sampling
        self.max_size = max_size
        self.buckets = list(buckets)
        self.max_gt = max_gt
        self.image_format = image_format
        self.random_flip = random_flip and is_train
        self.device_preprocess = device_preprocess
        self.raw_buckets = list(raw_buckets)
        self.native_io = native_io
        # host 2x2 space-to-depth (backbone.py space_to_depth); skips the
        # on-device relayout the s2d stem otherwise pays
        self.host_s2d = host_s2d and not device_preprocess
        # INPUT.CROP: (type, size) or None. Train-only, applied BEFORE
        # resize/flip like the reference's augs.insert(0, T.RandomCrop)
        # (dataset_mapper.py:83-87). validate draw-free types eagerly.
        self.crop = None
        if crop is not None and is_train:
            ctype, csize = crop
            if ctype not in (
                "relative", "relative_range", "absolute", "absolute_range"
            ):
                raise ValueError(f"Unknown INPUT.CROP.TYPE: {ctype!r}")
            if ctype == "absolute_range" and csize[0] > csize[1]:
                raise ValueError(f"absolute_range needs lo <= hi: {csize}")
            self.crop = (ctype, tuple(csize))

    def plan(self, record: Dict, rng: np.random.RandomState) -> Dict:
        """Metadata-only mapping plan: the (short, flip) draws and the
        resulting bucket, WITHOUT touching pixels.

        Consumes `rng` exactly like __call__ does, so plan(record, rng0) and
        __call__(record, rng1, plan=...) with identically-seeded rngs agree.
        Used by the multi-host loader: every process simulates the same
        global stream's bucket grouping from metadata and only decodes the
        images of its own slice (reference analog: one TrainingSampler
        shuffle shared by all ranks, dataloader/build.py:250-290).
        """
        h0 = record.get("height")
        w0 = record.get("width")
        if h0 is None or w0 is None:  # metadata missing: read the header
            with Image.open(record["file_name"]) as img:
                w0, h0 = img.size
                # DISPLAYED size, like the decode paths (_open_oriented):
                # orientations 5-8 transpose the stored dimensions
                try:
                    if img.getexif().get(0x0112, 1) in (5, 6, 7, 8):
                        w0, h0 = h0, w0
                except Exception:
                    pass
        # crop draws FIRST (aug order: crop -> resize -> flip, reference
        # dataset_mapper.py:83); the cropped extent is what resize sees
        crop = None
        ch, cw = h0, w0
        if self.crop is not None:
            crop = random_crop_plan(self.crop[0], self.crop[1], h0, w0, rng)
            ch, cw = crop[2], crop[3]
        if not self.is_train:
            short = self.min_sizes[0]
        elif self.sampling == "range":
            short = int(rng.randint(self.min_sizes[0], self.min_sizes[1] + 1))
        else:
            short = self.min_sizes[rng.randint(len(self.min_sizes))]
        flip = bool(self.random_flip and rng.rand() < 0.5)
        nh, nw = resize_shortest_edge_size(ch, cw, short, self.max_size)
        if self.device_preprocess:
            rbh, rbw = pick_bucket(ch, cw, self.raw_buckets or self.buckets)
            tbh, tbw = pick_bucket(nh, nw, self.buckets)
            bucket = (rbh, rbw, tbh, tbw)
        else:
            bucket = pick_bucket(nh, nw, self.buckets)
        return {"short": short, "flip": flip, "bucket": bucket, "crop": crop}

    def __call__(
        self, record: Dict, rng: np.random.RandomState, plan: Dict = None
    ):
        if plan is None:
            plan = self.plan(record, rng)
        if self.device_preprocess:
            return self._call_raw(record, plan)
        return self._call_host(record, plan)

    @staticmethod
    def _check_crop_fits(record: Dict, cropplan, h0: int, w0: int):
        """The crop plan was derived from the record's height/width
        metadata; a stale record (or EXIF-rotated file the metadata
        missed) could place the crop outside the decoded pixels. Both
        decode paths validate the decoded size against the plan — a
        numpy/PIL slice would silently shrink (or zero-pad) instead of
        erroring, leaving boxes in the wrong frame."""
        y0, x0, ch, cw = cropplan
        if y0 + ch > h0 or x0 + cw > w0:
            raise ValueError(
                f"{record['file_name']}: decoded size ({h0}, {w0}) is "
                f"smaller than the planned crop {tuple(cropplan)} — fix "
                f"the dataset's height/width fields"
            )

    def _call_raw(self, record: Dict, plan: Dict):
        """Device-preprocess mode: emit RAW pixels in a source bucket plus
        the resize plan; pixels are resized/flipped on the TPU
        (data/xla_preprocess.py)."""
        from .xla_preprocess import scale_boxes

        img, _ = _open_oriented(record["file_name"])
        img = img.convert("RGB")
        w0, h0 = img.size
        arr = np.asarray(img, np.uint8)
        if self.image_format == "BGR":
            arr = arr[:, :, ::-1]

        annos = record.get("annotations", [])
        boxes = np.array([a["bbox"] for a in annos], np.float32).reshape(-1, 4)
        classes = np.array(
            [a["category_id"] for a in annos], np.int64
        ).reshape(-1)

        # INPUT.CROP first (host-side even in device-preprocess mode: a
        # uint8 slice is free next to the decode; the device program only
        # ever sees the cropped extent as the "original" image)
        if plan.get("crop") is not None:
            y0, x0, ch, cw = plan["crop"]
            # With a crop plan, bucket/(bh,bw) derive from the crop extent,
            # so the bucket guard below can't see a stale height/width
            # record — validate the decoded size against the plan directly
            self._check_crop_fits(record, plan["crop"], h0, w0)
            arr = arr[y0 : y0 + ch, x0 : x0 + cw]
            h0, w0 = ch, cw
            if len(boxes):
                boxes = crop_boxes(boxes, y0, x0, ch, cw)

        short = plan["short"]
        nh, nw = resize_shortest_edge_size(h0, w0, short, self.max_size)
        flip = plan["flip"]

        if len(boxes):
            boxes = scale_boxes(boxes, (h0, w0), (nh, nw), flip)
            keep = (boxes[:, 2] > boxes[:, 0]) & (boxes[:, 3] > boxes[:, 1])
            boxes, classes = boxes[keep], classes[keep]

        rbh, rbw = pick_bucket(h0, w0, self.raw_buckets or self.buckets)
        raw = np.zeros((rbh, rbw, 3), np.uint8)
        raw[:h0, :w0] = arr
        tbh, tbw = pick_bucket(nh, nw, self.buckets)
        if plan["bucket"] != (rbh, rbw, tbh, tbw):
            raise ValueError(
                f"{record['file_name']}: decoded size ({h0}, {w0}) maps to "
                f"bucket {(rbh, rbw, tbh, tbw)} but the record metadata "
                f"planned {plan['bucket']} — fix the dataset's height/width"
            )

        g = self.max_gt
        gt_boxes = np.zeros((g, 4), np.float32)
        gt_classes = np.zeros((g,), np.int32)
        gt_valid = np.zeros((g,), bool)
        n = min(len(boxes), g)
        gt_boxes[:n] = boxes[:n]
        gt_classes[:n] = classes[:n]
        gt_valid[:n] = True

        return {
            "image": raw,
            "hw": np.array([nh, nw], np.int32),
            "orig_hw": np.array([h0, w0], np.int32),
            "bucket": (rbh, rbw, tbh, tbw),
            "target_hw": (tbh, tbw),
            "short": np.float32(short),
            "max_size": self.max_size,
            "flip": flip,
            "gt_boxes": gt_boxes,
            "gt_classes": gt_classes,
            "gt_valid": gt_valid,
            "image_id": record.get("image_id"),
            "file_name": record.get("file_name"),
            "flipped": flip,
        }

    def _call_host(self, record: Dict, plan: Dict):
        img, oriented = _open_oriented(record["file_name"])
        w0, h0 = img.size

        # effective resize source = the crop extent when INPUT.CROP is on
        cropplan = plan.get("crop")
        if cropplan is not None:
            # bucket below derives from the crop extent, not the decoded
            # size — a stale height/width record would otherwise yield a
            # PIL zero-padded crop with boxes in the wrong frame
            self._check_crop_fits(record, cropplan, h0, w0)
        eh, ew = (cropplan[2], cropplan[3]) if cropplan else (h0, w0)

        short = plan["short"]
        h, w = resize_shortest_edge_size(eh, ew, short, self.max_size)
        flipped = plan["flip"]
        bh, bw = pick_bucket(h, w, self.buckets)
        if plan["bucket"] != (bh, bw):
            # batches are grouped by the metadata-derived bucket; a stale
            # <size> / EXIF-rotated file would otherwise crash np.stack
            # deep in the loader (detectron2 check_image_size analog)
            raise ValueError(
                f"{record['file_name']}: decoded size ({h0}, {w0}) maps to "
                f"bucket {(bh, bw)} but the record metadata planned "
                f"{plan['bucket']} — fix the dataset's height/width fields"
            )

        padded = None
        # EXIF-rotated files can't use the raw libjpeg path (it decodes
        # stored pixels; the reference's read_image applies orientation
        # first, d2 detection_utils._apply_exif_orientation). The native
        # decode+resize fusion has no crop stage — INPUT.CROP routes
        # through the PIL path (crop is off in every reference config;
        # correctness over the fused fast path here).
        if self.native_io and not oriented and cropplan is None:
            from . import native_io

            res = native_io.load_image(
                record["file_name"], short, self.max_size, (bh, bw),
                flip=flipped, bgr=self.image_format == "BGR",
            )
            if res is not None:
                canvas, new_hw, _ = res
                padded = np.clip(canvas + 0.5, 0, 255).astype(np.uint8)
                h, w = int(new_hw[0]), int(new_hw[1])

        if padded is None:  # PIL fallback (non-JPEG, native off, crop on)
            img = img.convert("RGB")
            if cropplan is not None:
                y0, x0, ch, cw = cropplan
                img = img.crop((x0, y0, x0 + cw, y0 + ch))
            if (h, w) != (eh, ew):
                img = img.resize((w, h), Image.BILINEAR)
            arr = np.asarray(img, np.uint8)
            if self.image_format == "BGR":
                arr = arr[:, :, ::-1]
            if flipped:
                arr = arr[:, ::-1, :]
            padded = np.zeros((bh, bw, 3), np.uint8)
            padded[:h, :w] = arr

        sx, sy = w / ew, h / eh
        annos = record.get("annotations", [])
        boxes = np.array(
            [a["bbox"] for a in annos], np.float32
        ).reshape(-1, 4)
        classes = np.array(
            [a["category_id"] for a in annos], np.int64
        ).reshape(-1)
        if cropplan is not None and len(boxes):
            y0, x0, ch, cw = cropplan
            boxes = crop_boxes(boxes, y0, x0, ch, cw)
        boxes = boxes * np.array([sx, sy, sx, sy], np.float32)

        if flipped and len(boxes):
            x1 = w - boxes[:, 2]
            x2 = w - boxes[:, 0]
            boxes = np.stack([x1, boxes[:, 1], x2, boxes[:, 3]], axis=1)

        # clip + drop degenerate (detection_utils.filter_empty_instances)
        boxes[:, 0::2] = boxes[:, 0::2].clip(0, w)
        boxes[:, 1::2] = boxes[:, 1::2].clip(0, h)
        keep = (boxes[:, 2] > boxes[:, 0]) & (boxes[:, 3] > boxes[:, 1])
        boxes, classes = boxes[keep], classes[keep]

        g = self.max_gt
        gt_boxes = np.zeros((g, 4), np.float32)
        gt_classes = np.zeros((g,), np.int32)
        gt_valid = np.zeros((g,), bool)
        n = min(len(boxes), g)
        gt_boxes[:n] = boxes[:n]
        gt_classes[:n] = classes[:n]
        gt_valid[:n] = True

        if self.host_s2d and padded.shape[0] % 2 == 0 and padded.shape[1] % 2 == 0:
            from ..models.backbone import space_to_depth

            padded = space_to_depth(padded)

        return {
            "image": padded,
            "hw": np.array([h, w], np.int32),
            "orig_hw": np.array([h0, w0], np.int32),
            "bucket": (bh, bw),
            "gt_boxes": gt_boxes,
            "gt_classes": gt_classes,
            "gt_valid": gt_valid,
            "image_id": record.get("image_id"),
            "file_name": record.get("file_name"),
            "flipped": flipped,
        }
