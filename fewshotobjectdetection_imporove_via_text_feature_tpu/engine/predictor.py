"""Single-image prediction API — DefaultPredictor parity
(ref defrcn/engine/defaults.py:131-192)."""

from __future__ import annotations

from functools import partial

import jax
import numpy as np

from ..checkpoint.torch_import import maybe_load_reference_weights
from ..data.mapper import pick_bucket, resize_shortest_edge_size
from ..models import build_model
from ..structures import GTInstances, ImageBatch


def preprocess_single_image(cfg, original_image: np.ndarray, buckets=None):
    """BGR HxWx3 uint8 -> batch-1 ``ImageBatch`` in the loader's transport
    layout (resize-shortest-edge, bucket pad, host space-to-depth when the
    bucket dims are even). Shared by DefaultPredictor and the exported
    serving artifacts (engine/export.py), so both serve paths preprocess
    identically (ref defaults.py:169-186)."""
    h0, w0 = original_image.shape[:2]
    h, w = resize_shortest_edge_size(
        h0, w0, cfg.INPUT.MIN_SIZE_TEST, cfg.INPUT.MAX_SIZE_TEST
    )
    from PIL import Image

    # input arrives BGR (cv2 convention, ref defaults.py:174); resize in
    # RGB for PIL, then hand the model cfg.INPUT.FORMAT — the reference
    # flips to RGB when the model was trained that way (defaults.py:184)
    img = Image.fromarray(original_image[:, :, ::-1].astype(np.uint8))
    img = img.resize((w, h), Image.BILINEAR)
    arr = np.asarray(img, np.uint8)
    if cfg.INPUT.FORMAT == "BGR":
        arr = arr[:, :, ::-1]
    bh, bw = pick_bucket(h, w, buckets or cfg.TPU.IMAGE_BUCKETS)
    padded = np.zeros((bh, bw, 3), np.uint8)
    padded[:h, :w] = arr
    if bh % 2 == 0 and bw % 2 == 0:
        # ship the stem's space-to-depth layout like the data loader
        # (uint8 + pre-shuffled: no on-device relayout)
        from ..models.backbone import space_to_depth

        padded = space_to_depth(padded)

    return ImageBatch(
        image=padded[None],
        hw=np.asarray([[h, w]], np.int32),
        orig_hw=np.asarray([[h0, w0]], np.int32),
    )


class DefaultPredictor:
    """cfg -> model + weights; __call__(image BGR HxWx3 uint8) -> dict of
    numpy detections in original-image coordinates."""

    def __init__(self, cfg, params=None):
        self.cfg = cfg
        self.model = build_model(cfg)
        # Spatial partitioning (cfg.TPU.SPATIAL_PARTITION = S > 1): run
        # ONE image's backbone split over S chips along the H axis —
        # batch-1 latency scaling the reference cannot express (its DDP
        # only scales throughput). The model constrains shardings at the
        # backbone boundary (meta_arch.compute_features); detections are
        # identical to the unsharded path (tests/test_spatial_partition).
        import contextlib

        self._mesh = contextlib.nullcontext()
        sp = cfg.TPU.SPATIAL_PARTITION
        if sp > 1:
            from ..parallel import get_mesh

            if jax.process_count() > 1:
                raise ValueError(
                    "TPU.SPATIAL_PARTITION is single-process only "
                    "(detections are fetched to this host)"
                )
            # local=True: detections are fetched to the host, so every
            # mesh device must be addressable (see parallel.mesh.get_mesh)
            ndev = len(jax.local_devices())
            if ndev < sp:
                raise ValueError(
                    f"TPU.SPATIAL_PARTITION {sp} needs {sp} devices, "
                    f"have {ndev}"
                )
            self.model = self.model.clone(spatial_axis="spatial")
            self._mesh = get_mesh(sp, axis_name="spatial", local=True)
        if params is None:
            import jax.numpy as jnp

            h, w = cfg.TPU.IMAGE_BUCKETS[0]
            dummy = ImageBatch(
                image=jnp.zeros((1, h, w, 3), jnp.float32),
                hw=jnp.asarray([[h, w]], jnp.int32),
                orig_hw=jnp.asarray([[h, w]], jnp.int32),
            )
            with self._mesh:
                variables = jax.jit(partial(self.model.init, train=False))(
                    {"params": jax.random.PRNGKey(0)}, dummy
                )
            params = variables["params"]
            if cfg.MODEL.WEIGHTS:
                params = maybe_load_reference_weights(
                    cfg.MODEL.WEIGHTS, params
                )
        self.params = params
        self._apply = jax.jit(partial(self.model.apply, train=False))

    def __call__(self, original_image: np.ndarray):
        batch = preprocess_single_image(self.cfg, original_image)
        with self._mesh:
            det = self._apply({"params": self.params}, batch)
        # ONE device_get for all four outputs: sequential per-array
        # fetches each pay a full host<->device round trip (measured
        # ~15-20 ms EACH behind the dev relay — 4 fetches nearly tripled
        # the request latency; any transport pays it 4x, just less)
        boxes, scores, classes, valid = jax.device_get(
            (det.boxes[0], det.scores[0], det.classes[0], det.valid[0])
        )
        return {
            "boxes": boxes[valid],
            "scores": scores[valid],
            "classes": classes[valid],
        }

    # batch sizes a grouped program may run at: bounds the number of
    # compiled specializations (shapes are static under jit) while keeping
    # pad waste <= 2x; batch-8 inference is ~4x cheaper per image than 8
    # batch-1 dispatches on the chip (PARITY.md perf notes), which is the
    # whole point of DetectionServer's dynamic batching
    BATCH_SIZES = (1, 2, 4, 8)

    def predict_batch(self, original_images):
        """Batched __call__: one fused program per padded-bucket group.

        Images sharing a padded bucket shape stack into one device program
        (padded up to the next BATCH_SIZES entry with copies of the last
        row — same convention as the test loader's trailing batch); groups
        run sequentially. Results match per-image __call__ up to near-tied
        NMS ordering (different batch = different compiled program).
        """

        def run(batch):
            with self._mesh:
                det = self._apply({"params": self.params}, batch)
            return jax.device_get(
                (det.boxes, det.scores, det.classes, det.valid)
            )

        return run_grouped(
            [preprocess_single_image(self.cfg, im) for im in original_images],
            lambda shape: self.BATCH_SIZES,
            run,
        )


def run_grouped(pre, sizes_fn, run):
    """Shared batching core for both predictor flavors.

    pre: batch-1 ``ImageBatch`` per request; ``sizes_fn(padded_shape)`` ->
    ascending runnable batch sizes for that bucket; ``run(ImageBatch[m])``
    -> numpy (boxes, scores, classes, valid). Chunks each bucket group to
    the largest size, pads to the smallest size >= n with replicated rows,
    and unpacks per-request detection dicts in input order.
    """
    groups = {}
    for i, b in enumerate(pre):
        groups.setdefault(b.image.shape[1:], []).append(i)
    results = [None] * len(pre)
    for shape, idxs in groups.items():
        sizes = tuple(sizes_fn(shape))
        for start in range(0, len(idxs), sizes[-1]):
            chunk = idxs[start : start + sizes[-1]]
            n = len(chunk)
            m = next(s for s in sizes if s >= n)
            rows = chunk + [chunk[-1]] * (m - n)
            batch = ImageBatch(
                image=np.concatenate([pre[i].image for i in rows]),
                hw=np.concatenate([pre[i].hw for i in rows]),
                orig_hw=np.concatenate([pre[i].orig_hw for i in rows]),
            )
            boxes, scores, classes, valid = run(batch)
            for j, i in enumerate(chunk):
                v = valid[j]
                results[i] = {
                    "boxes": boxes[j][v],
                    "scores": scores[j][v],
                    "classes": classes[j][v],
                }
    return results
