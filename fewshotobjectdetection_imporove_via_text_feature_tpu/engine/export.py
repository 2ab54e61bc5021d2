"""AOT serving export: serialized inference programs (jax.export).

The reference's serving surface is ``DefaultPredictor`` (defrcn/engine/
defaults.py:131-192): a Python object that needs the full framework, the
config, and a checkpoint at process start. A TPU-native deployment wants
the opposite — a self-contained artifact that a serving host can load and
call without building the model (or even having the model code): this
module exports the jitted inference program per image bucket as portable
StableHLO via ``jax.export`` and bundles it with the weights.

Artifact layout (single zip):
    meta.json            input contract (buckets, format, resize params)
    params.pkl           pickled numpy param tree (shared by all programs)
    programs/{H}x{W}.shlo  serialized Exported per padded bucket shape

``ServingPredictor`` mirrors ``DefaultPredictor.__call__`` exactly (shared
``preprocess_single_image``) but runs the deserialized programs, so the two
serve paths are interchangeable.

Portability: a multi-platform export (``platforms=("tpu", "cpu")``) must
not bake backend-specific custom calls, so the XLA-lax NMS path is forced
during tracing (the Pallas kernel is a Mosaic custom call, TPU-only); a
single-platform TPU export keeps whatever the backend default is.
"""

from __future__ import annotations

import io
import json
import os
import pickle
import zipfile
from contextlib import contextmanager
from typing import Optional, Sequence, Tuple

import jax
import numpy as np

from ..structures import ImageBatch

_PROGRAM_DIR = "programs"


@contextmanager
def _forced_nms(choice: Optional[str]):
    if choice is None:
        yield
        return
    prev = os.environ.get("FSODTF_NMS")
    os.environ["FSODTF_NMS"] = choice
    try:
        yield
    finally:
        if prev is None:
            os.environ.pop("FSODTF_NMS", None)
        else:
            os.environ["FSODTF_NMS"] = prev


def _bucket_shapes(buckets) -> Sequence[Tuple[int, int]]:
    """Distinct padded shapes a predictor can emit: every configured bucket
    in both orientations (data/mapper.py pick_bucket considers (a, b) and
    (b, a))."""
    shapes = []
    for bh, bw in buckets:
        for shape in ((int(bh), int(bw)), (int(bw), int(bh))):
            if shape not in shapes:
                shapes.append(shape)
    return shapes


def export_inference(
    cfg,
    params,
    batch=1,
    buckets: Optional[Sequence[Tuple[int, int]]] = None,
    platforms: Optional[Sequence[str]] = None,
):
    """Export the fixed-shape inference program for every bucket shape.

    ``batch`` is an int or a sequence of ints: one program per
    (batch size, bucket shape) pair — multi-batch artifacts let
    ``ServingPredictor.predict_batch`` (and the HTTP server's dynamic
    batching) run coalesced requests without a live model.

    Returns (meta dict, {(b, bh, bw): serialized bytes}). ``params`` are
    an ARGUMENT of the exported call (not baked constants) so the weights
    are stored once, shared across the per-bucket programs.
    """
    from jax import export as jax_export

    from ..models import build_model

    if cfg.TPU.SPATIAL_PARTITION > 1:
        # exported programs are single-device StableHLO; accepting the
        # knob would silently serve unpartitioned (fail-loudly
        # convention). Spatial partitioning serves through
        # DefaultPredictor, which holds the live mesh.
        raise ValueError(
            "TPU.SPATIAL_PARTITION is not exportable (jax.export emits "
            "single-device programs); serve spatially-partitioned via "
            "DefaultPredictor"
        )
    model = build_model(cfg)
    shapes = _bucket_shapes(buckets or cfg.TPU.IMAGE_BUCKETS)
    platforms = tuple(platforms) if platforms else None
    # The Pallas NMS kernel is a Mosaic custom call — TPU-only. Any export
    # that targets a non-TPU platform (multi-platform, or e.g.
    # --platforms cpu issued from the TPU box) must trace the portable
    # XLA-lax NMS instead; a pure-TPU export keeps the backend default.
    nms = None
    if platforms and any(p.lower() != "tpu" for p in platforms):
        nms = "xla"

    # plain-array calling convention (params dict, image, hw, orig_hw):
    # no custom pytree types inside the serialized programs, so a consumer
    # can deserialize without this package's struct registrations
    def apply_fn(params_tree, image, hw, orig_hw):
        images = ImageBatch(image=image, hw=hw, orig_hw=orig_hw)
        det = model.apply({"params": params_tree}, images, train=False)
        return det.boxes, det.scores, det.classes, det.valid

    from ..models.backbone import space_to_depth

    batches = sorted(
        {int(b) for b in (batch if isinstance(batch, (list, tuple)) else [batch])}
    )
    programs = {}
    with _forced_nms(nms):
        for b in batches:
            for bh, bw in shapes:
                img = np.zeros((b, bh, bw, 3), np.uint8)
                if bh % 2 == 0 and bw % 2 == 0:
                    # the loader/predictor transport layout (host s2d)
                    img = np.stack([space_to_depth(im) for im in img])
                hw = np.full((b, 2), (bh, bw), np.int32)
                exp = jax_export.export(
                    jax.jit(apply_fn),
                    **({"platforms": platforms} if platforms else {}),
                )(params, img, hw, hw)
                programs[(b, bh, bw)] = exp.serialize()

    meta = {
        "batch": batches[0],  # pre-multi-batch readers
        "batches": batches,
        "buckets": [list(s) for s in shapes],
        "input_format": cfg.INPUT.FORMAT,
        "min_size_test": int(
            cfg.INPUT.MIN_SIZE_TEST[0]
            if isinstance(cfg.INPUT.MIN_SIZE_TEST, (list, tuple))
            else cfg.INPUT.MIN_SIZE_TEST
        ),
        "max_size_test": int(cfg.INPUT.MAX_SIZE_TEST),
        "num_classes": int(cfg.MODEL.ROI_HEADS.NUM_CLASSES),
        "platforms": list(platforms) if platforms else [jax.default_backend()],
        "jax_version": jax.__version__,
    }
    try:  # label map for serving responses, when the config resolves one
        from ..utils.class_name import get_class_name

        meta["class_names"] = list(get_class_name(cfg))
    except Exception:
        pass
    return meta, programs


def save_serving_artifact(path: str, meta: dict, programs: dict, params):
    params_np = jax.tree_util.tree_map(np.asarray, params)
    with zipfile.ZipFile(path, "w", zipfile.ZIP_STORED) as z:
        z.writestr("meta.json", json.dumps(meta, indent=1))
        buf = io.BytesIO()
        pickle.dump(params_np, buf)
        z.writestr("params.pkl", buf.getvalue())
        for key, ser in programs.items():
            b, bh, bw = key if len(key) == 3 else (meta["batch"], *key)
            z.writestr(f"{_PROGRAM_DIR}/b{b}_{bh}x{bw}.shlo", ser)


def load_serving_artifact(path: str):
    """-> (meta, params, {(b, bh, bw): jax.export.Exported}).

    Reads both program-name forms: ``b{N}_{H}x{W}.shlo`` (multi-batch) and
    the pre-multi-batch ``{H}x{W}.shlo`` (batch from meta["batch"])."""
    from jax import export as jax_export

    with zipfile.ZipFile(path) as z:
        meta = json.loads(z.read("meta.json"))
        params = pickle.loads(z.read("params.pkl"))
        programs = {}
        for name in z.namelist():
            if name.startswith(_PROGRAM_DIR + "/") and name.endswith(".shlo"):
                stem = name[len(_PROGRAM_DIR) + 1 : -5]
                if stem.startswith("b") and "_" in stem:
                    bpart, stem = stem.split("_", 1)
                    b = int(bpart[1:])
                else:
                    b = int(meta["batch"])
                bh, bw = stem.split("x")
                programs[(b, int(bh), int(bw))] = jax_export.deserialize(
                    z.read(name)
                )
    if "batches" not in meta:
        meta["batches"] = sorted({k[0] for k in programs}) or [meta["batch"]]
    return meta, params, programs


class ServingPredictor:
    """DefaultPredictor-compatible single-image API over a serving artifact
    — no model build, no config file, no checkpoint load."""

    def __init__(self, artifact_path: str):
        self.meta, self._params, self._programs = load_serving_artifact(
            artifact_path
        )
        if 1 not in self.meta["batches"]:
            raise ValueError(
                f"single-image ServingPredictor needs a batch-1 artifact; "
                f"this one was exported at batch {self.meta['batch']}"
            )

        # minimal cfg view for the shared preprocessing helper
        class _Input:
            MIN_SIZE_TEST = self.meta["min_size_test"]
            MAX_SIZE_TEST = self.meta["max_size_test"]
            FORMAT = self.meta["input_format"]

        class _TPU:
            IMAGE_BUCKETS = [tuple(b) for b in self.meta["buckets"]]

        class _Cfg:
            INPUT = _Input
            TPU = _TPU

        self._cfg = _Cfg

    def _program_for(self, image_shape, batch: int):
        """Padded-image shape + batch size -> Exported, or a contract
        error naming what's missing."""
        h, w = image_shape[:2]
        if len(image_shape) == 3 and image_shape[-1] == 12:  # host s2d
            h, w = 2 * h, 2 * w
        key = (batch, h, w)
        if key not in self._programs:
            # pick_bucket's round-up-to-64 fallback produced a shape the
            # artifact was not exported for (image larger than every bucket)
            raise ValueError(
                f"no exported program for padded bucket {(h, w)} at batch "
                f"{batch}; the artifact contains {sorted(self._programs)} — "
                "re-export with covering TPU.IMAGE_BUCKETS / --batches"
            )
        return self._programs[key]

    def _run(self, exp, batch):
        boxes, scores, classes, valid = exp.call(
            self._params, batch.image, batch.hw, batch.orig_hw
        )
        # one round trip for all four outputs (see DefaultPredictor:
        # per-array fetches pay a full host<->device RTT each)
        return jax.device_get((boxes, scores, classes, valid))

    def __call__(self, original_image: np.ndarray):
        from .predictor import preprocess_single_image

        batch = preprocess_single_image(self._cfg, original_image)
        exp = self._program_for(batch.image.shape[1:], 1)
        boxes, scores, classes, valid = self._run(exp, batch)
        return {
            "boxes": boxes[0][valid[0]],
            "scores": scores[0][valid[0]],
            "classes": classes[0][valid[0]],
        }

    def predict_batch(self, original_images):
        """Batched serving from a multi-batch artifact (exported with
        --batches, e.g. 1,8): requests group by padded bucket and run at
        the smallest exported batch size that fits (replicated-row
        padding), enabling the HTTP server's dynamic batching without a
        live model. Artifacts holding only batch-1 programs still work —
        every request just runs alone."""
        from .predictor import preprocess_single_image, run_grouped

        pre = [
            preprocess_single_image(self._cfg, im) for im in original_images
        ]

        def sizes_fn(shape):
            h, w = shape[:2]
            if len(shape) == 3 and shape[-1] == 12:
                h, w = 2 * h, 2 * w
            sizes = sorted(
                b for (b, bh, bw) in self._programs if (bh, bw) == (h, w)
            )
            return sizes or (1,)  # _program_for raises the contract error

        return run_grouped(
            pre,
            sizes_fn,
            lambda batch: self._run(
                self._program_for(
                    batch.image.shape[1:], batch.image.shape[0]
                ),
                batch,
            ),
        )
