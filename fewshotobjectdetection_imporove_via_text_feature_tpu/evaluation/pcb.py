"""Prototypical Calibration Block (PCB).

Parity with defrcn/evaluation/calibration_layer.py:17-151:
  * a separate ImageNet ResNet-101 (torchvision weights) extracts 1000-d
    activation vectors via ROIAlign(1x1, 1/32) + fc over ORIGINAL-size
    images;
  * class prototypes = mean activation over the k-shot support set's GT
    boxes (built once, from cfg.DATASETS.TRAIN[0]);
  * at test time, detections with PCB_LOWER < score <= PCB_UPPER get
    score <- alpha * score + (1 - alpha) * cos(feature, prototype[class]);
  * classes in the base split are excluded on *_test_all datasets
    (clsid_filter, :126-139).

TPU notes: feature extraction jits per image-size bucket; the support pass
runs once at construction (the reference does the same full extra pass,
SURVEY.md §3.5 hot-loop #6).
"""

from __future__ import annotations

import logging
from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from ..data import get_detection_dataset_dicts
from ..ops.roi_align import roi_align_auto
from .archs import TorchvisionResNet, tv_translate

logger = logging.getLogger(__name__)

# torchvision ImageNet stats (RGB)
_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_STD = np.array([0.229, 0.224, 0.225], np.float32)


def _bucket(h, w):
    up = lambda v: int(np.ceil(v / 64.0) * 64)
    return up(h), up(w)


class PrototypicalCalibrationBlock:
    def __init__(self, cfg):
        self.cfg = cfg
        self.alpha = cfg.TEST.PCB_ALPHA
        self.upper = cfg.TEST.PCB_UPPER
        self.lower = cfg.TEST.PCB_LOWER

        # ref calibration_layer.py:34-37: 'resnet' or NotImplementedError
        if cfg.TEST.PCB_MODELTYPE != "resnet":
            raise NotImplementedError(
                f"TEST.PCB_MODELTYPE {cfg.TEST.PCB_MODELTYPE!r}: only "
                "'resnet' exists (the reference raises the same way)"
            )
        self.model = TorchvisionResNet(depth=101)
        self.params = self._load_params(cfg.TEST.PCB_MODELPATH)
        self._extract = {}
        self._io_pool = None  # lazy image-decode thread pool

        self.prototypes = self.build_prototypes()
        self.exclude_cls = self.clsid_filter()
        # Fallback test-set image_id -> file path for callers that don't
        # supply paths (calibrate_image). The batched path passes each
        # batch's file_names through (loader meta), because ids can collide
        # across cfg.DATASETS.TEST entries (e.g. VOC 2007/2012 share ids);
        # colliding ids are poisoned so a fallback lookup fails loudly
        # instead of silently reading the wrong dataset's pixels.
        self._files: Dict = {}
        self._ambiguous = set()
        for name in cfg.DATASETS.TEST:
            for r in get_detection_dataset_dicts([name], filter_empty=False):
                old = self._files.setdefault(r["image_id"], r["file_name"])
                if old != r["file_name"]:
                    self._ambiguous.add(r["image_id"])

    # ------------------------------------------------------------------
    def _load_params(self, path):
        dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
        variables = jax.jit(self.model.init)(jax.random.PRNGKey(0), dummy)
        params = variables["params"]
        if path:
            # A missing file must fail fast, like the reference's bare
            # torch.load (calibration_layer.py:38-39) — silently rescoring
            # with random prototypes corrupts every reported AP.
            import torch

            from ..checkpoint.torch_import import apply_weight_dict

            state = torch.load(path, map_location="cpu", weights_only=False)
            if "model" in state:
                state = state["model"]
            named = {
                k: v.numpy() for k, v in state.items()
                if hasattr(v, "numpy")
            }
            params, matched, skipped = apply_weight_dict(
                params, named, tv_translate
            )
            logger.info(
                "PCB: loaded %d tensors from %s (%d unmatched)",
                matched, path, len(skipped),
            )
        else:
            logger.warning(
                "TEST.PCB_MODELPATH is empty: PCB will rescore with a "
                "RANDOM ResNet (only meaningful in tests; point it at the "
                "torchvision R-101 ImageNet weights for real evaluation)"
            )
        return params

    def _extract_fn(self, shape):
        """Batched extractor keyed by (bh, bw, G, max_n): images arrive
        uint8 (4x cheaper transfer; normalization runs on device) and the
        whole group goes through the PCB ResNet as ONE batch — the
        reference runs a batch-1 forward per image
        (calibration_layer.py:96-103), which leaves the MXU ~idle."""
        if shape not in self._extract:

            def fn(params, images, boxes, hw):
                x = images.astype(jnp.float32) / 255.0
                x = (x - _MEAN) / _STD
                # Zero the pad region AFTER normalization: uint8 zero-pad
                # would otherwise become "normalized black" (~-2.1/-2.0/-1.8
                # per channel), drifting border features from the reference's
                # unpadded single-image forward (calibration_layer.py:96-103),
                # whose conv padding is zero in normalized space.
                bh, bw = images.shape[1:3]
                row_ok = jnp.arange(bh)[None, :, None] < hw[:, 0][:, None, None]
                col_ok = jnp.arange(bw)[None, None, :] < hw[:, 1][:, None, None]
                x = x * (row_ok & col_ok)[..., None]
                _, feat = self.model.apply({"params": params}, x)

                def pool(f, bx):
                    # sampling_ratio=0 (adaptive): the reference pooler is
                    # ROIAlignV2 1x1 @1/32 with sampling_ratio=(0)
                    # (calibration_layer.py:27) — for a 1x1 output that is
                    # a dense ~whole-ROI average, not a 2x2 point sample
                    return roi_align_auto(
                        f.astype(jnp.float32), bx, 1, 1.0 / 32.0, 0
                    )[:, 0, 0, :]

                pooled = jax.vmap(pool)(feat, boxes)  # (G, N, 2048)
                # fc applied to the ROI-pooled res5 features
                # (ref calibration_layer.py:100-103)
                w = params["fc"]["kernel"]
                b = params["fc"]["bias"]
                return pooled @ w + b

            self._extract[shape] = jax.jit(fn)
        return self._extract[shape]

    @staticmethod
    def _load_padded(file_name):
        # cv2.imread (the reference's loader, calibration_layer.py:108)
        # applies EXIF orientation; match it
        from ..data.mapper import _open_oriented

        img, _ = _open_oriented(file_name)
        img = np.asarray(img.convert("RGB"), np.uint8)
        h, w = img.shape[:2]
        bh, bw = _bucket(h, w)
        padded = np.zeros((bh, bw, 3), np.uint8)
        padded[:h, :w] = img
        return padded, (h, w)

    def _roi_features_batch(self, files, boxes_list):
        """files: [str]*K; boxes_list: [(n_i, 4) ORIGINAL coords]*K.
        Returns [(n_i, 1000)]*K. Images group by padded bucket; each group
        pads to a power-of-2 batch and a shared ROI slot count so the jit
        cache stays small."""
        if self._io_pool is None:
            from concurrent.futures import ThreadPoolExecutor

            self._io_pool = ThreadPoolExecutor(8)
        loaded = list(self._io_pool.map(self._load_padded, files))
        padded = [p for p, _ in loaded]
        valid_hw = [hw for _, hw in loaded]

        out = [None] * len(files)
        groups: Dict = {}
        for i, p in enumerate(padded):
            groups.setdefault(p.shape[:2], []).append(i)
        for (bh, bw), idxs in groups.items():
            g2 = 1 << (len(idxs) - 1).bit_length()  # next power of 2
            max_n = max(len(boxes_list[i]) for i in idxs)
            max_n = int(np.ceil(max(max_n, 1) / 16.0) * 16)
            imgs = np.zeros((g2, bh, bw, 3), np.uint8)
            pboxes = np.zeros((g2, max_n, 4), np.float32)
            hws = np.zeros((g2, 2), np.int32)
            for j, i in enumerate(idxs):
                imgs[j] = padded[i]
                pboxes[j, : len(boxes_list[i])] = boxes_list[i]
                hws[j] = valid_hw[i]
            fn = self._extract_fn((bh, bw, g2, max_n))
            feats = np.asarray(
                fn(
                    self.params,
                    jnp.asarray(imgs),
                    jnp.asarray(pboxes),
                    jnp.asarray(hws),
                )
            )
            for j, i in enumerate(idxs):
                out[i] = feats[j, : len(boxes_list[i])]
        return out

    def _roi_features(self, file_name, boxes: np.ndarray):
        """boxes in ORIGINAL image coords; returns (N, 1000) activations."""
        return self._roi_features_batch([file_name], [boxes])[0]

    # ------------------------------------------------------------------
    def build_prototypes(self):
        name = self.cfg.DATASETS.TRAIN[0]
        dicts = get_detection_dataset_dicts([name], filter_empty=True)
        files, boxes_list, labels = [], [], []
        for rec in dicts:
            annos = rec["annotations"]
            boxes = np.array([a["bbox"] for a in annos], np.float32).reshape(-1, 4)
            if not len(boxes):
                continue
            files.append(rec["file_name"])
            boxes_list.append(boxes)
            labels.extend(int(a["category_id"]) for a in annos)
        feats = []
        for start in range(0, len(files), 16):
            feats.extend(
                self._roi_features_batch(
                    files[start : start + 16], boxes_list[start : start + 16]
                )
            )
        feats = np.concatenate(feats, axis=0)
        labels = np.asarray(labels)
        protos = {}
        for c in np.unique(labels):
            protos[int(c)] = feats[labels == c].mean(axis=0)
        logger.info("PCB: built %d class prototypes from %s", len(protos), name)
        return protos

    def clsid_filter(self):
        dsname = self.cfg.DATASETS.TEST[0]
        if "test_all" in dsname:
            if "coco" in dsname:
                return [7, 9, 10, 11, 12, 13, 20, 21, 22, 23, 24, 25, 26, 27,
                        28, 29, 30, 31, 32, 33, 34, 35, 36, 37, 38, 40, 41,
                        42, 43, 44, 45, 46, 47, 48, 49, 50, 51, 52, 53, 54,
                        55, 59, 61, 63, 64, 65, 66, 67, 68, 69, 70, 71, 72,
                        73, 74, 75, 76, 77, 78, 79]
            if "voc" in dsname:
                return list(range(0, 15))
            raise NotImplementedError(dsname)
        return []

    # ------------------------------------------------------------------
    def _apply_cos(self, feats, idx, classes, scores):
        for j, i in enumerate(idx):
            c = int(classes[i])
            if c in self.exclude_cls or c not in self.prototypes:
                continue
            p = self.prototypes[c]
            f = feats[j]
            cos = float(
                np.dot(f, p)
                / max(np.linalg.norm(f) * np.linalg.norm(p), 1e-12)
            )
            scores[i] = scores[i] * self.alpha + cos * (1 - self.alpha)
        return scores

    def calibrate_image(self, image_id, boxes, scores, classes, valid):
        """Adjust one image's detection scores in place (numpy) —
        single-image wrapper around execute_calibration."""
        det = self.execute_calibration(
            [image_id],
            {
                "boxes": boxes[None],
                "scores": scores[None],
                "classes": classes[None],
                "valid": valid[None],
            },
        )
        return det["scores"][0]

    def _resolve_file(self, image_id):
        if image_id in getattr(self, "_ambiguous", ()):
            raise ValueError(
                f"image_id {image_id!r} exists in multiple DATASETS.TEST "
                "entries with different files; pass file_names to "
                "execute_calibration (the evaluator's batch meta carries "
                "them)"
            )
        return self._files.get(image_id)

    def execute_calibration(self, image_ids, det_np, file_names=None):
        """det_np: dict with boxes/scores/classes/valid (B, D, ...) numpy in
        ORIGINAL image coordinates. Returns the dict with adjusted scores.

        file_names (optional, parallel to image_ids): original image paths
        from the batch — the collision-proof source, like the reference
        reading inputs[]['file_name'] (calibration_layer.py:108). Without
        it, ids resolve through the DATASETS.TEST map.

        All of the batch's images go through the PCB net together
        (_roi_features_batch) — one batched forward instead of B batch-1
        forwards."""
        files, boxes_list, work = [], [], []
        for i, image_id in enumerate(image_ids):
            file_name = (
                file_names[i] if file_names is not None and file_names[i]
                else self._resolve_file(image_id)
            )
            if file_name is None:
                continue
            scores = det_np["scores"][i]
            sel = (
                det_np["valid"][i]
                & (scores > self.lower)
                & (scores <= self.upper)
            )
            idx = np.nonzero(sel)[0]
            if len(idx) == 0:
                continue
            files.append(file_name)
            boxes_list.append(det_np["boxes"][i][idx])
            work.append((i, idx))
        if not files:
            return det_np
        feats_list = self._roi_features_batch(files, boxes_list)
        for feats, (i, idx) in zip(feats_list, work):
            det_np["scores"][i] = self._apply_cos(
                feats, idx, det_np["classes"][i], det_np["scores"][i]
            )
        return det_np
