"""Batched fixed-shape data loaders.

Replaces defrcn/dataloader/build.py (torch DataLoader + TrainingSampler /
InferenceSampler + aspect-ratio grouping): a background-threaded pipeline
that yields dense numpy batches grouped by padded bucket shape, ready to be
device_put onto the TPU data mesh axis.
"""

from __future__ import annotations

import itertools
import queue
import threading
from typing import Dict, Iterator, List, Optional

import numpy as np

from ..structures import GTInstances, ImageBatch
from .catalog import DatasetCatalog
from .mapper import DatasetMapper

__all__ = [
    "get_detection_dataset_dicts",
    "build_detection_train_loader",
    "build_detection_test_loader",
    "Prefetcher",
]


def get_detection_dataset_dicts(names, filter_empty=True):
    if isinstance(names, str):
        names = [names]
    dicts = []
    for name in names:
        d = DatasetCatalog.get(name)
        assert len(d), f"Dataset {name} is empty"
        dicts.extend(d)
    if filter_empty:
        dicts = [r for r in dicts if len(r.get("annotations", []))]
    return dicts


def repeat_factors_from_category_frequency(dicts, repeat_thresh: float):
    """Per-image repeat factors for LVIS-style repeat-factor sampling.

    The reference exposes this via DATALOADER.SAMPLER_TRAIN =
    "RepeatFactorTrainingSampler" (defrcn/dataloader/build.py:301-305,
    detectron2's implementation of Gupta et al., "LVIS" 2019 §4):
    f(c) = fraction of images containing category c,
    r(c) = max(1, sqrt(t / f(c))), r(image) = max over its categories.
    """
    n = len(dicts)
    rec_cats = [
        {a["category_id"] for a in rec.get("annotations", [])}
        for rec in dicts
    ]
    freq: Dict[object, int] = {}
    for cats in rec_cats:
        for cid in cats:
            freq[cid] = freq.get(cid, 0) + 1
    cat_rep = {
        cid: max(1.0, np.sqrt(repeat_thresh / (cnt / n)))
        for cid, cnt in freq.items()
    }
    return np.asarray(
        [
            max((cat_rep[cid] for cid in cats), default=1.0)
            for cats in rec_cats
        ],
        np.float64,
    )


def _stack_batch(items: List[Dict]):
    images = ImageBatch(
        image=np.stack([it["image"] for it in items]),
        hw=np.stack([it["hw"] for it in items]),
        orig_hw=np.stack([it["orig_hw"] for it in items]),
    )
    gt = GTInstances(
        boxes=np.stack([it["gt_boxes"] for it in items]),
        classes=np.stack([it["gt_classes"] for it in items]),
        valid=np.stack([it["gt_valid"] for it in items]),
    )
    meta = {
        "image_ids": [it["image_id"] for it in items],
        # PCB reads the ORIGINAL pixels per detection; carrying the path in
        # the batch (like the reference's batched_inputs file_name,
        # calibration_layer.py:108) is immune to image_id collisions across
        # datasets — an id->path map is not (VOC 2007/2012 share ids).
        "file_names": [it.get("file_name") for it in items],
        "valid_count": sum(1 for it in items if not it.get("_pad", False)),
    }
    if "short" in items[0]:  # device-preprocess mode extras
        meta["short"] = np.asarray([it["short"] for it in items], np.float32)
        meta["flip"] = np.asarray([it["flip"] for it in items], bool)
        meta["target_hw"] = items[0]["target_hw"]
        meta["max_size"] = items[0]["max_size"]
    return images, gt, meta


class Prefetcher:
    """Runs an iterator in a daemon thread with a small queue. Also used
    by the train/eval loops to overlap host->device uploads with
    execution."""

    def __init__(self, gen_fn, maxsize=4):
        self._q = queue.Queue(maxsize=maxsize)
        self._t = threading.Thread(
            target=self._run, args=(gen_fn,), daemon=True
        )
        self._t.start()

    def _run(self, gen_fn):
        try:
            for item in gen_fn():
                self._q.put(item)
        except BaseException as e:  # propagate into the consumer
            self._q.put(e)
        self._q.put(StopIteration)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is StopIteration:
            raise StopIteration
        if isinstance(item, BaseException):
            raise item
        return item


def build_detection_train_loader(
    cfg, dataset_names=None, *, seed: int = 0, prefetch: bool = True,
    batch_size: int = 0, rank: int = 0, world_size: int = 1,
) -> Iterator:
    """Infinite shuffled loader; batches grouped by image bucket (the
    TPU-shape analog of the reference's aspect-ratio grouping,
    dataloader/build.py:188-290).

    Multi-host (rank, world_size): every process runs the SAME seeded
    shuffle and the SAME metadata-only bucket grouping (DatasetMapper.plan
    needs no pixels), so all ranks agree on every global batch — bucket
    choice included — and each decodes only its contiguous
    batch_size/world_size slice. This mirrors the reference's single
    TrainingSampler shuffle shared by all ranks + per-rank world split
    (detectron2 TrainingSampler / build_batch_data_loader,
    dataloader/build.py:250-290), and additionally makes the global batch
    sequence independent of world_size.
    """
    names = dataset_names or cfg.DATASETS.TRAIN
    dicts = get_detection_dataset_dicts(
        names, filter_empty=cfg.DATALOADER.FILTER_EMPTY_ANNOTATIONS
    )
    mapper = DatasetMapper(
        is_train=True,
        min_size=cfg.INPUT.MIN_SIZE_TRAIN,
        max_size=cfg.INPUT.MAX_SIZE_TRAIN,
        buckets=cfg.TPU.IMAGE_BUCKETS,
        max_gt=cfg.TPU.MAX_GT,
        image_format=cfg.INPUT.FORMAT,
        random_flip=cfg.INPUT.RANDOM_FLIP == "horizontal",
        device_preprocess=cfg.TPU.DEVICE_PREPROCESS,
        raw_buckets=cfg.TPU.RAW_BUCKETS,
        native_io=cfg.DATALOADER.NATIVE_IO,
        host_s2d=cfg.TPU.HOST_SPACE_TO_DEPTH,
        sampling=cfg.INPUT.MIN_SIZE_TRAIN_SAMPLING,
        # train-only, like the reference's augs.insert(0, T.RandomCrop)
        # under `if cfg.INPUT.CROP.ENABLED and is_train`
        # (dataset_mapper.py:83-87)
        crop=(
            (cfg.INPUT.CROP.TYPE, tuple(cfg.INPUT.CROP.SIZE))
            if cfg.INPUT.CROP.ENABLED
            else None
        ),
    )
    batch_size = batch_size or cfg.SOLVER.IMS_PER_BATCH
    assert batch_size % world_size == 0, (batch_size, world_size)
    local = batch_size // world_size

    num_workers = max(1, int(cfg.DATALOADER.NUM_WORKERS))

    sampler_name = cfg.DATALOADER.SAMPLER_TRAIN
    if sampler_name == "TrainingSampler":
        repeat_factors = None
    elif sampler_name == "RepeatFactorTrainingSampler":
        repeat_factors = repeat_factors_from_category_frequency(
            dicts, cfg.DATALOADER.REPEAT_THRESHOLD
        )
    else:  # same failure mode as the reference (dataloader/build.py:307)
        raise ValueError(f"Unknown training sampler: {sampler_name}")

    def plans():
        """The global stream: (epoch, index, plan) with deterministic
        per-item rngs — identical on every rank."""
        rng = np.random.RandomState(seed)
        for epoch in itertools.count():
            if repeat_factors is None:
                order = rng.permutation(len(dicts))
            else:
                # d2 RepeatFactorTrainingSampler._get_epoch_indices:
                # stochastic rounding of the fractional part per epoch,
                # then a shuffle of the repeated index list. The rng is
                # the shared stream, so every rank draws the same epoch.
                rounds = np.floor(repeat_factors).astype(np.int64) + (
                    rng.random_sample(len(dicts))
                    < (repeat_factors - np.floor(repeat_factors))
                )
                order = rng.permutation(
                    np.repeat(np.arange(len(dicts)), rounds)
                )
            occ: Dict[int, int] = {}
            for i in order:
                # SeedSequence-mixed per-item stream: a plain linear
                # combination (seed*K1 + epoch*K2 + i) collides whenever
                # the epoch stride is smaller than the dataset — item i in
                # epoch e+1 would replay item i+K2's stream from epoch e,
                # correlating augmentation draws across the run. Pure
                # function of (seed, epoch, i): identical on every rank.
                # Repeat-factor duplicates of i within one epoch extend the
                # key with their occurrence index so each repeat draws
                # fresh augmentations (k=0 keeps the TrainingSampler
                # stream unchanged).
                k = occ.get(int(i), 0)
                occ[int(i)] = k + 1
                key = [seed, epoch, int(i)] + ([k] if k else [])
                r = np.random.RandomState(
                    np.random.MT19937(np.random.SeedSequence(key))
                )
                yield epoch, int(i), mapper.plan(dicts[int(i)], r)

    def global_batches():
        groups: Dict[tuple, List] = {}
        for epoch, i, plan in plans():
            key = plan["bucket"]
            groups.setdefault(key, []).append((epoch, i, plan))
            if len(groups[key]) == batch_size:
                yield groups.pop(key)

    def generate():
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        def load(args):
            epoch, i, plan = args
            # rng draws all happened in plan(); decode needs none
            return mapper(dicts[int(i)], None, plan)

        # keep a few batches' decodes in flight so workers stay busy
        # across batch boundaries (a single batch is only `local` items)
        window = 3
        with ThreadPoolExecutor(num_workers) as pool:
            gb = global_batches()
            pending = deque()

            def submit_next():
                batch = next(gb)
                mine = batch[rank * local : (rank + 1) * local]
                pending.append([pool.submit(load, a) for a in mine])

            for _ in range(window):
                submit_next()
            while True:
                futs = pending.popleft()
                items = [f.result() for f in futs]
                submit_next()
                yield _stack_batch(items)

    return Prefetcher(generate) if prefetch else generate()


def build_detection_test_loader(
    cfg, dataset_name: str, batch_size: int = 1, *, prefetch: bool = True,
    shard=None,
) -> Iterator:
    """Sequential loader over the full test set; the trailing partial batch
    is padded with copies flagged via meta['valid_count'].

    ``shard=(pindex, pcount)`` enables multi-host mode: the batch sequence
    is assembled from metadata-only mapping plans (identical on every
    rank), batch k belongs to rank k % pcount, and FOREIGN batches yield a
    ``(None, None, {"skip": True})`` sentinel without ever decoding their
    pixels — the InferenceSampler analog (ref dataloader/build.py:385)
    without the wasted 1-1/pcount of per-rank decode work a full local
    iteration would pay."""
    dicts = get_detection_dataset_dicts([dataset_name], filter_empty=False)
    mapper = DatasetMapper(
        is_train=False,
        min_size=cfg.INPUT.MIN_SIZE_TEST,
        max_size=cfg.INPUT.MAX_SIZE_TEST,
        buckets=cfg.TPU.IMAGE_BUCKETS,
        max_gt=cfg.TPU.MAX_GT,
        image_format=cfg.INPUT.FORMAT,
        random_flip=False,
        device_preprocess=cfg.TPU.DEVICE_PREPROCESS,
        raw_buckets=cfg.TPU.RAW_BUCKETS,
        native_io=cfg.DATALOADER.NATIVE_IO,
        host_s2d=cfg.TPU.HOST_SPACE_TO_DEPTH,
    )

    num_workers = max(1, int(cfg.DATALOADER.NUM_WORKERS))

    def generate():
        from concurrent.futures import ThreadPoolExecutor

        # Metadata-only batch assembly (mapper.plan never touches pixels):
        # every rank computes the identical batch sequence, then decodes
        # only its own batches.
        plans = [
            mapper.plan(r, np.random.RandomState(i))
            for i, r in enumerate(dicts)
        ]
        groups: Dict[tuple, List] = {}
        batches: List[List] = []
        for i, p in enumerate(plans):
            key = p["bucket"]
            groups.setdefault(key, []).append((i, p, False))
            if len(groups[key]) == batch_size:
                batches.append(groups.pop(key))
        for key, items in groups.items():
            while len(items) < batch_size:
                j, p, _ = items[-1]
                items.append((j, p, True))  # pad: copy of the last record
            batches.append(items)

        pindex, pcount = shard if shard else (0, 1)

        def load(arg):
            i, plan, is_pad = arg
            item = mapper(dicts[int(i)], None, plan)
            if is_pad:
                item["_pad"] = True
            return item

        with ThreadPoolExecutor(num_workers) as pool:
            owned = [k for k in range(len(batches)) if k % pcount == pindex]
            submitted: Dict[int, List] = {}
            nxt = 0

            # enough batches in flight to keep every worker busy even at
            # batch_size 1
            window = max(3, -(-2 * num_workers // batch_size))

            def fill():
                nonlocal nxt
                while nxt < len(owned) and len(submitted) < window:
                    k = owned[nxt]
                    submitted[k] = [pool.submit(load, a) for a in batches[k]]
                    nxt += 1

            fill()
            for k in range(len(batches)):
                if k % pcount == pindex:
                    items = [f.result() for f in submitted.pop(k)]
                    fill()
                    yield _stack_batch(items)
                else:
                    yield None, None, {"skip": True, "valid_count": 0}

    return Prefetcher(generate) if prefetch else generate()
