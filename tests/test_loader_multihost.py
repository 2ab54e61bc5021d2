"""Multi-host train-loader semantics (reference parity: one shared
TrainingSampler shuffle split across ranks, dataloader/build.py:250-290).

Every rank simulates the same global stream + bucket grouping from metadata
(DatasetMapper.plan) and decodes only its slice, so:
  * rank slices are disjoint and concatenate to the world-size-1 batch;
  * bucket choices agree across ranks even with multiple buckets;
  * the global batch sequence is independent of world_size.
"""

import numpy as np

from fewshotobjectdetection_imporove_via_text_feature_tpu.config import get_cfg
from fewshotobjectdetection_imporove_via_text_feature_tpu.data.catalog import (
    DatasetCatalog,
)
from fewshotobjectdetection_imporove_via_text_feature_tpu.data.loader import (
    build_detection_train_loader,
)
from fewshotobjectdetection_imporove_via_text_feature_tpu.data.meta_voc import (
    load_filtered_voc_instances,
)
from fewshotobjectdetection_imporove_via_text_feature_tpu.data.builtin_meta import (
    PASCAL_VOC_ALL_CATEGORIES,
)

from test_data_layer import make_voc


def _cfg(name):
    cfg = get_cfg()
    cfg.DATASETS.TRAIN = (name,)
    cfg.SOLVER.IMS_PER_BATCH = 4
    cfg.INPUT.MIN_SIZE_TRAIN = (192, 256)  # multi-scale -> multi-bucket
    cfg.INPUT.MAX_SIZE_TRAIN = 512
    cfg.TPU.IMAGE_BUCKETS = ((192, 320), (256, 448))
    cfg.TPU.MAX_GT = 10
    cfg.DATALOADER.NUM_WORKERS = 2
    cfg.DATALOADER.NATIVE_IO = False
    return cfg


def _register(tmp_path, name="loader_mh_voc"):
    d, _ = make_voc(str(tmp_path), n=10)
    classes = PASCAL_VOC_ALL_CATEGORIES[1]
    if name in DatasetCatalog:
        DatasetCatalog._registry.pop(name)
    DatasetCatalog.register(
        name,
        lambda: load_filtered_voc_instances(
            name, d, "trainval", classes, root=str(tmp_path)
        ),
    )
    return name


def _take(loader, n):
    out = []
    it = iter(loader)
    for _ in range(n):
        out.append(next(it))
    return out


def test_rank_slices_assemble_to_global_batches(tmp_path):
    name = _register(tmp_path)
    cfg = _cfg(name)

    world = _take(
        build_detection_train_loader(cfg, seed=7, prefetch=False), 6
    )
    ranks = [
        _take(
            build_detection_train_loader(
                cfg, seed=7, prefetch=False, rank=r, world_size=2
            ),
            6,
        )
        for r in (0, 1)
    ]

    for step, (images, gt, meta) in enumerate(world):
        parts = [ranks[r][step] for r in (0, 1)]
        # identical bucket shape on both ranks and vs the global batch
        assert parts[0][0].image.shape == parts[1][0].image.shape
        glob_img = np.concatenate([p[0].image for p in parts])
        np.testing.assert_array_equal(glob_img, images.image)
        glob_boxes = np.concatenate([p[1].boxes for p in parts])
        np.testing.assert_array_equal(glob_boxes, gt.boxes)
        ids = parts[0][2]["image_ids"] + parts[1][2]["image_ids"]
        assert ids == meta["image_ids"]


def test_sharded_test_loader_matches_unsharded(tmp_path, monkeypatch):
    """shard=(r, P) must reproduce the unsharded batch stream exactly —
    rank r owns batches k % P == r, foreign positions are skip sentinels —
    and foreign batches' pixels must never be decoded."""
    from fewshotobjectdetection_imporove_via_text_feature_tpu.data.loader import (
        build_detection_test_loader,
    )
    from fewshotobjectdetection_imporove_via_text_feature_tpu.data import (
        mapper as mapper_mod,
    )

    name = _register(tmp_path, "loader_sh_voc")
    cfg = _cfg(name)
    cfg.INPUT.MIN_SIZE_TEST = 192
    cfg.INPUT.MAX_SIZE_TEST = 512

    full = list(build_detection_test_loader(
        cfg, name, batch_size=2, prefetch=False
    ))

    calls = []
    orig = mapper_mod.DatasetMapper.__call__

    def counting(self, record, rng, plan=None):
        calls.append(record["image_id"])
        return orig(self, record, rng, plan)

    monkeypatch.setattr(mapper_mod.DatasetMapper, "__call__", counting)

    P = 2
    shards = [
        list(build_detection_test_loader(
            cfg, name, batch_size=2, prefetch=False, shard=(r, P)
        ))
        for r in range(P)
    ]
    for r, stream in enumerate(shards):
        assert len(stream) == len(full)
        for k, (images, gt, meta) in enumerate(stream):
            if k % P == r:
                np.testing.assert_array_equal(
                    images.image, full[k][0].image
                )
                assert meta["image_ids"] == full[k][2]["image_ids"]
                assert meta["valid_count"] == full[k][2]["valid_count"]
            else:
                assert images is None and meta["skip"]

    # decode ran exactly once per owned slot (incl. pad copies) and never
    # for a foreign batch
    owned_ids = [
        i
        for r, stream in enumerate(shards)
        for k, b in enumerate(stream)
        if k % P == r
        for i in b[2]["image_ids"]
    ]
    assert sorted(calls) == sorted(owned_ids)


def test_multiple_buckets_used(tmp_path):
    # the fixture's multi-scale choice must actually exercise >1 bucket,
    # otherwise the agreement test above is vacuous
    name = _register(tmp_path, "loader_mh_voc2")
    cfg = _cfg(name)
    shapes = {
        b[0].image.shape[1:3]
        for b in _take(
            build_detection_train_loader(cfg, seed=7, prefetch=False), 8
        )
    }
    assert len(shapes) > 1, shapes
