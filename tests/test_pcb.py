"""PCB batched feature extraction: grouping by bucket + padding must give
the same activations as one-image-at-a-time calls, and execute_calibration
must equal per-image calibrate_image (ref calibration_layer.py:96-124)."""

import numpy as np
import pytest

from fewshotobjectdetection_imporove_via_text_feature_tpu.config import get_cfg
from fewshotobjectdetection_imporove_via_text_feature_tpu.data.catalog import (
    DatasetCatalog,
)
from fewshotobjectdetection_imporove_via_text_feature_tpu.data.builtin_meta import (
    PASCAL_VOC_ALL_CATEGORIES,
)
from fewshotobjectdetection_imporove_via_text_feature_tpu.data.meta_voc import (
    load_filtered_voc_instances,
)

from test_data_layer import make_voc


@pytest.fixture(scope="module")
def pcb(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("pcbvoc")
    d, _ = make_voc(str(tmp), n=3)
    classes = PASCAL_VOC_ALL_CATEGORIES[1]
    for name in ("pcb_train_voc", "pcb_test_voc"):
        if name in DatasetCatalog:
            DatasetCatalog._registry.pop(name)
        DatasetCatalog.register(
            name,
            lambda: load_filtered_voc_instances(
                "voc_2007_trainval_all1", d, "trainval", classes,
                root=str(tmp),
            ),
        )
    cfg = get_cfg()
    cfg.DATASETS.TRAIN = ("pcb_train_voc",)
    cfg.DATASETS.TEST = ("pcb_test_voc",)
    cfg.TEST.PCB_MODELPATH = ""  # random init is fine for equivalence tests
    from fewshotobjectdetection_imporove_via_text_feature_tpu.evaluation.pcb import (
        PrototypicalCalibrationBlock,
    )

    return PrototypicalCalibrationBlock(cfg)


def test_batched_features_match_single(pcb):
    files = list(pcb._files.values())[:3]
    rng = np.random.RandomState(0)
    boxes = [
        np.array([[10, 10, 120, 100], [30, 40, 200, 180]], np.float32),
        np.array([[5, 5, 60, 50]], np.float32),
        np.array([[0, 0, 150, 150], [20, 20, 80, 90], [4, 4, 44, 44]],
                 np.float32),
    ]
    batched = pcb._roi_features_batch(files, boxes)
    for f, b, got in zip(files, boxes, batched):
        single = pcb._roi_features_batch([f], [b])[0]
        np.testing.assert_allclose(got, single, rtol=2e-4, atol=2e-4)
        assert got.shape == (len(b), 1000)


def test_pad_region_does_not_affect_features(pcb):
    """The jitted extractor must zero the pad region in NORMALIZED space:
    ROI features may not depend on what bytes sit beyond each image's valid
    (h, w). Pre-fix, uint8 zero-pad became 'normalized black' (~-2 per
    channel) and leaked into border features (ADVICE r1, medium)."""
    import jax.numpy as jnp

    rng = np.random.RandomState(3)
    bh, bw = 128, 128
    h, w = 100, 90
    img = np.zeros((1, bh, bw, 3), np.uint8)
    img[0, :h, :w] = rng.randint(0, 255, (h, w, 3), np.uint8)
    junk = img.copy()
    junk[0, h:, :] = 255
    junk[0, :, w:] = 137
    boxes = np.array([[[60.0, 50.0, 89.0, 99.0]]], np.float32)  # touches edge
    hw = np.array([[h, w]], np.int32)
    fn = pcb._extract_fn((bh, bw, 1, 1))
    a = np.asarray(fn(pcb.params, jnp.asarray(img), jnp.asarray(boxes),
                      jnp.asarray(hw)))
    b = np.asarray(fn(pcb.params, jnp.asarray(junk), jnp.asarray(boxes),
                      jnp.asarray(hw)))
    np.testing.assert_array_equal(a, b)


def test_execute_calibration_matches_per_image(pcb):
    ids = list(pcb._files.keys())[:2]
    rng = np.random.RandomState(1)
    d = 6
    det = {
        "boxes": rng.uniform(5, 120, (2, d, 4)).astype(np.float32),
        "scores": rng.uniform(0.2, 0.9, (2, d)).astype(np.float32),
        "classes": rng.randint(15, 20, (2, d)).astype(np.int32),
        "valid": np.ones((2, d), bool),
    }
    det["boxes"][..., 2:] += det["boxes"][..., :2]

    expect = {k: v.copy() for k, v in det.items()}
    for i, image_id in enumerate(ids):
        expect["scores"][i] = pcb.calibrate_image(
            image_id, expect["boxes"][i], expect["scores"][i],
            expect["classes"][i], expect["valid"][i],
        )

    got = pcb.execute_calibration(ids, {k: v.copy() for k, v in det.items()})
    np.testing.assert_allclose(
        got["scores"], expect["scores"], rtol=2e-4, atol=2e-4
    )
    # mid-confidence scores actually moved
    assert not np.allclose(got["scores"], det["scores"])


def test_colliding_image_ids_across_test_datasets(pcb, tmp_path):
    """VOC 2007/2012 share image_ids; an id->file map must not silently
    resolve to the wrong dataset's pixels. With batch-supplied file_names
    (the evaluator path) calibration uses the right file; the id-map
    fallback fails loudly on ambiguous ids instead of guessing."""
    image_id = next(iter(pcb._files))
    right = pcb._files[image_id]
    # poison: same id registered with a different file
    pcb._ambiguous.add(image_id)
    try:
        rng = np.random.RandomState(2)
        det = {
            "boxes": rng.uniform(5, 80, (1, 3, 4)).astype(np.float32),
            "scores": rng.uniform(0.2, 0.9, (1, 3)).astype(np.float32),
            "classes": np.array(
                [(list(pcb.prototypes) * 3)[:3]], np.int32
            ),
            "valid": np.ones((1, 3), bool),
        }
        det["boxes"][..., 2:] += det["boxes"][..., :2]

        with pytest.raises(ValueError, match="multiple DATASETS.TEST"):
            pcb.execute_calibration(
                [image_id], {k: v.copy() for k, v in det.items()}
            )

        got = pcb.execute_calibration(
            [image_id], {k: v.copy() for k, v in det.items()},
            file_names=[right],
        )
        assert not np.allclose(got["scores"], det["scores"])
    finally:
        pcb._ambiguous.discard(image_id)
