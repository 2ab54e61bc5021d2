"""Native C++ data-IO core (JPEG decode/resize/flip/pad) vs PIL."""

import os
import tempfile

import numpy as np
import pytest
from PIL import Image

from fewshotobjectdetection_imporove_via_text_feature_tpu.data import native_io

pytestmark = pytest.mark.skipif(
    not native_io.available(), reason="native data-IO core unavailable"
)


@pytest.fixture(scope="module")
def jpeg_path():
    rng = np.random.RandomState(0)
    small = rng.uniform(0, 255, (8, 8, 3)).astype(np.uint8)
    img = Image.fromarray(small).resize((300, 220), Image.BILINEAR)
    path = os.path.join(tempfile.mkdtemp(), "t.jpg")
    img.save(path, quality=95)
    return path


def test_native_matches_pil(jpeg_path):
    res = native_io.load_image(jpeg_path, 256, 384, (288, 416))
    assert res is not None
    canvas, new_hw, orig_hw = res
    assert tuple(orig_hw) == (220, 300)
    nh, nw = int(new_hw[0]), int(new_hw[1])
    assert (nh, nw) == (256, 349)
    ref = np.asarray(
        Image.open(jpeg_path).convert("RGB").resize((nw, nh), Image.BILINEAR),
        np.float32,
    )[:, :, ::-1]
    got = canvas[:nh, :nw]
    assert np.abs(got - ref).mean() < 4.0
    assert np.abs(canvas[nh:]).max() == 0  # padding zeroed


def test_native_flip(jpeg_path):
    a = native_io.load_image(jpeg_path, 128, 256, (160, 224))[0]
    b = native_io.load_image(jpeg_path, 128, 256, (160, 224), flip=True)[0]
    nh, nw = 128, 175
    assert np.abs(b[:nh, :nw] - a[:nh, :nw][:, ::-1]).mean() < 2.0


def test_mapper_uses_native(jpeg_path):
    from fewshotobjectdetection_imporove_via_text_feature_tpu.data.mapper import (
        DatasetMapper,
    )

    record = {
        "file_name": jpeg_path,
        "image_id": "t",
        "height": 220,
        "width": 300,
        "annotations": [{"category_id": 1, "bbox": [10, 10, 100, 100]}],
    }
    mapper = DatasetMapper(
        is_train=False, min_size=(256,), max_size=384,
        buckets=[(288, 416)], max_gt=5, native_io=True,
    )
    item = mapper(record, np.random.RandomState(0))
    assert item["image"].shape == (288, 416, 3)
    assert tuple(item["hw"]) == (256, 349)
    assert item["gt_valid"].sum() == 1
    # non-jpeg falls back to PIL
    png = jpeg_path.replace(".jpg", ".png")
    Image.open(jpeg_path).save(png)
    record2 = dict(record, file_name=png)
    item2 = mapper(record2, np.random.RandomState(0))
    assert tuple(item2["hw"]) == (256, 349)
    # native vs PIL pixel agreement (loose: jpeg decoder + filter diffs)
    diff = item["image"].astype(np.float32) - item2["image"].astype(np.float32)
    assert np.abs(diff).mean() < 4.0
