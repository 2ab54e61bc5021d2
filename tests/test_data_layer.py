"""Data layer tests against a synthetic on-disk VOC dataset."""

import os

import numpy as np
import pytest
from PIL import Image

from fewshotobjectdetection_imporove_via_text_feature_tpu.config import get_cfg
from fewshotobjectdetection_imporove_via_text_feature_tpu.data.builtin_meta import (
    PASCAL_VOC_ALL_CATEGORIES,
    _get_coco_fewshot_instances_meta,
)
from fewshotobjectdetection_imporove_via_text_feature_tpu.data.mapper import (
    DatasetMapper,
    pick_bucket,
    resize_shortest_edge_size,
)
from fewshotobjectdetection_imporove_via_text_feature_tpu.data.meta_voc import (
    load_filtered_voc_instances,
)

VOC_XML = """<annotation>
  <size><width>{w}</width><height>{h}</height><depth>3</depth></size>
  {objs}
</annotation>"""

OBJ_XML = """<object>
    <name>{name}</name><difficult>{diff}</difficult>
    <bndbox><xmin>{x1}</xmin><ymin>{y1}</ymin><xmax>{x2}</xmax><ymax>{y2}</ymax></bndbox>
  </object>"""


def make_voc(root, n=4, year="2007"):
    d = os.path.join(root, f"VOC{year}")
    os.makedirs(os.path.join(d, "Annotations"), exist_ok=True)
    os.makedirs(os.path.join(d, "JPEGImages"), exist_ok=True)
    os.makedirs(os.path.join(d, "ImageSets", "Main"), exist_ok=True)
    ids = []
    rng = np.random.RandomState(0)
    for i in range(n):
        fid = f"{i:06d}"
        ids.append(fid)
        w, h = 300 + 20 * i, 220 + 10 * i
        objs = OBJ_XML.format(name="dog", diff=0, x1=10, y1=20, x2=100, y2=120)
        objs += OBJ_XML.format(name="cat", diff=1, x1=50, y1=60, x2=200, y2=180)
        objs += OBJ_XML.format(name="bird", diff=0, x1=5, y1=5, x2=60, y2=50)
        with open(os.path.join(d, "Annotations", fid + ".xml"), "w") as f:
            f.write(VOC_XML.format(w=w, h=h, objs=objs))
        img = Image.fromarray(
            rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
        )
        img.save(os.path.join(d, "JPEGImages", fid + ".jpg"))
    with open(os.path.join(d, "ImageSets", "Main", "trainval.txt"), "w") as f:
        f.write("\n".join(ids))
    return d, ids


def test_resize_shortest_edge():
    assert resize_shortest_edge_size(480, 640, 800, 1333) == (800, 1067)
    # max_size clamp
    h, w = resize_shortest_edge_size(500, 1000, 800, 1333)
    assert w == 1333 and abs(h - 667) <= 1


def test_pick_bucket_orientation():
    buckets = [(800, 1344), (672, 1120)]
    assert pick_bucket(600, 1000, buckets) == (672, 1120)
    assert pick_bucket(1000, 600, buckets) == (1120, 672)
    assert pick_bucket(2000, 2000, buckets) == (2048, 2048)  # fallback


def test_load_voc_full_split(tmp_path):
    d, ids = make_voc(str(tmp_path))
    classes = PASCAL_VOC_ALL_CATEGORIES[1]
    dicts = load_filtered_voc_instances(
        "voc_2007_trainval_all1", d, "trainval", classes, root=str(tmp_path)
    )
    assert len(dicts) == len(ids)
    r = dicts[0]
    # dog, cat, bird all in split-1 ALL classes
    assert len(r["annotations"]) == 3
    # VOC -1 origin shift applied
    assert r["annotations"][0]["bbox"][0] == 9.0
    assert r["annotations"][0]["category_id"] == classes.index("dog")
    # difficult flag preserved for the evaluator
    assert r["annotations"][1]["difficult"] == 1


def test_voc_few_shot_split(tmp_path):
    d, ids = make_voc(str(tmp_path))
    split_dir = tmp_path / "vocsplit" / "seed0"
    split_dir.mkdir(parents=True)
    classes = ["dog", "cat"]
    for cls in classes:
        with open(split_dir / f"box_2shot_{cls}_train.txt", "w") as f:
            for fid in ids[:3]:  # 3 candidates > 2 shots
                f.write(f"VOC2007/JPEGImages/{fid}.jpg\n")
    dicts = load_filtered_voc_instances(
        "voc_2007_trainval_novel1_2shot_seed0",
        d,
        "trainval",
        classes,
        root=str(tmp_path),
    )
    # 2 shots x 2 classes, one instance per record
    assert len(dicts) == 4
    for r in dicts:
        assert len(r["annotations"]) == 1


def test_voc_few_shot_multi_instance_pool(tmp_path):
    """An image with several same-class objects contributes one candidate
    record PER OBJECT (reference meta_voc.py:63-89 loops over objects with
    no break), and the K-subsample is deterministic across loads (seeded
    from a stable digest of the dataset name, not salted hash())."""
    d = os.path.join(str(tmp_path), "VOC2007")
    os.makedirs(os.path.join(d, "Annotations"), exist_ok=True)
    os.makedirs(os.path.join(d, "JPEGImages"), exist_ok=True)
    fid = "000042"
    objs = OBJ_XML.format(name="dog", diff=0, x1=10, y1=20, x2=100, y2=120)
    objs += OBJ_XML.format(name="dog", diff=0, x1=150, y1=30, x2=250, y2=130)
    objs += OBJ_XML.format(name="cat", diff=0, x1=50, y1=60, x2=200, y2=180)
    with open(os.path.join(d, "Annotations", fid + ".xml"), "w") as f:
        f.write(VOC_XML.format(w=300, h=220, objs=objs))
    Image.fromarray(np.zeros((220, 300, 3), np.uint8)).save(
        os.path.join(d, "JPEGImages", fid + ".jpg")
    )
    split_dir = tmp_path / "vocsplit" / "seed0"
    split_dir.mkdir(parents=True)
    with open(split_dir / "box_2shot_dog_train.txt", "w") as f:
        f.write(f"VOC2007/JPEGImages/{fid}.jpg\n")

    dicts = load_filtered_voc_instances(
        "voc_2007_trainval_novel1_2shot_seed0", d, "trainval", ["dog"],
        root=str(tmp_path),
    )
    # both dog instances are distinct candidates; 2 candidates == 2 shots,
    # so no subsample: both boxes must appear, each as its own record
    assert len(dicts) == 2
    boxes = sorted(r["annotations"][0]["bbox"][0] for r in dicts)
    assert boxes == [9.0, 149.0]

    # 3 candidates > 2 shots: subsample must be identical across loads
    with open(split_dir / "box_2shot_dog_train.txt", "w") as f:
        f.write(f"VOC2007/JPEGImages/{fid}.jpg\n")
        f.write(f"VOC2007/JPEGImages/{fid}.jpg\n")
    a = load_filtered_voc_instances(
        "voc_2007_trainval_novel1_2shot_seed0", d, "trainval", ["dog"],
        root=str(tmp_path),
    )
    b = load_filtered_voc_instances(
        "voc_2007_trainval_novel1_2shot_seed0", d, "trainval", ["dog"],
        root=str(tmp_path),
    )
    assert len(a) == 2
    assert [r["annotations"][0]["bbox"] for r in a] == [
        r["annotations"][0]["bbox"] for r in b
    ]


def test_mapper_applies_exif_orientation(tmp_path):
    """EXIF-rotated JPEGs decode in DISPLAYED orientation (the reference's
    read_image applies _apply_exif_orientation before any transform);
    the raw libjpeg fast path must be bypassed for such files."""
    from PIL import Image as PILImage, ImageOps

    rng = np.random.RandomState(0)
    stored = rng.randint(0, 255, (40, 60, 3), np.uint8)  # stored h=40 w=60
    p = tmp_path / "rot.jpg"
    e = PILImage.Exif()
    e[0x0112] = 6  # 90-degree rotation: displayed size is 60x40
    PILImage.fromarray(stored).save(
        str(p), format="JPEG", quality=95, exif=e.tobytes()
    )
    displayed = np.asarray(
        ImageOps.exif_transpose(PILImage.open(str(p))).convert("RGB")
    )
    assert displayed.shape[:2] == (60, 40)

    record = {
        "file_name": str(p), "image_id": "rot",
        "height": 60, "width": 40,
        "annotations": [{"category_id": 0, "bbox": [5.0, 5.0, 30.0, 50.0]}],
    }
    mapper = DatasetMapper(
        is_train=False, min_size=40, max_size=100, buckets=[(64, 64)],
        max_gt=5, random_flip=False,
    )
    item = mapper(record, np.random.RandomState(0))
    h, w = item["hw"]
    assert (h, w) == (60, 40)
    np.testing.assert_array_equal(
        item["image"][:h, :w], displayed[:, :, ::-1]  # BGR
    )


def test_mapper_fixed_shapes(tmp_path):
    d, ids = make_voc(str(tmp_path))
    classes = PASCAL_VOC_ALL_CATEGORIES[1]
    dicts = load_filtered_voc_instances(
        "voc_2007_trainval_all1", d, "trainval", classes, root=str(tmp_path)
    )
    mapper = DatasetMapper(
        is_train=True,
        min_size=(480,),
        max_size=800,
        buckets=[(480, 800)],
        max_gt=10,
    )
    rng = np.random.RandomState(1)
    item = mapper(dicts[0], rng)
    assert item["image"].shape == (480, 800, 3)
    assert item["gt_boxes"].shape == (10, 4)
    assert item["gt_valid"].sum() == 3
    h, w = item["hw"]
    assert h <= 480 and w <= 800
    # boxes scaled into the resized frame and inside the valid region
    gb = item["gt_boxes"][item["gt_valid"]]
    assert gb[:, 2].max() <= w + 1e-3
    assert gb[:, 3].max() <= h + 1e-3


def test_mapper_range_sampling(tmp_path):
    """INPUT.MIN_SIZE_TRAIN_SAMPLING = "range": the short edge draws
    uniformly from [min, max] inclusive (d2 ResizeShortestEdge
    sample_style="range")."""
    d, ids = make_voc(str(tmp_path))
    classes = PASCAL_VOC_ALL_CATEGORIES[1]
    dicts = load_filtered_voc_instances(
        "voc_2007_trainval_all1", d, "trainval", classes, root=str(tmp_path)
    )
    mapper = DatasetMapper(
        is_train=True,
        min_size=(200, 260),
        max_size=512,
        buckets=[(260, 512)],
        max_gt=10,
        sampling="range",
    )
    rng = np.random.RandomState(0)
    shorts = {mapper.plan(dicts[0], rng)["short"] for _ in range(200)}
    assert min(shorts) >= 200 and max(shorts) <= 260
    assert len(shorts) > 20  # a genuine continuum, not the 2 endpoints
    # the plan/__call__ rng contract still holds: identically-seeded rngs
    # produce a plan that __call__ reproduces
    p = mapper.plan(dicts[0], np.random.RandomState(7))
    item = mapper(dicts[0], np.random.RandomState(7))
    assert item["image"].shape == (260, 512, 3)
    hw = resize_shortest_edge_size(
        dicts[0]["height"], dicts[0]["width"], p["short"], 512
    )
    assert tuple(item["hw"]) == hw

    with pytest.raises(ValueError, match="range sampling"):
        DatasetMapper(
            is_train=True, min_size=(200,), max_size=512,
            buckets=[(260, 512)], sampling="range",
        )
    with pytest.raises(ValueError, match="min <= max"):
        DatasetMapper(
            is_train=True, min_size=(260, 200), max_size=512,
            buckets=[(260, 512)], sampling="range",
        )
    with pytest.raises(ValueError, match="Unknown MIN_SIZE_TRAIN_SAMPLING"):
        DatasetMapper(
            is_train=True, min_size=(200, 260), max_size=512,
            buckets=[(260, 512)], sampling="nope",
        )


def test_coco_meta_partition():
    meta = _get_coco_fewshot_instances_meta()
    assert len(meta["thing_classes"]) == 80
    assert len(meta["novel_classes"]) == 20
    assert len(meta["base_classes"]) == 60
    assert set(meta["novel_classes"]) & set(meta["base_classes"]) == set()


def test_get_class_name_resolution():
    """Split-id parsing: the {kind}{N} token resolves wherever it sits
    (static names, seeded few-shot names, custom registrations), with a
    MetadataCatalog fallback for names the grammar can't parse."""
    from fewshotobjectdetection_imporove_via_text_feature_tpu.data.builtin_meta import (
        PASCAL_VOC_BASE_CATEGORIES,
        PASCAL_VOC_NOVEL_CATEGORIES,
    )
    from fewshotobjectdetection_imporove_via_text_feature_tpu.data.catalog import (
        DatasetCatalog,
        MetadataCatalog,
    )
    from fewshotobjectdetection_imporove_via_text_feature_tpu.utils.class_name import (
        get_class_name,
    )

    cfg = get_cfg()

    def names_for(ds):
        cfg.DATASETS.TRAIN = (ds,)
        return get_class_name(cfg)

    # static 'all' (the reference's [-3] parse KeyErrors on this)
    assert names_for("voc_2007_trainval_all1") == PASCAL_VOC_ALL_CATEGORIES[1]
    # seeded few-shot
    assert (
        names_for("voc_2007_trainval_all2_3shot_seed4")
        == PASCAL_VOC_ALL_CATEGORIES[2]
    )
    assert (
        names_for("voc_2007_trainval_novel3_1shot_seed0")
        == PASCAL_VOC_NOVEL_CATEGORIES[3]
    )
    assert names_for("voc_2007_trainval_base2") == PASCAL_VOC_BASE_CATEGORIES[2]
    # custom registration with extra trailing tokens
    assert (
        names_for("voc_custom_all1_t_train") == PASCAL_VOC_ALL_CATEGORIES[1]
    )
    # unparseable name falls back to the catalog's thing_classes
    name = "my_weird_voc_all_set"
    if name in DatasetCatalog:
        DatasetCatalog._registry.pop(name)
    DatasetCatalog.register(name, lambda: [])
    MetadataCatalog.get(name).set(thing_classes=["a", "b"])
    assert names_for(name) == ["a", "b"]
    # totally unresolvable raises
    with pytest.raises(ValueError):
        names_for("voc_nothing_matches_here")


# ---------------------------------------------------------------------------
# INPUT.CROP (d2 RandomCrop) — golden vs a numpy transcription of
# detectron2's RandomCrop.get_crop_size / get_transform
# (augmentation_impl.py) and CropTransform.apply_box +
# transform_instance_annotations clipping (transform.py /
# detection_utils.py). Reference inserts the aug at position 0 (before
# resize/flip): /root/reference/defrcn/dataloader/dataset_mapper.py:83-87.
# ---------------------------------------------------------------------------


def _d2_random_crop_transcription(crop_type, crop_size, h, w, rng):
    """Independent transcription of d2 RandomCrop (get_crop_size +
    get_transform), numpy-only, same rng draw order as the mapper's
    helpers (size draws, then y0, then x0)."""
    if crop_type == "relative":
        ch, cw = crop_size
        croph, cropw = int(h * ch + 0.5), int(w * cw + 0.5)
    elif crop_type == "relative_range":
        csize = np.asarray(crop_size, dtype=np.float32)
        ch, cw = csize + rng.rand(2).astype(np.float32) * (1 - csize)
        croph, cropw = int(h * ch + 0.5), int(w * cw + 0.5)
    elif crop_type == "absolute":
        croph, cropw = (min(crop_size[0], h), min(crop_size[1], w))
    elif crop_type == "absolute_range":
        assert crop_size[0] <= crop_size[1]
        croph = rng.randint(min(h, crop_size[0]), min(h, crop_size[1]) + 1)
        cropw = rng.randint(min(w, crop_size[0]), min(w, crop_size[1]) + 1)
    assert h >= croph and w >= cropw
    y0 = rng.randint(h - croph + 1)
    x0 = rng.randint(w - cropw + 1)
    return y0, x0, croph, cropw


def test_random_crop_plan_matches_d2_transcription():
    from fewshotobjectdetection_imporove_via_text_feature_tpu.data.mapper import (
        random_crop_plan,
    )

    cases = [
        ("relative", (0.7, 0.6), 333, 517),
        ("relative_range", (0.4, 0.5), 480, 640),
        ("absolute", (200, 300), 250, 280),
        ("absolute", (400, 500), 250, 280),  # clamped to image
        ("absolute_range", (100, 400), 250, 333),
    ]
    for seed in range(20):
        for ctype, csize, h, w in cases:
            ours = random_crop_plan(
                ctype, csize, h, w, np.random.RandomState(seed)
            )
            d2 = _d2_random_crop_transcription(
                ctype, csize, h, w, np.random.RandomState(seed)
            )
            assert ours == tuple(d2), (ctype, csize, h, w, seed, ours, d2)


def test_random_crop_size_rounding_fixed_points():
    """Hand-derived d2 rounding semantics: int(dim * frac + 0.5)."""
    from fewshotobjectdetection_imporove_via_text_feature_tpu.data.mapper import (
        random_crop_size,
    )

    # 333 * 0.7 + 0.5 = 233.6 -> 233; 517 * 0.6 + 0.5 = 310.7 -> 310
    assert random_crop_size("relative", (0.7, 0.6), 333, 517, None) == (233, 310)
    # absolute clamps to the image
    assert random_crop_size("absolute", (400, 200), 250, 280, None) == (250, 200)
    with pytest.raises(ValueError, match="Unknown INPUT.CROP.TYPE"):
        random_crop_size("fractional", (0.5, 0.5), 100, 100, None)


def test_crop_boxes_shift_and_clip():
    from fewshotobjectdetection_imporove_via_text_feature_tpu.data.mapper import (
        crop_boxes,
    )

    boxes = np.array(
        [
            [30.0, 40.0, 60.0, 80.0],   # fully inside the crop
            [0.0, 0.0, 30.0, 30.0],     # straddles the crop origin
            [0.0, 0.0, 10.0, 10.0],     # fully outside -> degenerate
            [90.0, 90.0, 200.0, 200.0], # straddles the far edge
        ],
        np.float32,
    )
    # crop window y0=20, x0=25, ch=100, cw=110 (frame: x in [25,135), ...)
    out = crop_boxes(boxes.copy(), 20, 25, 100, 110)
    np.testing.assert_allclose(out[0], [5, 20, 35, 60])
    np.testing.assert_allclose(out[1], [0, 0, 5, 10])
    # degenerate: clipped to zero area (x2 == x1 == 0)
    assert out[2][2] - out[2][0] == 0
    np.testing.assert_allclose(out[3], [65, 70, 110, 100])


def test_mapper_crop_host_path(tmp_path):
    """Host path with INPUT.CROP: pixels are crop->resize->flip of the
    decoded image and boxes are shifted+clipped into the crop frame then
    scaled; the plan()/__call__ rng contract holds; empty boxes drop."""
    d, ids = make_voc(str(tmp_path))
    classes = PASCAL_VOC_ALL_CATEGORIES[1]
    dicts = load_filtered_voc_instances(
        "voc_2007_trainval_all1", d, "trainval", classes, root=str(tmp_path)
    )
    rec = dicts[0]  # 300x220, boxes at [10,20,100,120],[50,60,200,180],[5,5,60,50]
    mapper = DatasetMapper(
        is_train=True,
        min_size=(128,),
        max_size=256,
        buckets=[(192, 256)],
        max_gt=10,
        random_flip=True,
        native_io=True,  # must be BYPASSED when crop is active
        crop=("absolute", (150, 200)),
    )
    seed = 3
    plan = mapper.plan(rec, np.random.RandomState(seed))
    item = mapper(rec, np.random.RandomState(seed))
    y0, x0, ch, cw = plan["crop"]
    assert (ch, cw) == (150, 200)

    # oracle: PIL decode -> crop -> resize -> BGR -> flip
    img = Image.open(rec["file_name"]).convert("RGB")
    img = img.crop((x0, y0, x0 + cw, y0 + ch))
    h, w = resize_shortest_edge_size(ch, cw, 128, 256)
    arr = np.asarray(img.resize((w, h), Image.BILINEAR), np.uint8)[:, :, ::-1]
    if plan["flip"]:
        arr = arr[:, ::-1, :]
    assert tuple(item["hw"]) == (h, w)
    np.testing.assert_array_equal(item["image"][:h, :w], arr)

    # oracle boxes: shift+clip into the crop frame, scale, flip, clip
    raw = np.array(
        [a["bbox"] for a in rec["annotations"]], np.float32
    ).reshape(-1, 4)
    shifted = raw - np.array([x0, y0, x0, y0], np.float32)
    shifted[:, 0::2] = shifted[:, 0::2].clip(0, cw)
    shifted[:, 1::2] = shifted[:, 1::2].clip(0, ch)
    scaled = shifted * np.array([w / cw, h / ch, w / cw, h / ch], np.float32)
    if plan["flip"]:
        scaled = np.stack(
            [w - scaled[:, 2], scaled[:, 1], w - scaled[:, 0], scaled[:, 3]],
            axis=1,
        )
    scaled[:, 0::2] = scaled[:, 0::2].clip(0, w)
    scaled[:, 1::2] = scaled[:, 1::2].clip(0, h)
    keep = (scaled[:, 2] > scaled[:, 0]) & (scaled[:, 3] > scaled[:, 1])
    expect = scaled[keep]
    got = item["gt_boxes"][item["gt_valid"]]
    assert got.shape == expect.shape
    np.testing.assert_allclose(got, expect, atol=1e-4)


def test_mapper_crop_drops_fully_outside_boxes(tmp_path):
    """A GT fully outside the crop window becomes zero-area after the
    shift+clip and must be dropped (filter_empty_instances semantics)."""
    d, ids = make_voc(str(tmp_path))
    classes = PASCAL_VOC_ALL_CATEGORIES[1]
    dicts = load_filtered_voc_instances(
        "voc_2007_trainval_all1", d, "trainval", classes, root=str(tmp_path)
    )
    rec = dict(dicts[0])
    # image 0 is 300x220; place one box in the far corner and crop the
    # opposite corner deterministically via a rigged rng
    rec["annotations"] = [
        {"category_id": 0, "bbox": [250.0, 180.0, 295.0, 215.0]},
        {"category_id": 1, "bbox": [10.0, 10.0, 80.0, 80.0]},
    ]

    class FixedRng:
        """randint(n) -> 0: crop at origin; rand() -> 0.9: no flip draw
        ambiguity (flip=False since 0.9 >= 0.5)."""

        def randint(self, *a, **k):
            return 0

        def rand(self, *a):
            return np.zeros(a) if a else 0.9

    mapper = DatasetMapper(
        is_train=True, min_size=(128,), max_size=256,
        buckets=[(192, 256)], max_gt=10, random_flip=True,
        crop=("absolute", (150, 200)),
    )
    item = mapper(rec, FixedRng())
    # only the in-window box survives
    assert item["gt_valid"].sum() == 1
    assert item["gt_classes"][item["gt_valid"]][0] == 1


def test_mapper_crop_device_preprocess_path(tmp_path):
    """Device-preprocess mode: the crop happens on host; the raw payload
    is the cropped uint8 extent, orig_hw/buckets describe the crop."""
    d, ids = make_voc(str(tmp_path))
    classes = PASCAL_VOC_ALL_CATEGORIES[1]
    dicts = load_filtered_voc_instances(
        "voc_2007_trainval_all1", d, "trainval", classes, root=str(tmp_path)
    )
    rec = dicts[1]
    mapper = DatasetMapper(
        is_train=True, min_size=(128,), max_size=256,
        buckets=[(192, 256)], max_gt=10, random_flip=True,
        device_preprocess=True, raw_buckets=[(256, 384)],
        crop=("absolute", (160, 240)),
    )
    seed = 5
    plan = mapper.plan(rec, np.random.RandomState(seed))
    item = mapper(rec, np.random.RandomState(seed))
    y0, x0, ch, cw = plan["crop"]
    assert tuple(item["orig_hw"]) == (ch, cw)
    img = np.asarray(
        Image.open(rec["file_name"]).convert("RGB"), np.uint8
    )[:, :, ::-1]
    np.testing.assert_array_equal(
        item["image"][:ch, :cw], img[y0 : y0 + ch, x0 : x0 + cw]
    )
    # plan bucket agrees with the decode-time bucket (lockstep contract)
    assert plan["bucket"] == item["bucket"]


def test_mapper_crop_stale_metadata_raises(tmp_path):
    """ADVICE r3: with INPUT.CROP, bucket validation derives from the crop
    extent, so a stale height/width record can't be caught by the bucket
    guard — both decode paths must validate the decoded size against the
    planned crop explicitly instead of silently zero-padding (host/PIL)
    or broadcast-crashing (device-preprocess)."""
    d, ids = make_voc(str(tmp_path))
    classes = PASCAL_VOC_ALL_CATEGORIES[1]
    dicts = load_filtered_voc_instances(
        "voc_2007_trainval_all1", d, "trainval", classes, root=str(tmp_path)
    )
    rec = dict(dicts[0])  # true decoded size 300x220 (w x h)
    # claim the image is much larger than it is: the crop plan drawn from
    # the metadata can exceed the decoded extent
    rec["height"], rec["width"] = 600, 600
    for device_preprocess in (False, True):
        mapper = DatasetMapper(
            is_train=True,
            min_size=(128,),
            max_size=256,
            buckets=[(192, 256)],
            raw_buckets=[(640, 640)] if device_preprocess else (),
            max_gt=10,
            random_flip=False,
            crop=("absolute", (400, 500)),
            device_preprocess=device_preprocess,
        )
        with pytest.raises(ValueError, match="smaller than the planned crop"):
            mapper(rec, np.random.RandomState(0))
