"""COCO data path end-to-end: synthetic COCO json -> registry -> loader ->
inference -> COCOEvaluator with base/novel splits."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from fewshotobjectdetection_imporove_via_text_feature_tpu.data.builtin_meta import (
    _get_coco_fewshot_instances_meta,
)
from fewshotobjectdetection_imporove_via_text_feature_tpu.data.catalog import (
    DatasetCatalog,
    MetadataCatalog,
)
from fewshotobjectdetection_imporove_via_text_feature_tpu.data.meta_coco import (
    load_coco_json,
    register_meta_coco,
)


def make_coco(root, n=6):
    img_dir = os.path.join(root, "images")
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.RandomState(0)
    images, annotations = [], []
    aid = 1
    for i in range(n):
        w, h = 320, 240
        fname = f"{i:06d}.jpg"
        Image.fromarray(
            rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
        ).save(os.path.join(img_dir, fname))
        images.append(
            {"id": i + 1, "file_name": fname, "height": h, "width": w}
        )
        # category ids 1 (person, novel) and 8 (truck, base)
        for cid, box in ((1, [20, 30, 80, 90]), (8, [150, 60, 70, 100])):
            annotations.append(
                {
                    "id": aid,
                    "image_id": i + 1,
                    "category_id": cid,
                    "bbox": box,  # XYWH
                    "iscrowd": 0,
                    "area": box[2] * box[3],
                }
            )
            aid += 1
    data = {
        "images": images,
        "annotations": annotations,
        "categories": [{"id": 1, "name": "person"}, {"id": 8, "name": "truck"}],
    }
    json_path = os.path.join(root, "anno.json")
    with open(json_path, "w") as f:
        json.dump(data, f)
    return json_path, img_dir


def test_load_coco_json_and_id_remap(tmp_path):
    json_path, img_dir = make_coco(str(tmp_path))
    meta = _get_coco_fewshot_instances_meta()
    dicts = load_coco_json(json_path, img_dir, meta, "unit_coco_test")
    assert len(dicts) == 6
    r = dicts[0]
    assert len(r["annotations"]) == 2
    # XYWH -> XYXY
    a = r["annotations"][0]
    assert a["bbox"] == [20, 30, 100, 120]
    # contiguous remap: coco id 1 -> 0, id 8 -> 7
    cids = sorted(x["category_id"] for x in r["annotations"])
    assert cids == [0, 7]


def test_coco_register_eval_pipeline(tmp_path):
    json_path, img_dir = make_coco(str(tmp_path))
    name = "synthetic_coco14_test_all"
    if name not in DatasetCatalog:
        register_meta_coco(
            name, _get_coco_fewshot_instances_meta(), img_dir, json_path
        )

    from fewshotobjectdetection_imporove_via_text_feature_tpu.evaluation import (
        COCOEvaluator,
    )

    evaluator = COCOEvaluator(name)
    evaluator.reset()
    # feed perfect detections straight from GT
    dicts = DatasetCatalog.get(name)
    for r in dicts:
        boxes = np.array([a["bbox"] for a in r["annotations"]], np.float32)
        classes = np.array(
            [a["category_id"] for a in r["annotations"]], np.int32
        )
        scores = np.full(len(boxes), 0.9, np.float32)
        valid = np.ones(len(boxes), bool)
        evaluator.process_detections(
            [r["image_id"]], boxes[None], scores[None], classes[None],
            valid[None],
        )
    res = evaluator.evaluate()["bbox"]
    assert np.isclose(res["AP"], 100.0)
    assert np.isclose(res["AP50"], 100.0)
    # base/novel splits present and perfect (person=novel, truck=base)
    assert np.isclose(res["nAP"], 100.0)
    assert np.isclose(res["bAP"], 100.0)


def test_coco_eval_crowd_ignored():
    """Crowd GT: detections matching a crowd region are ignored (neither
    TP nor FP), and crowd GT never counts toward npos."""
    from fewshotobjectdetection_imporove_via_text_feature_tpu.evaluation.coco_eval import (
        evaluate_coco_detections,
    )

    gt = {
        "a": [
            {"bbox": [0, 0, 100, 100], "category_id": 0, "iscrowd": 0},
            {"bbox": [200, 200, 400, 400], "category_id": 0, "iscrowd": 1},
        ]
    }
    dets = {
        "a": (
            np.array([[0.0, 0, 100, 100], [250, 250, 350, 350]]),
            np.array([0.9, 0.8]),
            np.array([0, 0]),
        )
    }
    res = evaluate_coco_detections(gt, dets, [0])
    # the crowd-matched det is ignored; the real det is a perfect TP
    assert np.isclose(res["AP50"], 100.0)
    assert np.isclose(res["AP"], 100.0)
