"""Render predictions vs ground truth side by side.

Parity with the reference visualize_json_results.py:42-101, without the
cv2/detectron2 dependencies: draws boxes with PIL on top of the originals.

Input json: a list of {"image_id", "bbox" [x,y,w,h] (COCO XYWH), "score",
"category_id"} records — the coco_instances_results.json dump our
evaluators produce (same convention as the reference's
instances_to_coco_json; the reference visualizer converts XYWH->XYXY at
visualize_json_results.py:55-57). category_id is a dataset id when the
dataset defines an id map (COCO), else a contiguous index (VOC).
"""

from __future__ import annotations

import argparse
import json
import os
from collections import defaultdict

import numpy as np
from PIL import Image, ImageDraw


def _color(i):
    rng = np.random.RandomState(i * 7919 + 13)
    return tuple(int(v) for v in rng.randint(64, 255, 3))


def draw(img, boxes, labels, colors, width=2):
    d = ImageDraw.Draw(img)
    for box, label, color in zip(boxes, labels, colors):
        x1, y1, x2, y2 = [float(v) for v in box]
        d.rectangle([x1, y1, x2, y2], outline=color, width=width)
        d.text((x1 + 2, max(y1 - 12, 0)), label, fill=color)
    return img


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="predictions json")
    p.add_argument("--output", required=True, help="output dir")
    p.add_argument("--dataset", default="voc_2007_test_all1")
    p.add_argument("--conf-threshold", type=float, default=0.5)
    args = p.parse_args()

    from fewshotobjectdetection_imporove_via_text_feature_tpu.data import (
        MetadataCatalog,
        get_detection_dataset_dicts,
        register_all,
    )

    register_all()
    meta = MetadataCatalog.get(args.dataset)
    classes = meta.thing_classes
    id_map = meta.get("thing_dataset_id_to_contiguous_id")
    to_contig = (lambda c: id_map.get(c, 0)) if id_map else (lambda c: c)
    dicts = get_detection_dataset_dicts([args.dataset], filter_empty=False)
    by_id = {r["image_id"]: r for r in dicts}

    with open(args.input) as f:
        preds = json.load(f)
    grouped = defaultdict(list)
    for pr in preds:
        grouped[pr["image_id"]].append(pr)

    os.makedirs(args.output, exist_ok=True)
    for image_id, prs in grouped.items():
        rec = by_id.get(image_id)
        if rec is None:
            continue
        img = Image.open(rec["file_name"]).convert("RGB")
        w, h = img.size

        pred_img = img.copy()
        keep = [p for p in prs if p["score"] >= args.conf_threshold]
        draw(
            pred_img,
            [
                [p["bbox"][0], p["bbox"][1],
                 p["bbox"][0] + p["bbox"][2], p["bbox"][1] + p["bbox"][3]]
                for p in keep
            ],
            [
                f"{classes[to_contig(p['category_id'])]} {p['score']:.2f}"
                for p in keep
            ],
            [_color(to_contig(p["category_id"])) for p in keep],
        )

        gt_img = img.copy()
        annos = rec.get("annotations", [])
        draw(
            gt_img,
            [a["bbox"] for a in annos],
            [classes[a["category_id"]] for a in annos],
            [_color(a["category_id"]) for a in annos],
        )

        combo = Image.new("RGB", (w * 2 + 4, h), (255, 255, 255))
        combo.paste(pred_img, (0, 0))
        combo.paste(gt_img, (w + 4, 0))
        combo.save(os.path.join(args.output, f"{image_id}.jpg"))
    print(f"wrote {len(grouped)} visualizations to {args.output}")


if __name__ == "__main__":
    main()
