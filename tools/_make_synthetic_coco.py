"""Generate a synthetic COCO-14 dataset tree + k-shot split files for
workflow smokes (used by tools/smoke_workflow_coco.sh). Mirrors the layout
the reference expects (defrcn/data/builtin.py:10-30, meta_coco.py:14-60):

  datasets/coco/trainval2014/*.jpg, datasets/coco/val2014/*.jpg
  datasets/cocosplit/datasplit/{trainvalno5k,5k}.json
  datasets/cocosplit/seed{S}/full_box_{K}shot_{cls}_trainval.json  (80 files)
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from fewshotobjectdetection_imporove_via_text_feature_tpu.data.builtin_meta import (  # noqa: E402
    COCO_THING_CATEGORIES,
)


def _categories():
    return [{"id": i, "name": n} for i, n in COCO_THING_CATEGORIES]


def _write_images(img_dir, ids, rng):
    os.makedirs(img_dir, exist_ok=True)
    images = []
    for i in ids:
        fname = f"COCO_synth_{i:012d}.jpg"
        w, h = 320 + 4 * (i % 5), 240 + 6 * (i % 3)
        Image.fromarray(
            rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
        ).save(os.path.join(img_dir, fname))
        images.append(
            {"id": i, "file_name": fname, "height": h, "width": w}
        )
    return images


def _annos(images, cats, rng, start_aid=1, per_image=3):
    annotations = []
    aid = start_aid
    for rec in images:
        for j in range(per_image):
            cat = cats[(rec["id"] * per_image + j) % len(cats)]
            x = float(rng.randint(0, rec["width"] - 80))
            y = float(rng.randint(0, rec["height"] - 80))
            bw = float(rng.randint(30, 75))
            bh = float(rng.randint(30, 75))
            annotations.append(
                {
                    "id": aid,
                    "image_id": rec["id"],
                    "category_id": cat["id"],
                    "bbox": [x, y, bw, bh],
                    "area": bw * bh,
                    "iscrowd": 0,
                }
            )
            aid += 1
    return annotations


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="datasets")
    p.add_argument("--images", type=int, default=10)
    p.add_argument("--shots", type=int, nargs="+", default=[1])
    p.add_argument("--seeds", type=int, nargs="+", default=[0])
    args = p.parse_args()

    rng = np.random.RandomState(0)
    cats = _categories()

    train_images = _write_images(
        os.path.join(args.root, "coco", "trainval2014"),
        range(1, args.images + 1), rng,
    )
    test_images = _write_images(
        os.path.join(args.root, "coco", "val2014"),
        range(1001, 1001 + max(4, args.images // 2)), rng,
    )

    ds = os.path.join(args.root, "cocosplit", "datasplit")
    os.makedirs(ds, exist_ok=True)
    with open(os.path.join(ds, "trainvalno5k.json"), "w") as f:
        json.dump(
            {"images": train_images, "categories": cats,
             "annotations": _annos(train_images, cats, rng)}, f,
        )
    with open(os.path.join(ds, "5k.json"), "w") as f:
        json.dump(
            {"images": test_images, "categories": cats,
             "annotations": _annos(test_images, cats, rng, start_aid=10**6)},
            f,
        )

    # k-shot per-class files: each class gets `shot` annotations drawn on a
    # shared pool of train images (the reference format keys files by class
    # NAME and stores a standalone tiny coco json per class).
    for seed in args.seeds:
        sd = os.path.join(args.root, "cocosplit", f"seed{seed}")
        os.makedirs(sd, exist_ok=True)
        aid = 2 * 10**6
        for ci, cat in enumerate(cats):
            for shot in args.shots:
                imgs = [train_images[(ci + k) % len(train_images)]
                        for k in range(shot)]
                annos = []
                for rec in imgs:
                    x = float(rng.randint(0, rec["width"] - 60))
                    y = float(rng.randint(0, rec["height"] - 60))
                    annos.append(
                        {"id": aid, "image_id": rec["id"],
                         "category_id": cat["id"],
                         "bbox": [x, y, 50.0, 50.0], "area": 2500.0,
                         "iscrowd": 0}
                    )
                    aid += 1
                fn = os.path.join(
                    sd, f"full_box_{shot}shot_{cat['name']}_trainval.json"
                )
                with open(fn, "w") as f:
                    json.dump(
                        {"images": imgs, "categories": cats,
                         "annotations": annos}, f,
                    )
    print(f"synthetic COCO written under {args.root}")


if __name__ == "__main__":
    main()
