"""Generate a LEARNABLE synthetic COCO-14 tree with a DISJOINT held-out
val split for the COCO held-out generalization gate
(tools/check_generalization_coco.sh) — the COCO analog of
tools/_make_generalization_voc.py.

Same principle as the VOC gate generator: class <-> solid color (hue
wheel with alternating brightness), mid-gray noisy background, so a tiny
model must LEARN the color mapping and generalize to unseen images. The
COCO-specific machinery this exercises end to end (which the VOC gate
cannot): contiguous id remapping through the category id map
(meta_coco.py), the 60 -> 80 IDMAP surgery
(reference tools/model_surgery.py:70-77), cocosplit k-shot json merging,
and COCOeval bAP/nAP aggregation
(reference defrcn/evaluation/coco_evaluation.py:132-165).

Scale accommodation (documented): only ACTIVE_BASE + ACTIVE_NOVEL of the
80 categories carry instances — 80 separable colors is beyond the
CI-scale tiny model, and COCOeval excludes zero-GT classes from the mean
(precision -1, pycocotools semantics; coco_eval.py:187). Every one of
the 80 k-shot files still exists (inactive ones are empty jsons), so the
"all"-split loader reads the full reference layout.

Layout (defrcn/data/builtin.py:10-30, meta_coco.py:14-60):
  coco/trainval2014/*.jpg + cocosplit/datasplit/trainvalno5k.json  TRAIN
  coco/val2014/*.jpg      + cocosplit/datasplit/5k.json            HELD-OUT
  cocosplit/seed{S}/full_box_{K}shot_{cls}_trainval.json           (80 files)
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from _make_generalization_voc import class_colors  # noqa: E402
from fewshotobjectdetection_imporove_via_text_feature_tpu.data.builtin_meta import (  # noqa: E402
    COCO_NOVEL_IDS,
    COCO_THING_CATEGORIES,
)

W, H = 320, 240


def active_categories(n_base=12, n_novel=4):
    """First n_base base + n_novel novel categories by COCO id order."""
    novel_set = set(COCO_NOVEL_IDS)
    base = [(i, n) for i, n in COCO_THING_CATEGORIES if i not in novel_set]
    novel = [(i, n) for i, n in COCO_THING_CATEGORIES if i in novel_set]
    return base[:n_base], novel[:n_novel]


def _background(rng):
    return np.clip(
        128 + rng.randint(-12, 13, (H, W, 3)), 0, 255
    ).astype(np.uint8)


def _place(rng, cat_ids, colors, n_obj):
    """Colored rectangles with <=10% mutual overlap; returns
    (uint8 image, [(cat_id, x1, y1, x2, y2)])."""
    img = _background(rng)
    placed = []
    for _ in range(n_obj):
        for _try in range(8):
            bw = int(rng.randint(50, 110))
            bh = int(rng.randint(50, 110))
            x1 = int(rng.randint(0, W - bw))
            y1 = int(rng.randint(0, H - bh))
            box = (x1, y1, x1 + bw, y1 + bh)
            if all(
                max(0, min(box[2], px2) - max(box[0], px1))
                * max(0, min(box[3], py2) - max(box[1], py1))
                <= 0.1 * bw * bh
                for _, px1, py1, px2, py2 in placed
            ):
                break
        else:
            continue
        cid = cat_ids[int(rng.randint(len(cat_ids)))]
        r, g, b = colors[cid]
        patch = np.stack(
            [np.full((bh, bw), v, np.int16) for v in (r, g, b)], axis=-1
        ) + rng.randint(-18, 19, (bh, bw, 3))
        img[y1:y1 + bh, x1:x1 + bw] = np.clip(patch, 0, 255).astype(np.uint8)
        placed.append((cid, *box))
    return img, placed


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", required=True)
    p.add_argument("--train", type=int, default=192)
    p.add_argument("--val", type=int, default=60)
    p.add_argument("--shots", type=int, nargs="+", default=[10])
    p.add_argument("--seed", type=int, nargs="+", default=[0])
    p.add_argument("--rng-seed", type=int, default=20260821)
    args = p.parse_args()

    base, novel = active_categories()
    active = base + novel
    active_ids = [i for i, _ in active]
    # distinct colors for the active classes, keyed by category id
    named = class_colors([n for _, n in active])
    colors = {i: named[n] for (i, n) in active}
    rng = np.random.RandomState(args.rng_seed)
    cats = [{"id": i, "name": n} for i, n in COCO_THING_CATEGORIES]

    by_class = {i: [] for i in active_ids}  # cat_id -> [(img_id, anns)]
    aid = 1

    def render_split(img_dir, ids, train):
        nonlocal aid
        os.makedirs(img_dir, exist_ok=True)
        images, annotations = [], []
        for k, img_id in enumerate(ids):
            if train:
                # single-object images: the k-shot files are per-class
                # slices, so multi-class train images would under-label
                # other classes in the merged k-shot view. First passes
                # are round-robin so every active class has >= max(shots)
                # images.
                cid = active_ids[k % len(active_ids)]
                img, placed = _place(rng, [cid], colors, 1)
                if not placed:
                    img, placed = _place(rng, [cid], colors, 1)
            else:
                img, placed = _place(
                    rng, active_ids, colors, int(rng.randint(1, 3))
                )
                if not placed:
                    img, placed = _place(rng, active_ids, colors, 1)
            fname = f"COCO_gen_{img_id:012d}.jpg"
            Image.fromarray(img).save(
                os.path.join(img_dir, fname), quality=92
            )
            images.append(
                {"id": img_id, "file_name": fname, "height": H, "width": W}
            )
            img_anns = []
            for cid, x1, y1, x2, y2 in placed:
                img_anns.append(
                    {
                        "id": aid,
                        "image_id": img_id,
                        "category_id": cid,
                        "bbox": [float(x1), float(y1),
                                 float(x2 - x1), float(y2 - y1)],
                        "area": float((x2 - x1) * (y2 - y1)),
                        "iscrowd": 0,
                    }
                )
                aid += 1
            annotations.extend(img_anns)
            if train:
                for cid in {a["category_id"] for a in img_anns}:
                    by_class[cid].append(
                        (images[-1], [a for a in img_anns
                                      if a["category_id"] == cid])
                    )
        return images, annotations

    tr_imgs, tr_anns = render_split(
        os.path.join(args.root, "coco", "trainval2014"),
        range(1, args.train + 1), train=True,
    )
    va_imgs, va_anns = render_split(
        os.path.join(args.root, "coco", "val2014"),
        range(100001, 100001 + args.val), train=False,
    )

    ds = os.path.join(args.root, "cocosplit", "datasplit")
    os.makedirs(ds, exist_ok=True)
    with open(os.path.join(ds, "trainvalno5k.json"), "w") as f:
        json.dump({"images": tr_imgs, "categories": cats,
                   "annotations": tr_anns}, f)
    with open(os.path.join(ds, "5k.json"), "w") as f:
        json.dump({"images": va_imgs, "categories": cats,
                   "annotations": va_anns}, f)

    short = {
        i: len(v) for i, v in by_class.items() if len(v) < max(args.shots)
    }
    if short:
        raise SystemExit(f"classes with too few train images: {short}")

    for seed in args.seed:
        sd = os.path.join(args.root, "cocosplit", f"seed{seed}")
        os.makedirs(sd, exist_ok=True)
        srng = np.random.RandomState(1000 + seed)
        for shot in args.shots:
            for cat in cats:
                cid, name = cat["id"], cat["name"]
                if cid in by_class:
                    pool = by_class[cid]
                    idx = srng.permutation(len(pool))[:shot]
                    imgs = [pool[j][0] for j in idx]
                    annos = [a for j in idx for a in pool[j][1]]
                else:  # inactive class: empty (documented accommodation)
                    imgs, annos = [], []
                fn = os.path.join(
                    sd, f"full_box_{shot}shot_{name}_trainval.json"
                )
                with open(fn, "w") as f:
                    json.dump({"images": imgs, "categories": cats,
                               "annotations": annos}, f)

    print(
        f"generalization COCO: {args.train} train, {args.val} HELD-OUT "
        f"val, {len(active_ids)} active classes "
        f"({len(base)} base + {len(novel)} novel), shots={args.shots} "
        f"under {args.root}"
    )


if __name__ == "__main__":
    main()
