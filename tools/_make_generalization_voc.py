"""Generate a LEARNABLE synthetic VOC dataset with DISJOINT train/val
splits for the held-out generalization gate (tools/check_generalization.py).

Unlike tools/_make_synthetic_voc.py (deterministic boxes on noise, used
by the workflow smokes) and overfit_map_check's 6-image set (evaluated on
its own train images), this generator produces enough images, with
shared class/box statistics across splits, that a model must actually
LEARN the class-color mapping and generalize to unseen images:

  * 20 VOC classes <-> 20 distinct solid colors (hue wheel with
    alternating brightness so neighbors stay separable),
  * uniform-noise background (objectness is learnable, not free),
  * 1-3 objects per image at random positions/sizes, low mutual overlap,
  * VOC2007 trainval + VOC2012 trainval = train pool; VOC2007 test =
    HELD-OUT val images (disjoint ids, same distribution),
  * vocsplit/seed{S}/box_{K}shot_{cls}_train.txt files drawn from TRAIN
    images only, in the reference's format.

Reference protocol being gated: run_voc.sh:25-44 (base train on
*_trainval_base1, fine-tune gfsod, evaluate on voc_2007_test_all1),
defrcn/evaluation/pascal_voc_evaluation.py:131-148.
"""

from __future__ import annotations

import argparse
import colorsys
import os
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from fewshotobjectdetection_imporove_via_text_feature_tpu.data.builtin_meta import (  # noqa: E402
    PASCAL_VOC_ALL_CATEGORIES,
)

XML = """<annotation>
  <size><width>{w}</width><height>{h}</height><depth>3</depth></size>
  {objs}
</annotation>"""
OBJ = """<object>
    <name>{name}</name><difficult>0</difficult>
    <bndbox><xmin>{x1}</xmin><ymin>{y1}</ymin><xmax>{x2}</xmax><ymax>{y2}</ymax></bndbox>
  </object>"""

W, H = 320, 240


def class_colors(classes):
    """20 separable colors: hue wheel, alternating value so adjacent
    hues differ in brightness too."""
    colors = {}
    for i, c in enumerate(classes):
        r, g, b = colorsys.hsv_to_rgb(
            i / len(classes), 0.95, 0.95 if i % 2 == 0 else 0.55
        )
        colors[c] = (int(r * 255), int(g * 255), int(b * 255))
    return colors


def _background(rng):
    """Mid-gray + mild noise. Full-range noise was tried first and makes
    the task too hard for the CI-scale tiny model (AP50 ~12 after 1200
    iters: RPN objectness drowns); the gate's discrimination comes from
    the DISJOINT held-out split, not from background difficulty."""
    return np.clip(
        128 + rng.randint(-12, 13, (H, W, 3)), 0, 255
    ).astype(np.uint8)


def _place_objects(rng, classes, colors, n_obj):
    """Random non-overlapping colored rectangles; returns
    (image uint8, [(name, x1, y1, x2, y2)])."""
    img = _background(rng)
    placed = []
    for _ in range(n_obj):
        for _try in range(8):
            bw = int(rng.randint(50, 110))
            bh = int(rng.randint(50, 110))
            x1 = int(rng.randint(0, W - bw))
            y1 = int(rng.randint(0, H - bh))
            box = (x1, y1, x1 + bw, y1 + bh)
            ok = True
            for _, px1, py1, px2, py2 in placed:
                ix = max(0, min(box[2], px2) - max(box[0], px1))
                iy = max(0, min(box[3], py2) - max(box[1], py1))
                if ix * iy > 0.1 * bw * bh:
                    ok = False
                    break
            if ok:
                break
        else:
            continue
        name = classes[int(rng.randint(len(classes)))]
        r, g, b = colors[name]
        # solid color + light noise so the class signal is the MEAN color
        patch = np.stack(
            [
                np.full((bh, bw), r, np.int16),
                np.full((bh, bw), g, np.int16),
                np.full((bh, bw), b, np.int16),
            ],
            axis=-1,
        )
        patch = patch + rng.randint(-18, 19, patch.shape)
        img[y1 : y1 + bh, x1 : x1 + bw] = np.clip(patch, 0, 255).astype(
            np.uint8
        )
        placed.append((name, *box))
    return img, placed


def _write_image(d, fid, img, placed):
    objs = "".join(
        OBJ.format(name=n, x1=x1 + 1, y1=y1 + 1, x2=x2, y2=y2)
        for n, x1, y1, x2, y2 in placed
    )
    with open(os.path.join(d, "Annotations", fid + ".xml"), "w") as f:
        f.write(XML.format(w=W, h=H, objs=objs))
    # PNG would be exact; JPEG matches the real pipeline (and the class
    # signal survives compression easily at these block sizes)
    Image.fromarray(img).save(
        os.path.join(d, "JPEGImages", fid + ".jpg"), quality=92
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", required=True)
    p.add_argument("--train-2007", type=int, default=120)
    p.add_argument("--train-2012", type=int, default=60)
    p.add_argument("--val", type=int, default=60)
    p.add_argument("--shots", type=int, nargs="+", default=[10])
    p.add_argument("--seed", type=int, nargs="+", default=[0])
    p.add_argument("--rng-seed", type=int, default=20260820)
    args = p.parse_args()

    classes = list(PASCAL_VOC_ALL_CATEGORIES[1])
    colors = class_colors(classes)
    rng = np.random.RandomState(args.rng_seed)

    # class -> [(year, fid)] over TRAIN images (for the k-shot files)
    by_class = {c: [] for c in classes}

    counts = {
        ("2007", "trainval"): args.train_2007,
        ("2012", "trainval"): args.train_2012,
        ("2007", "test"): args.val,
    }
    fid_counter = 0
    train_idx = 0  # global across years: the round-robin must cover all
    # classes even when per-year counts are small (soak uses 16+8)
    for (year, split), n in counts.items():
        d = os.path.join(args.root, f"VOC{year}")
        for sub in ("Annotations", "JPEGImages", "ImageSets/Main"):
            os.makedirs(os.path.join(d, sub), exist_ok=True)
        ids = []
        for i in range(n):
            # real VOC2012 ids contain an underscore ("2008_000123") and
            # the k-shot loader infers the year from that pattern
            # (meta_voc.py:79, reference convention) — mimic it
            fid = (
                f"{fid_counter:06d}" if year == "2007"
                else f"2012_{fid_counter:06d}"
            )
            fid_counter += 1
            ids.append(fid)
            # first pass through the classes is round-robin so every
            # class has enough train instances for a 10-shot file
            if split == "trainval" and train_idx < len(classes) * 2:
                forced = classes[train_idx % len(classes)]
                img, placed = _place_objects(
                    rng, [forced], colors, n_obj=1
                )
                extra_n = int(rng.randint(0, 3))
                if extra_n:
                    img2, placed2 = _place_objects(
                        rng, classes, colors, n_obj=extra_n
                    )
                    # re-render everything on one canvas
                    img, placed = _render_all(rng, placed + placed2, colors)
            else:
                img, placed = _place_objects(
                    rng, classes, colors, n_obj=int(rng.randint(1, 4))
                )
            if not placed:  # extremely unlikely; keep ids/files aligned
                img, placed = _place_objects(rng, classes, colors, 1)
            _write_image(d, fid, img, placed)
            if split == "trainval":
                train_idx += 1
                seen = set()
                for name, *_ in placed:
                    if name not in seen:
                        by_class[name].append((year, fid))
                        seen.add(name)
        with open(
            os.path.join(d, "ImageSets", "Main", split + ".txt"), "w"
        ) as f:
            f.write("\n".join(ids) + "\n")

    short = {c: len(v) for c, v in by_class.items() if len(v) < max(args.shots)}
    if short:
        raise SystemExit(f"classes with too few train images: {short}")

    for seed in args.seed:
        sd = os.path.join(args.root, "vocsplit", f"seed{seed}")
        os.makedirs(sd, exist_ok=True)
        srng = np.random.RandomState(1000 + seed)
        for shot in args.shots:
            for cls in classes:
                pool = list(by_class[cls])
                idx = srng.permutation(len(pool))[:shot]
                fn = os.path.join(sd, f"box_{shot}shot_{cls}_train.txt")
                with open(fn, "w") as f:
                    for j in idx:
                        year, fid = pool[j]
                        f.write(f"VOC{year}/JPEGImages/{fid}.jpg\n")
    print(
        f"generalization VOC: {args.train_2007}+{args.train_2012} train, "
        f"{args.val} HELD-OUT val, shots={args.shots} under {args.root}"
    )


def _render_all(rng, placed, colors):
    """Re-render a merged object list on a fresh canvas, dropping
    overlaps beyond 10%."""
    img = _background(rng)
    kept = []
    for name, x1, y1, x2, y2 in placed:
        ok = True
        for _, px1, py1, px2, py2 in kept:
            ix = max(0, min(x2, px2) - max(x1, px1))
            iy = max(0, min(y2, py2) - max(y1, py1))
            if ix * iy > 0.1 * (x2 - x1) * (y2 - y1):
                ok = False
                break
        if not ok:
            continue
        r, g, b = colors[name]
        bh, bw = y2 - y1, x2 - x1
        patch = np.stack(
            [
                np.full((bh, bw), r, np.int16),
                np.full((bh, bw), g, np.int16),
                np.full((bh, bw), b, np.int16),
            ],
            axis=-1,
        ) + rng.randint(-18, 19, (bh, bw, 3))
        img[y1:y2, x1:x2] = np.clip(patch, 0, 255).astype(np.uint8)
        kept.append((name, x1, y1, x2, y2))
    return img, kept


if __name__ == "__main__":
    main()
