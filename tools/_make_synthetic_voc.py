"""Generate a synthetic VOC dataset + k-shot split files for workflow
smokes (used by tools/smoke_workflow.sh)."""

from __future__ import annotations

import argparse
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="datasets")
    p.add_argument("--images", type=int, default=12)
    p.add_argument("--shots", type=int, nargs="+", default=[1])
    p.add_argument("--seed", type=int, nargs="+", default=[0])
    args = p.parse_args()

    classes = PASCAL_VOC_ALL_CATEGORIES[1]
    rng = np.random.RandomState(0)
    ids = []
    for year in ("2007", "2012"):
        d = os.path.join(args.root, f"VOC{year}")
        for sub in ("Annotations", "JPEGImages", "ImageSets/Main"):
            os.makedirs(os.path.join(d, sub), exist_ok=True)
        year_ids = []
        for i in range(args.images):
            fid = f"{i:06d}"
            year_ids.append(fid)
            w, h = 300 + 10 * i, 220 + 6 * i
            # 3 deterministic objects per image, classes rotate
            objs = ""
            for k in range(3):
                cls = classes[(i * 3 + k) % len(classes)]
                x1 = 10 + 40 * k
                y1 = 15 + 30 * k
                objs += OBJ.format(
                    name=cls, x1=x1, y1=y1, x2=x1 + 90, y2=y1 + 80
                )
            with open(os.path.join(d, "Annotations", fid + ".xml"), "w") as f:
                f.write(XML.format(w=w, h=h, objs=objs))
            img = Image.fromarray(
                rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
            )
            img.save(os.path.join(d, "JPEGImages", fid + ".jpg"))
        for split in ("trainval", "test"):
            with open(
                os.path.join(d, "ImageSets", "Main", split + ".txt"), "w"
            ) as f:
                f.write("\n".join(year_ids))
        if year == "2007":
            ids = year_ids

    # class -> image ids containing it (2007 only, like the split files)
    by_class = {c: [] for c in classes}
    for i, fid in enumerate(ids):
        for k in range(3):
            by_class[classes[(i * 3 + k) % len(classes)]].append(fid)

    for seed in args.seed:
        sd = os.path.join(args.root, "vocsplit", f"seed{seed}")
        os.makedirs(sd, exist_ok=True)
        for shot in args.shots:
            for cls in classes:
                fn = os.path.join(sd, f"box_{shot}shot_{cls}_train.txt")
                with open(fn, "w") as f:
                    for fid in by_class[cls][: max(shot, 1)]:
                        f.write(f"VOC2007/JPEGImages/{fid}.jpg\n")
    print(f"synthetic VOC + {args.shots}-shot splits under {args.root}")


if __name__ == "__main__":
    main()
