#!/usr/bin/env python
"""Preflight gate for a REAL-data COCO few-shot run.

COCO analog of tools/preflight_real_voc.py (same contract: exit 0 = ready,
exit 1 = per-item report printed, nothing started). Checks:
  1. coco/trainval2014 + coco/val2014 image trees with real image counts
     (real trainval2014 has ~123k images; a handful means smoke data).
  2. cocosplit/datasplit/{trainvalno5k,5k}.json — the base-train and test
     annotation jsons the registry reads (data/builtin.py:22-32; reference
     defrcn/data/builtin.py:10-30). Size-gated, not parsed: the real
     trainvalno5k.json is ~450 MB and a full json.load belongs to the run,
     not the gate.
  3. cocosplit/seed{S}/full_box_{K}shot_{cls}_trainval.json for every one
     of the 80 classes (meta_coco.py:38-41; filenames contain the raw
     class names, spaces included, e.g. "full_box_10shot_traffic
     light_trainval.json").
  4. weights/R-101.pkl + the PCB torchvision checkpoint — identical
     full-coverage gates as the VOC preflight (imported from it).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from preflight_real_voc import BAD, MISSING, OK, check_pcb_pth, check_r101_pkl  # noqa: E402,F401


def coco_class_names():
    from fewshotobjectdetection_imporove_via_text_feature_tpu.data.builtin_meta import (
        COCO_THING_CATEGORIES,
    )

    return [n for _, n in COCO_THING_CATEGORIES]


def check_image_tree(root, subdir, min_images):
    d = os.path.join(root, "coco", subdir)
    if not os.path.isdir(d):
        return [f"{d} missing"]
    n = len(os.listdir(d))
    if n < min_images:
        return [
            f"{d} has {n} images; real COCO {subdir} has >{min_images} — "
            "this looks like synthetic smoke data"
        ]
    return []


def check_datasplit(root):
    """trainvalno5k.json / 5k.json presence + sanity size (see module
    docstring for why they are not parsed here)."""
    problems = []
    for name, min_mb in (("trainvalno5k.json", 50), ("5k.json", 2)):
        f = os.path.join(root, "cocosplit", "datasplit", name)
        if not os.path.isfile(f):
            problems.append(f"{f} missing")
            continue
        mb = os.path.getsize(f) / 1e6
        if mb < min_mb:
            problems.append(
                f"{f} is {mb:.1f} MB; the real file is >{min_mb} MB — "
                "truncated or synthetic"
            )
    return problems


def check_cocosplit(root, shot, seeds):
    problems = []
    classes = coco_class_names()
    for seed in seeds:
        sd = os.path.join(root, "cocosplit", f"seed{seed}")
        missing = [
            c for c in classes
            if not os.path.isfile(
                os.path.join(sd, f"full_box_{shot}shot_{c}_trainval.json")
            )
        ]
        if missing:
            problems.append(
                f"{sd}: full_box_{shot}shot_*_trainval.json missing for "
                f"{len(missing)}/80 classes (e.g. {missing[:3]})"
            )
    return problems


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="datasets")
    ap.add_argument("--shot", type=int, default=10)
    ap.add_argument("--seeds", type=int, nargs="+", default=[0])
    ap.add_argument("--r101", default="weights/R-101.pkl")
    ap.add_argument("--pcb", default="weights/resnet101-torchvision.pth")
    args = ap.parse_args()

    checks = [
        ("coco/trainval2014 tree", check_image_tree(args.root, "trainval2014", 100000)),
        ("coco/val2014 tree", check_image_tree(args.root, "val2014", 30000)),
        ("cocosplit/datasplit jsons", check_datasplit(args.root)),
        (
            f"cocosplit {args.shot}-shot seeds {args.seeds}",
            check_cocosplit(args.root, args.shot, args.seeds),
        ),
        ("R-101.pkl import coverage", check_r101_pkl(args.r101)),
        ("PCB torchvision weights", check_pcb_pth(args.pcb)),
    ]
    failed = False
    for name, problems in checks:
        print(f"[{MISSING if problems else OK}] {name}")
        for p in problems:
            print(f"      - {p}")
        failed |= bool(problems)
    if failed:
        print(
            "\nPreflight FAILED — supply the items above, then rerun "
            "tools/run_real_coco.sh. Nothing was started."
        )
        return 1
    print("\nPreflight OK — data and weights verified.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
