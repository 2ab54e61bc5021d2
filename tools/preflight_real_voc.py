#!/usr/bin/env python
"""Preflight gate for a REAL-data VOC few-shot run.

Checks, with a clear per-item report (VERDICT r1 #6):
  1. VOC2007 + VOC2012 trees (Annotations / JPEGImages / ImageSets) with
     real image counts, plus the vocsplit k-shot files for the requested
     (split, shot, seeds).
  2. weights/R-101.pkl — the Caffe2 ImageNet init (reference run_voc.sh:5):
     loads it and asserts EVERY non-momentum blob translates into our
     parameter tree naming with R-101-shaped tensors (no silent drops).
  3. weights/resnet101-torchvision.pth — the PCB model
     (reference calibration_layer.py:38-39): asserts the full 522-key
     torchvision manifest is present and shape-correct.

Exit 0 = ready to run; exit 1 = report printed, nothing started.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OK = "\033[32mOK\033[0m"
MISSING = "\033[31mMISSING\033[0m"
BAD = "\033[31mBAD\033[0m"

VOC_CLASSES = [
    "aeroplane", "bicycle", "bird", "boat", "bottle", "bus", "car", "cat",
    "chair", "cow", "diningtable", "dog", "horse", "motorbike", "person",
    "pottedplant", "sheep", "sofa", "train", "tvmonitor",
]


def check_voc_tree(root, year, min_images):
    d = os.path.join(root, f"VOC{year}")
    problems = []
    for sub in ("Annotations", "JPEGImages", "ImageSets/Main"):
        if not os.path.isdir(os.path.join(d, sub)):
            problems.append(f"{d}/{sub} missing")
    if not problems:
        n = len(os.listdir(os.path.join(d, "JPEGImages")))
        if n < min_images:
            problems.append(
                f"{d}/JPEGImages has {n} images; real VOC{year} has "
                f">{min_images} — this looks like synthetic smoke data"
            )
        for split in ("trainval",) + (("test",) if year == 2007 else ()):
            f = os.path.join(d, "ImageSets", "Main", f"{split}.txt")
            if not os.path.isfile(f):
                problems.append(f"{f} missing")
    return problems


def check_vocsplit(root, shot, seeds):
    problems = []
    for seed in seeds:
        # seed files ALWAYS live under seed{N}/ (even seed 0) — that is
        # the only layout the loader reads (meta_voc.py:63, matching
        # reference meta_voc.py:27); accepting a flat layout here would
        # pass the gate and crash the k-shot stage hours later.
        sd = os.path.join(root, "vocsplit", f"seed{seed}")
        missing = [
            c for c in VOC_CLASSES
            if not os.path.isfile(
                os.path.join(sd, f"box_{shot}shot_{c}_train.txt")
            )
        ]
        if missing:
            problems.append(
                f"{sd}: box_{shot}shot_*_train.txt missing for "
                f"{len(missing)} classes (e.g. {missing[:3]})"
            )
    return problems


def check_r101_pkl(path):
    """Full blob-coverage gate: every blob must map into our tree."""
    if not os.path.isfile(path):
        return [f"{path} missing (detectron2 zoo: ImageNetPretrained/MSRA/R-101.pkl)"]
    from fewshotobjectdetection_imporove_via_text_feature_tpu.checkpoint.torch_import import (
        _c2_to_ours,
        load_c2_pkl,
    )

    try:
        blobs = load_c2_pkl(path)
    except Exception as e:
        return [f"{path}: unreadable ({e})"]
    problems = []
    if "conv1_w" not in blobs:
        problems.append(f"{path}: no conv1_w blob — not a Caffe2 backbone file")
        return problems
    if tuple(blobs["conv1_w"].shape) != (64, 3, 7, 7):
        problems.append(
            f"{path}: conv1_w shape {blobs['conv1_w'].shape} != (64,3,7,7)"
        )
    unmapped = []
    for name in blobs:
        if name in ("fc1000_w", "fc1000_b", "pred_w", "pred_b"):
            continue  # classifier head: unused by detection, dropped by d2 too
        p, _ = _c2_to_ours(name)
        if p is None:
            unmapped.append(name)
    if unmapped:
        problems.append(
            f"{path}: {len(unmapped)} blobs do not translate "
            f"(e.g. {unmapped[:4]}) — import would silently drop weights"
        )
    # depth gate: R-101 has res4 blocks 0..22
    if "res4_22_branch2c_w" not in blobs:
        problems.append(f"{path}: res4_22 missing — not a ResNet-101 file")
    return problems


def check_pcb_pth(path):
    if not os.path.isfile(path):
        return [
            f"{path} missing (torchvision resnet101; the reference uses "
            "resnet101-5d3b4d8f.pth)"
        ]
    problems = []
    try:
        import torch

        state = torch.load(path, map_location="cpu", weights_only=False)
        if "model" in state and not hasattr(state["model"], "numpy"):
            state = state["model"]
    except Exception as e:
        return [f"{path}: unreadable ({e})"]
    from fewshotobjectdetection_imporove_via_text_feature_tpu.evaluation.archs import (
        torchvision_r101_manifest,
    )

    missing = [k for k in torchvision_r101_manifest() if k not in state]
    if missing:
        problems.append(
            f"{path}: {len(missing)}/522 manifest keys missing "
            f"(e.g. {missing[:3]})"
        )
    if "conv1.weight" in state and tuple(state["conv1.weight"].shape) != (
        64, 3, 7, 7,
    ):
        problems.append(f"{path}: conv1.weight shape wrong")
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
        ("VOC2007 tree", check_voc_tree(args.root, 2007, 5000)),
        ("VOC2012 tree", check_voc_tree(args.root, 2012, 10000)),
        (
            f"vocsplit {args.shot}-shot seeds {args.seeds}",
            check_vocsplit(args.root, args.shot, args.seeds),
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
            "tools/run_real_voc.sh. Nothing was started."
        )
        return 1
    print("\nPreflight OK — data and weights verified.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
