"""Train the PCB's torchvision-structured ResNet-101 on GT crops of a
synthetic-class VOC tree, and export torchvision-named .pth weights for
TEST.PCB_MODELPATH (VERDICT r4 task 3).

Purpose: the held-out generalization gates previously ran PCB OFF
everywhere — with no ImageNet file in this container, a random extractor
rescores with noise. This tool produces a LEARNED, class-separable
extractor *obtainable in-container*: the same flax TorchvisionResNet the
PCB runs (evaluation/archs.py; depth 101, stride-on-3x3), trained as a
classifier on GT-box crops, then written out through the inverse of the
tv_translate import mapping so the PCB loads it through the exact
torchvision .pth path the reference uses
(calibration_layer.py:38-39 torch.load -> our pcb._load_params).

  python tools/train_pcb_extractor.py --data-root DATASETS --out w.pth \
      [--iters 200] [--size 64] [--batch 16] [--acc-floor 0.7]

Fails loudly if final train accuracy < --acc-floor: a non-separable
extractor would make the PCB-on gate leg meaningless.
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
import xml.etree.ElementTree as ET

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def collect_crops(data_root, size, limit_per_class=40):
    """(N, size, size, 3) uint8 crops + (N,) labels from the VOC trees'
    GT boxes (both years' trainval — the gate's TRAIN pool only; the
    held-out VOC2007/test split is never touched)."""
    from fewshotobjectdetection_imporove_via_text_feature_tpu.data.builtin_meta import (
        PASCAL_VOC_ALL_CATEGORIES,
    )

    classes = list(PASCAL_VOC_ALL_CATEGORIES[1])
    cls_idx = {c: i for i, c in enumerate(classes)}
    per_class = {c: 0 for c in classes}
    xs, ys = [], []
    for year in ("VOC2007", "VOC2012"):
        split_f = os.path.join(
            data_root, year, "ImageSets", "Main", "trainval.txt"
        )
        if not os.path.exists(split_f):
            continue
        train_ids = {l.strip() for l in open(split_f) if l.strip()}
        for xml in sorted(
            glob.glob(os.path.join(data_root, year, "Annotations", "*.xml"))
        ):
            fid = os.path.splitext(os.path.basename(xml))[0]
            if fid not in train_ids:
                continue
            root = ET.parse(xml).getroot()
            img = None
            for obj in root.findall("object"):
                name = obj.find("name").text
                if name not in cls_idx or per_class[name] >= limit_per_class:
                    continue
                bb = obj.find("bndbox")
                x1, y1, x2, y2 = (
                    int(float(bb.find(k).text))
                    for k in ("xmin", "ymin", "xmax", "ymax")
                )
                if img is None:
                    img = Image.open(
                        os.path.join(data_root, year, "JPEGImages", fid + ".jpg")
                    ).convert("RGB")
                crop = img.crop((x1 - 1, y1 - 1, x2, y2)).resize(
                    (size, size), Image.BILINEAR
                )
                xs.append(np.asarray(crop, np.uint8))
                ys.append(cls_idx[name])
                per_class[name] += 1
    return np.stack(xs), np.array(ys, np.int32), classes


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data-root", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--iters", type=int, default=200)
    p.add_argument("--size", type=int, default=64)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--acc-floor", type=float, default=0.7)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    plat = os.environ.get("FSODTF_PLATFORM")
    import jax

    if plat:
        jax.config.update("jax_platforms", plat)
    jax.config.update("jax_compilation_cache_dir", "/tmp/fsodtf_jax_cache")
    import jax.numpy as jnp
    import optax
    import torch
    from flax import traverse_util

    from fewshotobjectdetection_imporove_via_text_feature_tpu.evaluation.archs import (
        TorchvisionResNet,
        torchvision_r101_manifest,
        tv_translate,
    )

    xs, ys, classes = collect_crops(args.data_root, args.size)
    print(f"{len(xs)} crops over {len(set(ys.tolist()))} classes")

    # the PCB's eval-time normalization (pcb.py _MEAN/_STD) — train in the
    # same input distribution the extractor will see
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    xf = (xs.astype(np.float32) / 255.0 - mean) / std

    model = TorchvisionResNet(depth=101)
    rng = np.random.RandomState(args.seed)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(args.seed), jnp.zeros((1, args.size, args.size, 3))
    )["params"]

    tx = optax.adam(args.lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, xb, yb):
        def loss_fn(p):
            logits, _ = model.apply({"params": p}, xb)
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits, yb
            ).mean()
            acc = jnp.mean(jnp.argmax(logits, -1) == yb)
            return ce, acc

        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, acc

    accs = []
    for it in range(args.iters):
        idx = rng.choice(len(xf), size=args.batch, replace=False)
        params, opt_state, loss, acc = step(
            params, opt_state, jnp.asarray(xf[idx]), jnp.asarray(ys[idx])
        )
        accs.append(float(acc))
        if it % 20 == 0 or it == args.iters - 1:
            print(f"iter {it}: loss {float(loss):.4f} acc {float(acc):.3f}")

    final_acc = float(np.mean(accs[-10:]))
    print(f"final train accuracy (last 10 iters): {final_acc:.3f}")
    if final_acc < args.acc_floor:
        raise SystemExit(
            f"extractor did not learn: acc {final_acc:.3f} < "
            f"{args.acc_floor} — a non-separable extractor makes the "
            f"PCB-on gate leg meaningless"
        )

    # export: inverse of the tv_translate import mapping (torch_import.
    # _convert): HWIO -> OIHW convs, (in, out) -> (out, in) linears
    flat = traverse_util.flatten_dict(jax.device_get(params))
    state = {}
    for name in torchvision_r101_manifest():
        path, kind = tv_translate(name)
        v = np.asarray(flat[path])
        if kind == "conv":
            v = v.transpose(3, 2, 0, 1)
        elif kind == "linear":
            v = v.T
        state[name] = torch.from_numpy(np.ascontiguousarray(v).copy())
    torch.save(state, args.out)
    print(f"wrote {len(state)} tensors -> {args.out}")


if __name__ == "__main__":
    main()
