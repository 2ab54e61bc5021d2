"""Golden validation of voc_eval_class against the REFERENCE'S OWN
voc_eval implementation, executed as the oracle.

The reference module imports detectron2 (absent here), but its
parse_rec/voc_ap/voc_eval block is pure numpy + ElementTree — we exec
exactly that source segment from /root/reference (read at test time, never
vendored) and drive it through real VOC-format files (XML annotations,
imageset txt, per-class det txt) built from fuzzed scenarios, then assert
our in-memory evaluator produces identical recall/precision/AP.

Covers: +1 IoU conventions, difficult-GT skip (matched-or-not), double
-detection FP, per-image matching state, both AP conventions (area + VOC07
11-point), IoU thresholds 0.5/0.75. Scores are kept distinct because the
reference's argsort(-confidence) is non-stable (tie order is
implementation-defined there).
"""

import os
import re

import numpy as np
import pytest

from fewshotobjectdetection_imporove_via_text_feature_tpu.evaluation.voc_eval import (
    voc_eval_class,
)

REF_FILE = "/root/reference/defrcn/evaluation/pascal_voc_evaluation.py"

needs_ref = pytest.mark.skipif(
    not os.path.exists(REF_FILE), reason="reference source not available"
)


def _load_reference_voc_eval():
    """Exec the reference's parse_rec/voc_ap/voc_eval segment (pure numpy)
    in an isolated namespace and return its voc_eval."""
    src = open(REF_FILE).read()
    start = src.index("@lru_cache(maxsize=None)")
    segment = src[start:]
    # keep up to the end of voc_eval (it is the last top-level def)
    assert "def voc_eval(" in segment
    from functools import lru_cache
    from xml.etree import ElementTree as ET

    ns = {"np": np, "ET": ET, "lru_cache": lru_cache}
    exec(compile(segment, REF_FILE, "exec"), ns)
    return ns["voc_eval"], ns["parse_rec"]


def _write_scenario(tmp, rng, n_images=6, cls="cat"):
    """Fuzzed per-class scenario written as VOC files AND returned as our
    evaluator's in-memory structures."""
    ann_dir = tmp / "Annotations"
    ann_dir.mkdir(exist_ok=True)
    image_ids = [f"im{i:03d}" for i in range(n_images)]
    gt_per_image = {}
    for img in image_ids:
        n = rng.randint(0, 5)
        boxes = []
        difficult = []
        objs = []
        for _ in range(n):
            x1, y1 = rng.randint(1, 300, 2)
            w, h = rng.randint(8, 120, 2)
            d = int(rng.rand() < 0.3)
            boxes.append([x1, y1, x1 + w, y1 + h])
            difficult.append(bool(d))
            objs.append(
                f"<object><name>{cls}</name><pose>x</pose>"
                f"<truncated>0</truncated><difficult>{d}</difficult>"
                f"<bndbox><xmin>{x1}</xmin><ymin>{y1}</ymin>"
                f"<xmax>{x1 + w}</xmax><ymax>{y1 + h}</ymax></bndbox>"
                "</object>"
            )
        (ann_dir / f"{img}.xml").write_text(
            "<annotation>" + "".join(objs) + "</annotation>"
        )
        gt_per_image[img] = {
            "bbox": np.array(boxes, float).reshape(-1, 4),
            "difficult": np.array(difficult, bool),
        }

    (tmp / "imageset.txt").write_text("\n".join(image_ids) + "\n")

    dets = []
    lines = []
    for img in image_ids:
        for _ in range(rng.randint(0, 8)):
            gt = gt_per_image[img]["bbox"]
            if len(gt) and rng.rand() < 0.7:
                base = gt[rng.randint(len(gt))]
                bb = base + rng.uniform(-15, 15, 4)
            else:
                x1, y1 = rng.uniform(1, 300, 2)
                bb = np.array(
                    [x1, y1, x1 + rng.uniform(8, 120), y1 + rng.uniform(8, 120)]
                )
            bb[2] = max(bb[2], bb[0] + 1)
            bb[3] = max(bb[3], bb[1] + 1)
            score = float(rng.rand())  # continuous -> distinct w.p. 1
            dets.append((img, score, *[float(v) for v in bb]))
            lines.append(
                f"{img} {score:.6f} {bb[0]:.1f} {bb[1]:.1f} {bb[2]:.1f} {bb[3]:.1f}"
            )
    (tmp / f"det_{cls}.txt").write_text("\n".join(lines) + "\n")
    return gt_per_image, dets


@needs_ref
def test_voc_eval_matches_reference_implementation(tmp_path):
    ref_voc_eval, ref_parse_rec = _load_reference_voc_eval()
    rng = np.random.RandomState(0)
    compared = 0
    for seed in range(5):
        tmp = tmp_path / f"s{seed}"
        tmp.mkdir()
        gt, dets = _write_scenario(tmp, rng)
        if not any(len(r["bbox"]) and not r["difficult"].all()
                   for r in gt.values()):
            continue  # npos=0: documented deviation, covered below
        compared += 1
        for ovthresh in (0.5, 0.75):
            for use_07 in (False, True):
                ref_parse_rec.cache_clear()
                rec_r, prec_r, ap_r = ref_voc_eval(
                    str(tmp / "det_{}.txt"),
                    str(tmp / "Annotations" / "{}.xml"),
                    str(tmp / "imageset.txt"),
                    "cat",
                    ovthresh=ovthresh,
                    use_07_metric=use_07,
                )
                rec_o, prec_o, ap_o = voc_eval_class(
                    list(dets), gt, ovthresh=ovthresh, use_07_metric=use_07
                )
                np.testing.assert_allclose(rec_o, rec_r, rtol=0, atol=1e-12)
                np.testing.assert_allclose(prec_o, prec_r, rtol=0, atol=1e-12)
                np.testing.assert_allclose(ap_o, ap_r, rtol=0, atol=1e-12)
    # the fuzz must actually have compared something — an rng/fixture
    # drift that skips every scenario would otherwise pass vacuously
    assert compared >= 3, compared


@needs_ref
def test_voc_eval_npos_zero_documented_deviation(tmp_path):
    """All-difficult GT: the reference divides by npos=0 (nan/inf
    propagation); we clamp to 0 (PARITY.md known deviation #7). Pin OUR
    behavior so the deviation stays intentional."""
    gt = {
        "im0": {
            "bbox": np.array([[10.0, 10, 50, 50]]),
            "difficult": np.array([True]),
        }
    }
    dets = [("im0", 0.9, 10.0, 10.0, 50.0, 50.0)]
    rec, prec, ap = voc_eval_class(dets, gt, 0.5, False)
    # the deviation is CLAMP-TO-ZERO, not merely finite: zero positives
    # can never yield credit
    assert ap == 0.0
    assert np.all(np.asarray(rec) == 0.0)
