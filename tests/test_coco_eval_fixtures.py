"""Hand-computed COCO-eval micro-fixtures (VERDICT r2 task 4).

`tests/test_coco_eval_golden.py` fuzzes `evaluate_coco_detections` against
a transcription of the pycocotools algorithm — but both sides share one
reading of cocoeval.py, so a shared misreading would pass. These fixtures
break that circularity: every precision/recall array and 101-point AP
below is derived ON PAPER (the derivation is in the comments) and
asserted to full float precision, independent of any transcription.

Covered semantics (ref defrcn/evaluation/coco_evaluation.py:132-165 via
pycocotools cocoeval.py):
  * crowd-GT ignore: a det matching a crowd GT is excluded from BOTH TP
    and FP; crowd GTs never count toward npos.
  * area-range boundaries: ignore iff area < lo or area > hi — an
    annotation whose 'area' field sits exactly on a boundary counts in
    BOTH adjacent ranges; the GT decision uses the annotation 'area'
    field, not the bbox area.
  * score ties: stable (mergesort) ordering — original det order within
    an image, image order across images.
  * maxDets: per-image truncation to exactly the top-100 by score.

All IoUs in these fixtures are exactly 1.0 or far below 0.5, so every
IoU threshold in 0.50:0.05:0.95 produces the same PR curve and
AP == AP50 == AP75.
"""

import numpy as np

from fewshotobjectdetection_imporove_via_text_feature_tpu.evaluation.coco_eval import (
    evaluate_coco_detections,
)


def _dets(rows):
    """rows: list of (box, score) -> (boxes, scores, classes=0)."""
    boxes = np.array([r[0] for r in rows], float).reshape(-1, 4)
    scores = np.array([r[1] for r in rows], float)
    classes = np.zeros(len(rows), int)
    return boxes, scores, classes


def test_crowd_ignore_hand_derived():
    """GTs: A=[0,0,10,10], B=[20,20,30,30] (normal), C=[50,50,70,70]
    (crowd). Dets by score: d3=[100,100,110,110]@.95 (FP),
    d1=A@.9 (TP), d2=C@.8 (crowd match -> ignored), d4=B@.6 (TP).

    npos = 2 (crowd excluded). Kept sequence (crowd-matched det dropped):
    [FP, TP, TP] -> cumTP=[0,1,2], cumFP=[1,1,1],
    recall=[0, 1/2, 1], precision=[0, 1/2, 2/3].
    Right-to-left envelope: [2/3, 2/3, 2/3]. Every one of the 101 recall
    thresholds lands on 2/3 => AP = 200/3 %.

    Discrimination: counting the crowd det as FP gives AP = 50;
    counting the crowd GT in npos changes every recall value.
    """
    gt = {
        "img": [
            {"bbox": [0, 0, 10, 10], "category_id": 0, "iscrowd": 0},
            {"bbox": [20, 20, 30, 30], "category_id": 0, "iscrowd": 0},
            {"bbox": [50, 50, 70, 70], "category_id": 0, "iscrowd": 1},
        ]
    }
    dets = {
        "img": _dets(
            [
                ([100, 100, 110, 110], 0.95),
                ([0, 0, 10, 10], 0.9),
                ([50, 50, 70, 70], 0.8),
                ([20, 20, 30, 30], 0.6),
            ]
        )
    }
    m = evaluate_coco_detections(gt, dets, [0])
    assert abs(m["AP"] - 200.0 / 3.0) < 1e-12, m["AP"]
    assert abs(m["AP50"] - 200.0 / 3.0) < 1e-12
    assert abs(m["AP75"] - 200.0 / 3.0) < 1e-12


def test_area_boundary_uses_annotation_area_field():
    """GT1: bbox [0,0,40,40] (bbox area 1600) with 'area': 1024 — exactly
    the small/medium boundary (32^2). GT2: bbox [0,0,100,100], 'area':
    10000 (large). Dets: d1=GT1-box@.9, d2=GT2-box@.8, both IoU 1.

    COCOeval ignores iff area < lo or area > hi, so area == 1024 is
    included in BOTH small (0,1024] and medium [1024,9216) — and the
    decision uses the 'area' FIELD (1024), not the bbox area (1600):

      all:    npos=2, both TP            -> AP  = 100
      small:  GT1 in, GT2 ignored, d1 TP, d2 crowd-free ignored match
                                          -> APs = 100
      medium: GT1 in (boundary!), GT2 ignored (10000 > 96^2=9216)
                                          -> APm = 100
      large:  GT2 in, GT1 ignored         -> APl = 100

    Discrimination: a strict-inequality misreading at either boundary, or
    using bbox area (1600: medium-only) for the GT decision, makes the
    small or medium range npos=0 => that AP becomes NaN, not 100.
    """
    gt = {
        "img": [
            {"bbox": [0, 0, 40, 40], "category_id": 0, "iscrowd": 0,
             "area": 1024.0},
            {"bbox": [0, 0, 100, 100], "category_id": 0, "iscrowd": 0,
             "area": 10000.0},
        ]
    }
    dets = {
        "img": _dets([([0, 0, 40, 40], 0.9), ([0, 0, 100, 100], 0.8)])
    }
    m = evaluate_coco_detections(gt, dets, [0])
    for key in ("AP", "AP50", "AP75", "APs", "APm", "APl"):
        assert abs(m[key] - 100.0) < 1e-12, (key, m[key])


def test_score_tie_stable_order_within_image():
    """One image, GTs A=[0,0,10,10], B=[20,20,30,30]; dets d1=A@0.5 (TP)
    then d2=[40,40,50,50]@0.5 (FP) — tied scores, d1 listed first.

    Stable sort keeps [TP, FP]: cumTP=[1,1], cumFP=[0,1], npos=2 ->
    recall=[1/2, 1/2], precision=[1, 1/2]; envelope [1, 1/2].
    searchsorted(left) maps recall thresholds 0.00..0.50 (51 of 101) to
    precision 1.0 and the rest past the end (0) =>
    AP = 51/101 * 100 = 5100/101 %.

    Discrimination: flipping the tie to [FP, TP] gives precision
    [0, 1/2] -> envelope [1/2, 1/2] -> AP = 2550/101 (half).
    """
    gt = {
        "img": [
            {"bbox": [0, 0, 10, 10], "category_id": 0, "iscrowd": 0},
            {"bbox": [20, 20, 30, 30], "category_id": 0, "iscrowd": 0},
        ]
    }
    dets = {
        "img": _dets([([0, 0, 10, 10], 0.5), ([40, 40, 50, 50], 0.5)])
    }
    m = evaluate_coco_detections(gt, dets, [0])
    assert abs(m["AP"] - 5100.0 / 101.0) < 1e-12, m["AP"]
    assert abs(m["AP50"] - 5100.0 / 101.0) < 1e-12


def test_score_tie_stable_order_across_images():
    """img1 holds the FP (listed first in the dataset), img2 the TP, with
    equal scores. The global stable concatenation keeps img1's det first:
    kept=[FP, TP], npos=2 -> recall=[0, 1/2], precision=[0, 1/2],
    envelope [1/2, 1/2]; recall thresholds 0.00..0.50 map to 1/2, rest 0
    => AP = 51 * 0.5 / 101 * 100 = 2550/101 %.

    Discrimination: image-order-insensitive tie handling (e.g. re-sorting
    by image id or unstable sort placing the TP first) doubles it to
    5100/101.
    """
    gt = {
        "img1": [{"bbox": [0, 0, 10, 10], "category_id": 0, "iscrowd": 0}],
        "img2": [{"bbox": [0, 0, 10, 10], "category_id": 0, "iscrowd": 0}],
    }
    dets = {
        "img1": _dets([([40, 40, 50, 50], 0.5)]),
        "img2": _dets([([0, 0, 10, 10], 0.5)]),
    }
    m = evaluate_coco_detections(gt, dets, [0])
    assert abs(m["AP"] - 2550.0 / 101.0) < 1e-12, m["AP"]


def test_maxdets_truncates_at_exactly_100():
    """One GT; 100 FPs at scores 0.9 - 0.001*i (i=0..99, min 0.801) and
    one TP.

    Leg 1 — TP scored 0.5 ranks 101st: truncated by maxDets=100, so no
    detection ever matches the GT -> every precision is 0 => AP = 0
    exactly (a missing truncation would yield AP = 100/101 > 0).

    Leg 2 — TP scored 0.8015 ranks 100th (between the 99th FP at 0.802
    and the 100th at 0.801): the LAST FP is the one truncated. Kept =
    99 FPs then the TP: cumTP(at det 100)=1, recall hits 1 with
    precision 1/100; envelope makes all 101 thresholds read 0.01
    => AP = 1.0 exactly (truncating at 99 would drop the TP -> AP = 0;
    at 101 the extra trailing FP changes nothing -> leg 1 pins that
    side).
    """
    gt = {
        "img": [{"bbox": [0, 0, 10, 10], "category_id": 0, "iscrowd": 0}]
    }
    fps = [([1000 + 20 * i, 0, 1010 + 20 * i, 10], 0.9 - 0.001 * i)
           for i in range(100)]

    m1 = evaluate_coco_detections(
        {"img": gt["img"]},
        {"img": _dets(fps + [([0, 0, 10, 10], 0.5)])},
        [0],
    )
    assert m1["AP"] == 0.0, m1["AP"]
    assert m1["AP50"] == 0.0

    m2 = evaluate_coco_detections(
        {"img": gt["img"]},
        {"img": _dets(fps + [([0, 0, 10, 10], 0.8015)])},
        [0],
    )
    assert abs(m2["AP"] - 1.0) < 1e-12, m2["AP"]
    assert abs(m2["AP50"] - 1.0) < 1e-12
