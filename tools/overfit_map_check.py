# mAP overfit sanity: train a tiny model on a 6-image synthetic set with
# VISIBLE objects (solid colored rectangles on gray; class <-> color), then
# evaluate ON THE TRAIN IMAGES through the full inference + VOC-evaluator
# chain. Loss curves can't see coordinate or evaluator misalignments; a
# high AP50 here proves train -> detect -> rescale -> match -> AP agree end
# to end. Run on TPU (default) or FSODTF_PLATFORM=cpu.
import os
import sys
import tempfile
import time

sys.path.insert(0, '.')
sys.path.insert(0, 'tests')

# honor FSODTF_PLATFORM (e.g. =cpu) BEFORE any jax backend init -- env
# vars alone cannot override the container's axon default (NOTES.md)
if os.environ.get("FSODTF_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["FSODTF_PLATFORM"])

# persistent jit-compilation cache (shared with the CLI; see
# cli._setup_compilation_cache): repeat validation runs skip the
# 20-40 s remote compiles of unchanged programs
from fewshotobjectdetection_imporove_via_text_feature_tpu.cli import (
    _setup_compilation_cache,
)

_setup_compilation_cache()

import numpy as np
from PIL import Image

VOC_XML = """<annotation>
  <size><width>{w}</width><height>{h}</height><depth>3</depth></size>
  {objs}
</annotation>"""
OBJ_XML = """<object>
    <name>{name}</name><difficult>0</difficult>
    <bndbox><xmin>{x1}</xmin><ymin>{y1}</ymin><xmax>{x2}</xmax><ymax>{y2}</ymax></bndbox>
  </object>"""

CLASS_COLORS = {"dog": (220, 40, 40), "cat": (40, 220, 40), "bird": (40, 40, 220)}


def make_visual_voc(root, n=6):
    d = os.path.join(root, "VOC2007")
    for sub in ("Annotations", "JPEGImages", "ImageSets/Main"):
        os.makedirs(os.path.join(d, sub), exist_ok=True)
    rng = np.random.RandomState(7)
    ids = []
    for i in range(n):
        fid = f"{i:06d}"
        ids.append(fid)
        w, h = 320, 240
        img = np.full((h, w, 3), 128, np.uint8)
        objs = ""
        for name in ("dog", "cat", "bird"):
            bw, bh = int(rng.randint(50, 90)), int(rng.randint(50, 90))
            x1 = int(rng.randint(0, w - bw))
            y1 = int(rng.randint(0, h - bh))
            img[y1:y1 + bh, x1:x1 + bw] = CLASS_COLORS[name]
            objs += OBJ_XML.format(
                name=name, x1=x1 + 1, y1=y1 + 1, x2=x1 + bw, y2=y1 + bh
            )
        with open(os.path.join(d, "Annotations", fid + ".xml"), "w") as f:
            f.write(VOC_XML.format(w=w, h=h, objs=objs))
        Image.fromarray(img).save(os.path.join(d, "JPEGImages", fid + ".jpg"))
    with open(os.path.join(d, "ImageSets/Main", "trainval.txt"), "w") as f:
        f.write("\n".join(ids))
    return d


def memorized_set_recall(dets, anno_dir, name_to_id, iou_thresh=0.5):
    """recall@iou over EVERY annotation file in anno_dir — iterating the
    dataset, not the detections, so images with zero detections count
    their GT as misses (an early version iterated det image_ids and a
    model detecting nothing on an image silently dropped its GT from the
    denominator). Returns (hit, total)."""
    import xml.etree.ElementTree as ET

    total = hit = 0
    for fn in sorted(os.listdir(anno_dir)):
        if not fn.endswith(".xml"):
            continue
        fid = fn[:-4]
        tree = ET.parse(os.path.join(anno_dir, fn))
        for obj in tree.findall("object"):
            total += 1
            bb = obj.find("bndbox")
            # loader applies the VOC -1 origin shift
            g = [float(bb.find(t).text) - (1 if t in ("xmin", "ymin") else 0)
                 for t in ("xmin", "ymin", "xmax", "ymax")]
            cid = name_to_id[obj.find("name").text]
            for dd in dets:
                if dd["image_id"] != fid or dd["category_id"] != cid:
                    continue
                x, y, w, h = dd["bbox"]
                ix = max(0, min(g[2], x + w) - max(g[0], x))
                iy = max(0, min(g[3], y + h) - max(g[1], y))
                inter = ix * iy
                union = (g[2] - g[0]) * (g[3] - g[1]) + w * h - inter
                if inter / union > iou_thresh:
                    hit += 1
                    break
    return hit, total


def main(production=False, head=None, pcb=False):
    from fewshotobjectdetection_imporove_via_text_feature_tpu.data import (
        DatasetCatalog,
    )
    from fewshotobjectdetection_imporove_via_text_feature_tpu.data.builtin_meta import (
        _get_builtin_metadata,
    )
    from fewshotobjectdetection_imporove_via_text_feature_tpu.data.meta_voc import (
        register_meta_voc,
    )
    from fewshotobjectdetection_imporove_via_text_feature_tpu.config import (
        get_cfg,
    )
    from fewshotobjectdetection_imporove_via_text_feature_tpu.engine import (
        Trainer,
    )
    import main as cli

    root = tempfile.mkdtemp()
    d = make_visual_voc(root)
    meta = _get_builtin_metadata("voc_fewshot")
    for split in ("voc_mapof_all1_t_train", "voc_mapof_all1_t_test"):
        register_meta_voc(
            split, meta, d, "trainval", 2007, "base_novel_1", 1, root=root
        )

    cfg = get_cfg()
    if production:
        # FULL production scale: R-101 C4 at 800x1344, bf16 — the exact
        # flagship config, memorizing the 6-image set on real hardware.
        cfg.MODEL.ROI_HEADS.NUM_CLASSES = 20
        cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST = 0.3
        cfg.MODEL.BACKBONE.FREEZE_AT = 0
        cfg.TPU.IMAGE_BUCKETS = ((800, 1344),)
        cfg.INPUT.MIN_SIZE_TRAIN = (800,)
        cfg.INPUT.MAX_SIZE_TRAIN = 1333
        cfg.INPUT.MIN_SIZE_TEST = 800
        cfg.INPUT.MAX_SIZE_TEST = 1333
        cfg.SOLVER.IMS_PER_BATCH = 6
        cfg.SOLVER.MAX_ITER = 300
        cfg.SOLVER.STEPS = (220, 270)
        cfg.SOLVER.BASE_LR = 0.01
        cfg.SOLVER.WARMUP_ITERS = 50
    else:
        cfg.MODEL.RESNETS.DEPTH = 14
        cfg.MODEL.RESNETS.STEM_OUT_CHANNELS = 8
        cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 16
        cfg.MODEL.RESNETS.WIDTH_PER_GROUP = 4
        cfg.MODEL.BACKBONE.FREEZE_AT = 0
        cfg.MODEL.ROI_HEADS.NUM_CLASSES = 20
        cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 32
        cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST = 0.3
        cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 256
        cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 64
        cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 256
        cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 64
        cfg.TPU.IMAGE_BUCKETS = ((256, 384),)
        cfg.TPU.MAX_GT = 10
        cfg.TPU.MAX_DETECTIONS_PRE_NMS = 128
        cfg.TPU.COMPUTE_DTYPE = "float32"
        cfg.INPUT.MIN_SIZE_TRAIN = (256,)
        cfg.INPUT.MAX_SIZE_TRAIN = 384
        cfg.INPUT.MIN_SIZE_TEST = 256
        cfg.INPUT.MAX_SIZE_TEST = 384
        cfg.SOLVER.IMS_PER_BATCH = 6
        cfg.SOLVER.MAX_ITER = 500
        cfg.SOLVER.STEPS = (380, 450)
        cfg.SOLVER.BASE_LR = 0.02
        cfg.SOLVER.WARMUP_ITERS = 50
    if head:
        # Text-branch overfit: the flagship contribution trained and
        # evaluated end to end, using the reference's ACTIVE student
        # recipe (run_text_train_Student.sh:55-59: STUDENT_TRAINING True,
        # DISTILLATE False -> pure-CE student; the KL/L2 distillation
        # losses are exercised by dryrun_multichip and
        # production_step_smoke instead — joint from-scratch distillation
        # does not converge in a 300-iter overfit, by design of the
        # method: the reference distills FROM A TRAINED teacher). The
        # class-embedding bank resolves to the deterministic synthetic
        # fallback, exactly like the CLI without datasets/glove.
        cfg.MODEL.ROI_HEADS.NAME = head
        cfg.MODEL.ADDITION.NAME = "glove"
        cfg.MODEL.ROI_HEADS.TEACHER_TRAINING = True
        cfg.MODEL.ROI_HEADS.STUDENT_TRAINING = True
        cfg.MODEL.ROI_HEADS.DISTILLATE = False
        # the student's confidence ramps slower than the plain head's --
        # score-threshold at the reference's standard test default
        cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST = 0.05
    cfg.SOLVER.CHECKPOINT_PERIOD = 0
    cfg.TEST.EVAL_PERIOD = 0
    cfg.DATASETS.TRAIN = ("voc_mapof_all1_t_train",)
    cfg.DATASETS.TEST = ("voc_mapof_all1_t_test",)
    cfg.OUTPUT_DIR = os.path.join(root, "out")
    cfg.SEED = 11

    t0 = time.time()
    tr = Trainer(cfg)
    tr.train()
    res = cli.do_test(cfg, params=tr.params, model=tr.model)
    ap50 = res["voc_mapof_all1_t_test"]["bbox"]["AP50"]
    # VOC AP averages over ALL 20 classes; only 3 exist here, so a perfect
    # detector scores exactly 3/20*100 = 15.0. The sharp check is recall:
    # every GT object must be matched at IoU>0.5 by a same-class detection.
    import json

    import xml.etree.ElementTree as ET

    dets = json.load(
        open(os.path.join(cfg.OUTPUT_DIR, "coco_instances_results.json"))
    )
    from fewshotobjectdetection_imporove_via_text_feature_tpu.data import (
        MetadataCatalog,
    )

    classes = MetadataCatalog.get("voc_mapof_all1_t_test").thing_classes
    name_to_id = {n: i for i, n in enumerate(classes)}
    hit, total = memorized_set_recall(
        dets, os.path.join(d, "Annotations"), name_to_id
    )
    recall = hit / max(total, 1)
    print(
        f"wall {time.time()-t0:.0f}s  AP50={ap50:.2f} "
        f"(3 of 20 classes present; perfect = 15.0)  "
        f"recall@0.5 on memorized set: {hit}/{total}"
    )
    assert recall >= 0.9, f"overfit recall too low: {recall}"
    assert ap50 > 12.0, f"overfit AP50 too low: {ap50}"
    print("MAP OVERFIT CHECK PASSED")

    if pcb:
        # VERDICT r2 task 7: PCB-enabled evaluation at production shapes
        # on the live backend. Prototypes build from cfg.DATASETS.TRAIN
        # dicts (1x1 ROIAlign @ 1/32 over the R-101 PCB extractor —
        # random weights here: no ImageNet file in the container, but on
        # color-coded data random-backbone features still separate
        # classes), then every detection whose score lies in
        # (PCB_LOWER, PCB_UPPER] is rescored 0.5*s + 0.5*cos
        # (calibration_layer.py:109-124). Checks: rescoring CHANGED the
        # in-window scores, boxes/classes are untouched, and the
        # memorized-set recall survives rescoring.
        cfg.TEST.PCB_ENABLE = True
        cfg.TEST.PCB_MODELPATH = ""
        cfg.OUTPUT_DIR = os.path.join(root, "out_pcb")
        os.makedirs(cfg.OUTPUT_DIR, exist_ok=True)
        res_pcb = cli.do_test(cfg, params=tr.params, model=tr.model)
        dets_pcb = json.load(
            open(os.path.join(cfg.OUTPUT_DIR, "coco_instances_results.json"))
        )

        def key(dd):
            return (
                dd["image_id"], dd["category_id"],
                tuple(round(v, 2) for v in dd["bbox"]),
            )

        base_by_key = {key(dd): dd["score"] for dd in dets}
        pcb_by_key = {key(dd): dd["score"] for dd in dets_pcb}
        assert set(pcb_by_key) == set(base_by_key), (
            "PCB must only rescore, not change the detection set: "
            f"{len(base_by_key)} vs {len(pcb_by_key)}"
        )
        lower, upper = cfg.TEST.PCB_LOWER, cfg.TEST.PCB_UPPER
        changed = in_window = 0
        for k_, s0 in base_by_key.items():
            s1 = pcb_by_key[k_]
            if lower < s0 <= upper:
                in_window += 1
                changed += abs(s1 - s0) > 1e-6
            else:
                assert abs(s1 - s0) <= 1e-6, (k_, s0, s1)
        assert in_window > 0
        assert changed > 0, "PCB rescoring altered no in-window score"
        hit2, total2 = memorized_set_recall(
            dets_pcb, os.path.join(d, "Annotations"), name_to_id
        )
        print(
            f"PCB drive: {in_window} in-window dets, {changed} rescored, "
            f"recall with PCB {hit2}/{total2}"
        )
        assert hit2 / max(total2, 1) >= 0.9
        print("PCB ON-DEVICE CHECK PASSED")


if __name__ == "__main__":
    import sys

    head = None
    if "--head" in sys.argv:
        head = sys.argv[sys.argv.index("--head") + 1]
    main(
        production="--production" in sys.argv,
        head=head,
        pcb="--pcb" in sys.argv,
    )
