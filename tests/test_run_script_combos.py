"""Build-and-forward every (META_ARCHITECTURE, ROI_HEADS.NAME, OUTPUT_LAYER)
combination the reference's run scripts actually invoke, THROUGH the cfg ->
build_model wiring (the surface main.py uses), not direct constructors.

Combos extracted from /root/reference/run_*.sh (active, uncommented lines):
  * run_voc.sh / run_coco.sh           — GeneralizedRCNN + Res5ROIHeads
  * run_novel_pure_attention.sh:37     — GeneralizedRCNN + SematicRes5ROIHeads
  * run_voc_distillate_rpn.sh:13-15    — GeneralizedDistillatedRCNN +
        SematicRes5ROIHeadsCrossOutput + FastRCNNAttentionOutputLayers
  * run_text_train_teacher.sh:20-25    — TextRes5ROIHeads (teacher)
  * run_text_train_Student.sh:56-61    — TextRes5ROIHeads (student+distill)
  * run_textdomination_teacher_VKV.sh  — TextRes5ROIHeads_textDomination_VKV
  * run_dev.sh (commented experiments) — GeneralizedDistillatedAddingRCNN

Class embeddings resolve to the deterministic synthetic fallback (no
datasets/glove in CI), exactly as the CLI would with an empty datasets dir.
"""

import functools

import jax
import numpy as np
import pytest

from fewshotobjectdetection_imporove_via_text_feature_tpu.config import get_cfg
from fewshotobjectdetection_imporove_via_text_feature_tpu.models import (
    build_model,
)
from fewshotobjectdetection_imporove_via_text_feature_tpu.structures import (
    GTInstances,
    ImageBatch,
)

TINY = [
    "MODEL.RESNETS.DEPTH", "14",
    "MODEL.RESNETS.STEM_OUT_CHANNELS", "8",
    "MODEL.RESNETS.RES2_OUT_CHANNELS", "16",
    "MODEL.RESNETS.WIDTH_PER_GROUP", "4",
    "MODEL.RPN.PRE_NMS_TOPK_TRAIN", "64",
    "MODEL.RPN.POST_NMS_TOPK_TRAIN", "32",
    "MODEL.RPN.PRE_NMS_TOPK_TEST", "64",
    "MODEL.RPN.POST_NMS_TOPK_TEST", "32",
    "MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE", "8",
    "MODEL.ROI_HEADS.NUM_CLASSES", "15",
    "TPU.MAX_GT", "4",
    "TPU.MAX_DETECTIONS_PRE_NMS", "64",
    "TPU.COMPUTE_DTYPE", "float32",
    "DATASETS.TRAIN", "('voc_2007_trainval_base1',)",
]

COMBOS = [
    # (meta_architecture, roi_heads, output_layer, expected train loss keys)
    ("GeneralizedRCNN", "Res5ROIHeads", "FastRCNNOutputLayers", set()),
    ("GeneralizedRCNN", "SematicRes5ROIHeads", "FastRCNNOutputLayers",
     {"loss_attentive"}),
    ("GeneralizedDistillatedRCNN", "SematicRes5ROIHeadsCrossOutput",
     "FastRCNNAttentionOutputLayers",
     {"loss_rpn_res2", "loss_rpn_res3", "loss_rpn_res4"}),
    ("GeneralizedDistillatedAddingRCNN", "SematicRes5ROIHeadsCrossOutput",
     "FastRCNNAttentionOutputLayers",
     {"loss_rpn_res2", "loss_rpn_res3", "loss_rpn_res4"}),
    ("GeneralizedRCNN", "TextRes5ROIHeads", "FastRCNNOutputLayers",
     {"loss_cls_t", "loss_kl", "loss_student_feat"}),
    ("GeneralizedRCNN", "TextRes5ROIHeads_textDomination_VKV",
     "FastRCNNOutputLayers", {"loss_cls_t"}),
]


def _tiny_batch():
    rng = np.random.RandomState(0)
    h = w = 64
    images = ImageBatch(
        image=np.asarray(rng.uniform(0, 255, (2, h, w, 3)), np.float32),
        hw=np.asarray([[h, w]] * 2, np.int32),
        orig_hw=np.asarray([[h, w]] * 2, np.int32),
    )
    boxes = np.asarray(
        [[[4, 4, 40, 40], [20, 20, 60, 60], [0, 0, 0, 0], [0, 0, 0, 0]]] * 2,
        np.float32,
    )
    gt = GTInstances(
        boxes=boxes,
        classes=np.zeros((2, 4), np.int32),
        valid=np.asarray([[True, True, False, False]] * 2),
    )
    return images, gt


@pytest.mark.parametrize("meta,head,out_layer,want", COMBOS)
def test_run_script_combo_builds_and_runs(meta, head, out_layer, want):
    cfg = get_cfg()
    cfg.merge_from_list(
        TINY
        + [
            "MODEL.META_ARCHITECTURE", meta,
            "MODEL.ROI_HEADS.NAME", head,
            "MODEL.ROI_HEADS.OUTPUT_LAYER", out_layer,
            "MODEL.ADDITION.NAME", "glove",
        ]
    )
    model = build_model(cfg)
    images, gt = _tiny_batch()
    rngs = {
        "params": jax.random.PRNGKey(0),
        "sampling": jax.random.PRNGKey(1),
        "dropout": jax.random.PRNGKey(2),
    }
    params = jax.jit(functools.partial(model.init, train=True))(
        rngs, images, gt
    )
    losses = jax.jit(functools.partial(model.apply, train=True))(
        params, images, gt,
        rngs={"sampling": jax.random.PRNGKey(3),
              "dropout": jax.random.PRNGKey(4)},
    )
    for k, v in losses.items():
        assert np.isfinite(float(v)), (meta, head, k, float(v))
    missing = want - set(losses)
    assert not missing, (meta, head, sorted(losses), missing)

    det = jax.jit(functools.partial(model.apply, train=False))(params, images)
    assert det.boxes.shape[0] == 2
    assert np.isfinite(np.asarray(det.scores, np.float32)).all()
