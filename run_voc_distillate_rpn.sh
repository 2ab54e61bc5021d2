#!/usr/bin/env bash
# Multi-scale RPN distillation with the semantic cross-output head
# (parity: reference run_voc_distillate_rpn.sh:12-27).
set -e

EXP_NAME=${1:-distillate_rpn}
SPLIT_ID=${2:-1}
SAVE_DIR=outputs/${EXP_NAME}
IMAGENET_PRETRAIN=${IMAGENET_PRETRAIN:-weights/R-101.pkl}

cfg_MODEL="
MODEL.META_ARCHITECTURE GeneralizedDistillatedRCNN
MODEL.ROI_HEADS.NAME SematicRes5ROIHeadsCrossOutput
MODEL.ROI_HEADS.OUTPUT_LAYER FastRCNNAttentionOutputLayers
MODEL.ADDITION.NAME glove
"

python main.py --config-file configs/voc/defrcn_det_r101_base${SPLIT_ID}.yaml \
    --opts MODEL.WEIGHTS ${IMAGENET_PRETRAIN} \
           OUTPUT_DIR ${SAVE_DIR}/defrcn_det_r101_base${SPLIT_ID} ${cfg_MODEL}
