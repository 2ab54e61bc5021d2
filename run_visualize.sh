#!/usr/bin/env bash
# Evaluate a trained text-teacher checkpoint with PCB (the reference's
# run_visualize.sh:25-42 is, despite the name, an eval-only run whose
# OUTPUT_DIR artifacts — coco_instances_results.json — feed
# visualize_json_results.py). Parity: exact --opts; this port adds the
# actual visualization call on the produced dump, which the reference
# script leaves to manual invocation.
set -e

EXP_NAME=${1:-singleHeadAtt_Text}
SPLIT_ID=${2:-1}
SAVE_DIR=outputs/${EXP_NAME}
PCB_PRETRAIN=${PCB_PRETRAIN:-weights/resnet101-torchvision.pth}
TEACHER_WEIGHTS=${TEACHER_WEIGHTS:-${SAVE_DIR}/teacher_base/defrcn_det_r101_base${SPLIT_ID}/model_final.ckpt}
TEACHER_PATH=${SAVE_DIR}/teacher_base/defrcn_det_r101_base${SPLIT_ID}

cfg_MODEL="
MODEL.ROI_HEADS.NAME TextRes5ROIHeads
MODEL.ROI_HEADS.TEACHER_TRAINING True
MODEL.ROI_HEADS.STUDENT_TRAINING False
MODEL.ROI_HEADS.DISTILLATE False
"

python main.py --eval-only \
    --config-file configs/voc/defrcn_det_r101_base${SPLIT_ID}.yaml \
    --opts MODEL.WEIGHTS ${TEACHER_WEIGHTS} \
           OUTPUT_DIR ${TEACHER_PATH} \
           TEST.PCB_MODELPATH ${PCB_PRETRAIN} ${cfg_MODEL}

# render predictions-vs-GT side by side from the eval dump
python visualize_json_results.py \
    --input ${TEACHER_PATH}/coco_instances_results.json \
    --output ${TEACHER_PATH}/visualizations \
    --dataset voc_2007_test_all${SPLIT_ID}
