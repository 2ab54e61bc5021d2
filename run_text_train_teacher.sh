#!/usr/bin/env bash
# Teacher training with the text-guided attention head
# (parity: reference run_text_train_teacher.sh).
set -e

EXP_NAME=${1:-singleHeadAtt_Text}
SPLIT_ID=${2:-1}
SAVE_DIR=outputs/${EXP_NAME}
IMAGENET_PRETRAIN=${IMAGENET_PRETRAIN:-weights/R-101.pkl}
PCB_PRETRAIN=${PCB_PRETRAIN:-weights/resnet101-torchvision.pth}
TEACHER_PATH=${SAVE_DIR}/teacher_base/defrcn_det_r101_base${SPLIT_ID}

cfg_MODEL="
MODEL.ROI_HEADS.NAME TextRes5ROIHeads
MODEL.ROI_HEADS.TEACHER_TRAINING True
MODEL.ROI_HEADS.STUDENT_TRAINING False
MODEL.ROI_HEADS.DISTILLATE False
"

python main.py --config-file configs/voc/defrcn_det_r101_base${SPLIT_ID}.yaml \
    --opts MODEL.WEIGHTS ${IMAGENET_PRETRAIN} OUTPUT_DIR ${TEACHER_PATH} \
           TEST.PCB_MODELPATH ${PCB_PRETRAIN} ${cfg_MODEL}

python tools/model_surgery.py --dataset voc --method randinit \
    --src-path ${TEACHER_PATH}/model_final.ckpt \
    --save-dir ${TEACHER_PATH}
