#!/usr/bin/env bash
# Text-domination teacher: evaluate a trained teacher checkpoint, then
# surgery it for novel fine-tuning.
# Parity: reference run_textdomination_teacher.sh:18-42 (exact --opts:
# TextRes5ROIHeads_textDomination, teacher flags, SOLVER overrides kept
# even though --eval-only ignores them). The reference `exit`s between the
# two stages; this port runs both. Deviation: .ckpt checkpoints.
set -e

EXP_NAME=${1:-textDomination}
SPLIT_ID=${2:-1}
SAVE_DIR=outputs/${EXP_NAME}
PCB_PRETRAIN=${PCB_PRETRAIN:-weights/resnet101-torchvision.pth}
# the reference points MODEL.WEIGHTS at an already-trained teacher base
TEACHER_WEIGHTS=${TEACHER_WEIGHTS:-${SAVE_DIR}/teacher_base/defrcn_det_r101_base${SPLIT_ID}/model_final.ckpt}
TEACHER_PATH=${SAVE_DIR}/teacher_base/defrcn_det_r101_base${SPLIT_ID}

cfg_MODEL="
MODEL.ROI_HEADS.NAME TextRes5ROIHeads_textDomination
MODEL.ROI_HEADS.TEACHER_TRAINING True
MODEL.ROI_HEADS.STUDENT_TRAINING False
MODEL.ROI_HEADS.DISTILLATE False
SOLVER.CHECKPOINT_PERIOD 5000
SOLVER.IMS_PER_BATCH 4
SOLVER.MAX_ITER 60000
"

python main.py --eval-only \
    --config-file configs/voc/defrcn_det_r101_base${SPLIT_ID}.yaml \
    --opts MODEL.WEIGHTS ${TEACHER_WEIGHTS} \
           OUTPUT_DIR ${TEACHER_PATH} \
           TEST.PCB_MODELPATH ${PCB_PRETRAIN} ${cfg_MODEL}

python tools/model_surgery.py --dataset voc --method randinit \
    --src-path ${TEACHER_WEIGHTS} \
    --save-dir ${TEACHER_PATH}
