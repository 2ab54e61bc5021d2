#!/usr/bin/env bash
# Per-(shot, seed): teacher novel fine-tune -> reset surgery -> student
# novel distillation.
# Parity: reference run_text_train_teacher_novel.sh:26-76 (exact --opts).
# Deviations, both documented:
#  * the reference sets MODEL.META_ARCHITECTURE GeneralizedRCNN2, a class
#    that was never committed (SURVEY.md §1 schema gaps) — the committed
#    code would crash; we run the committed GeneralizedRCNN.
#  * the reference passes TEACHER_NOVEL_DIR (uncommitted key consumed by
#    nothing in the committed tree, so its teacher stage writes to the
#    default ./output) — we pass OUTPUT_DIR alongside it so the artifact
#    lands where the next stage reads it.
set -e

EXP_NAME=${1:-singleHeadAtt_Text}
SPLIT_ID=${2:-1}
SAVE_DIR=outputs/${EXP_NAME}
PCB_PRETRAIN=${PCB_PRETRAIN:-weights/resnet101-torchvision.pth}
BASE_PATH=${SAVE_DIR}/teacher_base/defrcn_det_r101_base${SPLIT_ID}
BASE_WEIGHT=${BASE_PATH}/model_reset_surgery.ckpt

for shot in 1 2 3 5 10; do
    for seed in 0 1 2 3 4 5 6 7 8 9; do
        python tools/create_config.py --dataset voc --config_root configs/voc \
            --shot ${shot} --seed ${seed} --setting gfsod --split ${SPLIT_ID}
        CONFIG_PATH=configs/voc/defrcn_gfsod_r101_novel${SPLIT_ID}_${shot}shot_seed${seed}.yaml

        TEACHER_NOVEL_DIR=${SAVE_DIR}/teacher_novel${SPLIT_ID}/${shot}shot_seed${seed}
        NOVEL_WEIGHT=${BASE_WEIGHT}

        # ----------------------- teacher novel fine-tuning ----------------
        cfg_MODEL="
        MUTE_HEADER True
        MODEL.ROI_HEADS.NAME TextRes5ROIHeads
        MODEL.ROI_HEADS.TEACHER_TRAINING True
        MODEL.ROI_HEADS.STUDENT_TRAINING False
        MODEL.ROI_HEADS.DISTILLATE False
        SOLVER.IMS_PER_BATCH 16
        "
        python main.py --config-file ${CONFIG_PATH} \
            --opts MODEL.WEIGHTS ${NOVEL_WEIGHT} \
                   TEACHER_NOVEL_DIR ${TEACHER_NOVEL_DIR} \
                   OUTPUT_DIR ${TEACHER_NOVEL_DIR} \
                   TEST.PCB_MODELPATH ${PCB_PRETRAIN} ${cfg_MODEL}

        python tools/model_surgery.py --dataset voc --method reset \
            --src-path ${TEACHER_NOVEL_DIR}/model_final.ckpt \
            --save-dir ${TEACHER_NOVEL_DIR}
        TEACHER_NOVEL_WEIGHT=${TEACHER_NOVEL_DIR}/model_reset_optimizer.ckpt

        # ---------------------- student novel distillation ----------------
        cfg_MODEL="
        MUTE_HEADER True
        MODEL.ROI_HEADS.NAME TextRes5ROIHeads
        MODEL.ROI_HEADS.TEACHER_TRAINING False
        MODEL.ROI_HEADS.STUDENT_TRAINING True
        MODEL.ROI_HEADS.DISTILLATE True
        MODEL.ROI_HEADS.L2 False
        MODEL.ROI_HEADS.KL_TEMP 5
        SOLVER.IMS_PER_BATCH 16
        "
        STUDENT_DIR=${SAVE_DIR}/student_novel${SPLIT_ID}/${shot}shot_seed${seed}
        python main.py --config-file ${CONFIG_PATH} \
            --opts MODEL.WEIGHTS ${NOVEL_WEIGHT} OUTPUT_DIR ${STUDENT_DIR} \
                   TEST.PCB_MODELPATH ${PCB_PRETRAIN} ${cfg_MODEL}

        rm ${CONFIG_PATH}
    done
done
