#!/usr/bin/env bash
# Student fine-tuning with teacher distillation
# (parity: reference run_text_train_Student.sh).
set -e

EXP_NAME=${1:-singleHeadAtt_Text}
SPLIT_ID=${2:-1}
SAVE_DIR=outputs/${EXP_NAME}
PCB_PRETRAIN=${PCB_PRETRAIN:-weights/resnet101-torchvision.pth}
BASE_WEIGHT=${SAVE_DIR}/teacher_base/defrcn_det_r101_base${SPLIT_ID}/model_reset_surgery.ckpt

for seed in 0 1 2 3 4 5 6 7 8 9; do
    for shot in 1 2 3 5 10; do
        cfg_MODEL="
        MODEL.ROI_HEADS.NAME TextRes5ROIHeads
        MODEL.ROI_HEADS.TEACHER_TRAINING False
        MODEL.ROI_HEADS.STUDENT_TRAINING True
        MODEL.ROI_HEADS.DISTILLATE True
        MODEL.ROI_HEADS.KL True
        MODEL.ROI_HEADS.L2 True
        MODEL.ROI_HEADS.KL_TEMP 5
        "
        python tools/create_config.py --dataset voc --config_root configs/voc \
            --shot ${shot} --seed ${seed} --setting gfsod --split ${SPLIT_ID}
        CONFIG_PATH=configs/voc/defrcn_gfsod_r101_novel${SPLIT_ID}_${shot}shot_seed${seed}.yaml
        OUTPUT_DIR=${SAVE_DIR}/defrcn_gfsod_r101_novel${SPLIT_ID}/${shot}shot_seed${seed}
        python main.py --config-file ${CONFIG_PATH} \
            --opts MODEL.WEIGHTS ${BASE_WEIGHT} OUTPUT_DIR ${OUTPUT_DIR} \
                   TEST.PCB_MODELPATH ${PCB_PRETRAIN} ${cfg_MODEL}
        rm ${CONFIG_PATH}
    done
done
