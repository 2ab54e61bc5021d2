#!/usr/bin/env bash
# Novel fine-tuning with the pure semantic-attention head
# (parity: reference run_novel_pure_attention.sh).
set -e

EXP_NAME=${1:-AttentionRoiHead_CE}
SPLIT_ID=${2:-1}
SAVE_DIR=outputs/${EXP_NAME}
PCB_PRETRAIN=${PCB_PRETRAIN:-weights/resnet101-torchvision.pth}
BASE_WEIGHT=${SAVE_DIR}/teacher_base/defrcn_det_r101_base${SPLIT_ID}/model_reset_surgery.ckpt

for shot in 1 2 3 5 10; do
    for seed in 0 1 2 3 4 5 6 7 8 9; do
        python tools/create_config.py --dataset voc --config_root configs/voc \
            --shot ${shot} --seed ${seed} --setting gfsod --split ${SPLIT_ID}
        CONFIG_PATH=configs/voc/defrcn_gfsod_r101_novel${SPLIT_ID}_${shot}shot_seed${seed}.yaml
        OUTPUT_DIR=${SAVE_DIR}/teacher_novel${SPLIT_ID}/${shot}shot_seed${seed}
        cfg_MODEL="
        MUTE_HEADER True
        MODEL.ROI_HEADS.NAME SematicRes5ROIHeads
        MODEL.ADDITION.NAME glove
        SOLVER.IMS_PER_BATCH 12
        "
        python main.py --config-file ${CONFIG_PATH} \
            --opts MODEL.WEIGHTS ${BASE_WEIGHT} OUTPUT_DIR ${OUTPUT_DIR} \
                   TEST.PCB_MODELPATH ${PCB_PRETRAIN} ${cfg_MODEL}
        rm ${CONFIG_PATH}
    done
done
