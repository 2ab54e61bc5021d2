#!/usr/bin/env bash
# Few-shot workflow, VOC — parity with the reference run_voc.sh:
# base train -> surgery -> per-(shot, seed) fine-tune -> aggregate.
set -e

EXP_NAME=${1:-voc_defrcn}
SPLIT_ID=${2:-1}
SAVE_DIR=outputs/${EXP_NAME}
IMAGENET_PRETRAIN=${IMAGENET_PRETRAIN:-weights/R-101.pkl}

# ------------------------------- Base Pre-train ---------------------------
python main.py --config-file configs/voc/defrcn_det_r101_base${SPLIT_ID}.yaml \
    --opts MODEL.WEIGHTS ${IMAGENET_PRETRAIN} \
           OUTPUT_DIR ${SAVE_DIR}/defrcn_det_r101_base${SPLIT_ID}

# ------------------------------ Model Surgery -----------------------------
python tools/model_surgery.py --dataset voc --method randinit \
    --src-path ${SAVE_DIR}/defrcn_det_r101_base${SPLIT_ID}/model_final.ckpt \
    --save-dir ${SAVE_DIR}/defrcn_det_r101_base${SPLIT_ID}
BASE_WEIGHT=${SAVE_DIR}/defrcn_det_r101_base${SPLIT_ID}/model_reset_surgery.ckpt

# ------------------------- Novel Fine-tuning (gfsod) -----------------------
for seed in 0 1 2 3 4 5 6 7 8 9; do
    for shot in 1 2 3 5 10; do
        python tools/create_config.py --dataset voc --config_root configs/voc \
            --shot ${shot} --seed ${seed} --setting gfsod --split ${SPLIT_ID}
        CONFIG_PATH=configs/voc/defrcn_gfsod_r101_novel${SPLIT_ID}_${shot}shot_seed${seed}.yaml
        OUTPUT_DIR=${SAVE_DIR}/defrcn_gfsod_r101_novel${SPLIT_ID}/tfa-like/${shot}shot_seed${seed}
        python main.py --config-file ${CONFIG_PATH} \
            --opts MODEL.WEIGHTS ${BASE_WEIGHT} OUTPUT_DIR ${OUTPUT_DIR} \
                   TEST.PCB_MODELPATH ${PCB_PATH:-weights/resnet101-torchvision.pth}
        rm ${CONFIG_PATH}
    done
done

python tools/extract_results.py \
    --res-dir ${SAVE_DIR}/defrcn_gfsod_r101_novel${SPLIT_ID}/tfa-like \
    --shot-list 1 2 3 5 10
