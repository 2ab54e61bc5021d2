#!/usr/bin/env bash
# Few-shot workflow, COCO — parity with the reference run_coco.sh.
set -e

EXP_NAME=${1:-coco_defrcn}
SAVE_DIR=outputs/${EXP_NAME}
IMAGENET_PRETRAIN=${IMAGENET_PRETRAIN:-weights/R-101.pkl}

python main.py --config-file configs/coco/defrcn_det_r101_base.yaml \
    --opts MODEL.WEIGHTS ${IMAGENET_PRETRAIN} \
           OUTPUT_DIR ${SAVE_DIR}/defrcn_det_r101_base

python tools/model_surgery.py --dataset coco --method randinit \
    --src-path ${SAVE_DIR}/defrcn_det_r101_base/model_final.ckpt \
    --save-dir ${SAVE_DIR}/defrcn_det_r101_base
BASE_WEIGHT=${SAVE_DIR}/defrcn_det_r101_base/model_reset_surgery.ckpt

for seed in 0 1 2 3 4 5 6 7 8 9; do
    for shot in 1 2 3 5 10 30; do
        python tools/create_config.py --dataset coco14 --config_root configs/coco \
            --shot ${shot} --seed ${seed} --setting gfsod
        CONFIG_PATH=configs/coco/defrcn_gfsod_r101_novel_${shot}shot_seed${seed}.yaml
        OUTPUT_DIR=${SAVE_DIR}/defrcn_gfsod_r101_novel/tfa-like/${shot}shot_seed${seed}
        python main.py --config-file ${CONFIG_PATH} \
            --opts MODEL.WEIGHTS ${BASE_WEIGHT} OUTPUT_DIR ${OUTPUT_DIR} \
                   TEST.PCB_MODELPATH ${PCB_PATH:-weights/resnet101-torchvision.pth}
        rm ${CONFIG_PATH}
    done
done

python tools/extract_results.py \
    --res-dir ${SAVE_DIR}/defrcn_gfsod_r101_novel/tfa-like \
    --shot-list 1 2 3 5 10 30
