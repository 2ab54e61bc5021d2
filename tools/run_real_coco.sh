#!/usr/bin/env bash
# ONE-COMMAND real-data COCO few-shot run: preflight-gate the data+weights,
# then base train -> surgery -> k-shot gfsod fine-tune (+PCB) -> results.
# COCO analog of tools/run_real_voc.sh (reference workflow: run_coco.sh).
# Protocol (BASELINE.md): COCO-14, 10/30-shot, nAP.
#
# Usage: bash tools/run_real_coco.sh [SHOT] [SEEDS...]
# In a container without real COCO/weights this exits early with a clear
# per-item report of what to supply.
set -e -o pipefail  # pipefail: a crashed main.py must not hide behind tee
cd "$(dirname "$0")/.."

SHOT=${1:-10}
[ $# -ge 1 ] && shift
SEEDS=${@:-0}
DATA_ROOT=${DATA_ROOT:-datasets}
IMAGENET_PRETRAIN=${IMAGENET_PRETRAIN:-weights/R-101.pkl}
PCB_PRETRAIN=${PCB_PRETRAIN:-weights/resnet101-torchvision.pth}
SAVE_DIR=${SAVE_DIR:-outputs/real_coco}
export FSODTF_DATASETS=${DATA_ROOT}  # main.py registers datasets from here

# --------------------------- Preflight gate -------------------------------
python tools/preflight_real_coco.py --root ${DATA_ROOT} \
    --shot ${SHOT} --seeds ${SEEDS} \
    --r101 ${IMAGENET_PRETRAIN} --pcb ${PCB_PRETRAIN}

# --------------------------- Base Pre-train -------------------------------
# 110k iters over the 60 base classes (configs/coco/defrcn_det_r101_base.yaml)
BASE_DIR=${SAVE_DIR}/defrcn_det_r101_base
if [ ! -f ${BASE_DIR}/model_final.ckpt ]; then
    python main.py --config-file configs/coco/defrcn_det_r101_base.yaml \
        --opts MODEL.WEIGHTS ${IMAGENET_PRETRAIN} OUTPUT_DIR ${BASE_DIR}
else
    echo "base checkpoint exists, skipping base train: ${BASE_DIR}"
fi

# --------------------------- Model Surgery --------------------------------
# randinit expands the 60-class head to 80 rows, copying base rows through
# the COCO IDMAP (reference tools/model_surgery.py:70-77)
python tools/model_surgery.py --dataset coco --method randinit \
    --src-path ${BASE_DIR}/model_final.ckpt \
    --save-dir ${BASE_DIR}
BASE_WEIGHT=${BASE_DIR}/model_reset_surgery.ckpt

# ----------------------- Novel Fine-tuning (gfsod) ------------------------
for seed in ${SEEDS}; do
    python tools/create_config.py --dataset coco14 --config_root configs/coco \
        --shot ${SHOT} --seed ${seed} --setting gfsod
    CONFIG_PATH=configs/coco/defrcn_gfsod_r101_novel_${SHOT}shot_seed${seed}.yaml
    OUTPUT_DIR=${SAVE_DIR}/defrcn_gfsod_r101_novel/tfa-like/${SHOT}shot_seed${seed}
    # main.py writes OUTPUT_DIR/log.txt itself (reference setup_logger
    # parity) — extract_results scrapes its trailing "copypaste:" lines
    python main.py --config-file ${CONFIG_PATH} \
        --opts MODEL.WEIGHTS ${BASE_WEIGHT} OUTPUT_DIR ${OUTPUT_DIR} \
               TEST.PCB_MODELPATH ${PCB_PRETRAIN}
    rm ${CONFIG_PATH}
done

python tools/extract_results.py \
    --res-dir ${SAVE_DIR}/defrcn_gfsod_r101_novel/tfa-like \
    --shot-list ${SHOT}
echo "Done. Compare nAP against BASELINE.md (DeFRCN COCO ${SHOT}-shot)."
