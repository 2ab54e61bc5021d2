#!/usr/bin/env bash
# ONE-COMMAND real-data VOC run: preflight-gate the data+weights, then
# base train -> surgery -> k-shot gfsod fine-tune (+PCB) -> results.
# North-star protocol (BASELINE.md): VOC split1, 10-shot, nAP50.
#
# Usage: bash tools/run_real_voc.sh [SPLIT_ID] [SHOT] [SEEDS...]
# In a container without real VOC/weights this exits early with a clear
# per-item report of what to supply (VERDICT r1 Missing #5 / #6).
set -e -o pipefail  # pipefail: a crashed main.py must not hide behind tee
cd "$(dirname "$0")/.."

# NB: `shift 2` is a no-op (not a partial shift) when $# < 2, which would
# leak SPLIT_ID into SEEDS — shift one arg at a time instead.
SPLIT_ID=${1:-1}
[ $# -ge 1 ] && shift
SHOT=${1:-10}
[ $# -ge 1 ] && shift
SEEDS=${@:-0}
DATA_ROOT=${DATA_ROOT:-datasets}
IMAGENET_PRETRAIN=${IMAGENET_PRETRAIN:-weights/R-101.pkl}
PCB_PRETRAIN=${PCB_PRETRAIN:-weights/resnet101-torchvision.pth}
SAVE_DIR=${SAVE_DIR:-outputs/real_voc}
export FSODTF_DATASETS=${DATA_ROOT}  # main.py registers datasets from here

# --------------------------- Preflight gate -------------------------------
python tools/preflight_real_voc.py --root ${DATA_ROOT} \
    --shot ${SHOT} --seeds ${SEEDS} \
    --r101 ${IMAGENET_PRETRAIN} --pcb ${PCB_PRETRAIN}

# --------------------------- Base Pre-train -------------------------------
BASE_DIR=${SAVE_DIR}/defrcn_det_r101_base${SPLIT_ID}
if [ ! -f ${BASE_DIR}/model_final.ckpt ]; then
    python main.py --config-file configs/voc/defrcn_det_r101_base${SPLIT_ID}.yaml \
        --opts MODEL.WEIGHTS ${IMAGENET_PRETRAIN} OUTPUT_DIR ${BASE_DIR}
else
    echo "base checkpoint exists, skipping base train: ${BASE_DIR}"
fi

# --------------------------- Model Surgery --------------------------------
python tools/model_surgery.py --dataset voc --method randinit \
    --src-path ${BASE_DIR}/model_final.ckpt \
    --save-dir ${BASE_DIR}
BASE_WEIGHT=${BASE_DIR}/model_reset_surgery.ckpt

# ----------------------- Novel Fine-tuning (gfsod) ------------------------
for seed in ${SEEDS}; do
    python tools/create_config.py --dataset voc --config_root configs/voc \
        --shot ${SHOT} --seed ${seed} --setting gfsod --split ${SPLIT_ID}
    CONFIG_PATH=configs/voc/defrcn_gfsod_r101_novel${SPLIT_ID}_${SHOT}shot_seed${seed}.yaml
    OUTPUT_DIR=${SAVE_DIR}/defrcn_gfsod_r101_novel${SPLIT_ID}/tfa-like/${SHOT}shot_seed${seed}
    # main.py writes OUTPUT_DIR/log.txt itself (reference setup_logger
    # parity) — extract_results scrapes its trailing "copypaste:" lines
    python main.py --config-file ${CONFIG_PATH} \
        --opts MODEL.WEIGHTS ${BASE_WEIGHT} OUTPUT_DIR ${OUTPUT_DIR} \
               TEST.PCB_MODELPATH ${PCB_PRETRAIN}
    rm ${CONFIG_PATH}
done

python tools/extract_results.py \
    --res-dir ${SAVE_DIR}/defrcn_gfsod_r101_novel${SPLIT_ID}/tfa-like \
    --shot-list ${SHOT}
echo "Done. Compare nAP50 against BASELINE.md (DeFRCN VOC split1 ${SHOT}-shot)."
