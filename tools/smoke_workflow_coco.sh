#!/usr/bin/env bash
# End-to-end few-shot workflow smoke, COCO path: base train (60 classes) ->
# IDMAP surgery (60 -> 80, base rows preserved) -> create_config -> gfsod
# 1-shot fine-tune -> COCOEvaluator (all/base/novel) -> extract_results.
# Mirrors run_coco.sh's skeleton on a synthetic dataset with a tiny model.
set -e -o pipefail  # a crashed main.py must not hide behind tee
cd "$(dirname "$0")/.."

SAVE_DIR=${1:-/tmp/smoke_workflow_coco}
rm -rf ${SAVE_DIR}
mkdir -p ${SAVE_DIR}

# synthetic data goes to its OWN root — writing into ./datasets would
# silently clobber real COCO split files if any were present
DATA_ROOT=${SAVE_DIR}/datasets
export FSODTF_DATASETS=${DATA_ROOT}
python tools/_make_synthetic_coco.py --root ${DATA_ROOT} --shots 1 --seeds 0

TINY_OPTS="MODEL.RESNETS.DEPTH 14 MODEL.RESNETS.STEM_OUT_CHANNELS 8
MODEL.RESNETS.RES2_OUT_CHANNELS 16 MODEL.RESNETS.WIDTH_PER_GROUP 4
MODEL.BACKBONE.FREEZE_AT 0
MODEL.RPN.PRE_NMS_TOPK_TRAIN 256 MODEL.RPN.POST_NMS_TOPK_TRAIN 64
MODEL.RPN.PRE_NMS_TOPK_TEST 256 MODEL.RPN.POST_NMS_TOPK_TEST 64
MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE 16
MODEL.ROI_HEADS.SCORE_THRESH_TEST 0.0
TPU.IMAGE_BUCKETS ((256,384),) TPU.MAX_GT 10 TPU.MAX_DETECTIONS_PRE_NMS 128
TPU.COMPUTE_DTYPE float32
INPUT.MIN_SIZE_TRAIN (256,) INPUT.MAX_SIZE_TRAIN 384
INPUT.MIN_SIZE_TEST 256 INPUT.MAX_SIZE_TEST 384
SOLVER.IMS_PER_BATCH 4 SOLVER.BASE_LR 0.001 SOLVER.WARMUP_ITERS 0
SOLVER.CHECKPOINT_PERIOD 0 TEST.EVAL_PERIOD 0 SEED 5"

echo "=== 1. base training (60 classes) ==="
python main.py --config-file configs/coco/defrcn_det_r101_base.yaml \
    --opts MODEL.WEIGHTS "" SOLVER.MAX_ITER 5 SOLVER.STEPS "(4,)" \
    OUTPUT_DIR ${SAVE_DIR}/base ${TINY_OPTS}

echo "=== 2. checkpoint surgery (60 -> 80 classes, COCO IDMAP) ==="
python tools/model_surgery.py --dataset coco --method randinit \
    --src-path ${SAVE_DIR}/base/model_final.ckpt --save-dir ${SAVE_DIR}/base

echo "=== 3. create per-seed config ==="
python tools/create_config.py --dataset coco14 --config_root configs/coco \
    --shot 1 --seed 0 --setting gfsod
CONFIG=configs/coco/defrcn_gfsod_r101_novel_1shot_seed0.yaml

echo "=== 4. gfsod fine-tune (80 classes) + PCB eval ==="
OUT=${SAVE_DIR}/1shot_seed0
# PCB on (random torchvision-R101 init, like the VOC smoke): drives the
# COCO branches the VOC smoke can't — prototype build over COCO-format
# k-shot dicts and the 60-base-id clsid_filter exclusion
python main.py --config-file ${CONFIG} \
    --opts MODEL.WEIGHTS ${SAVE_DIR}/base/model_reset_surgery.ckpt \
    SOLVER.MAX_ITER 5 SOLVER.STEPS "(4,)" OUTPUT_DIR ${OUT} \
    TEST.PCB_ENABLE True TEST.PCB_MODELPATH "" ${TINY_OPTS} \
    2>&1 | tee ${OUT}.log
rm ${CONFIG}
# main.py writes OUT/log.txt natively (reference setup_logger parity)
# ending in the copypaste lines extract_results scrapes — no rewrite here
test -f ${OUT}/log.txt

echo "=== 5. aggregate ==="
python tools/extract_results.py --res-dir ${SAVE_DIR} --shot-list 1
cat ${SAVE_DIR}/results.txt
echo "COCO WORKFLOW SMOKE PASSED"
