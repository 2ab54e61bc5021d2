#!/usr/bin/env bash
# Held-out generalization gate (VERDICT r2 task 1): the full few-shot
# workflow (base train -> surgery -> create_config -> gfsod 10-shot
# fine-tune -> eval) on a LEARNABLE synthetic dataset with a DISJOINT
# held-out val split, with the production regularizers active (cls
# dropout, the GDL BACKWARD_SCALE/FREEZE_FEAT contract, multi-scale
# resize aug, weight-decay groups). Floors are calibrated (2026-08-20,
# CPU tiny profile; see NOTES.md) and asserted with wide margin through
# TEST.EXPECTED_RESULTS, so a silently-disabled regularizer or a wrong
# gradient contract FAILS — unlike the overfit checks, which an
# overfitting-friendly bug can pass.
#
#   bash tools/check_generalization.sh [SAVE_DIR]
#   GEN_SKIP_TEXT=1 ...     # flagship path only (what the CI test runs)
#   GEN_SABOTAGE=1 ...      # discrimination proof: same-seed clean-vs-
#     broken-contract A/B (BACKWARD_SCALE 1.0, FREEZE_FEAT False) must
#     show the sabotaged arm losing >= SAB_MARGIN held-out bAP50.
#
# Reference protocol: run_voc.sh:25-44;
# defrcn/evaluation/pascal_voc_evaluation.py:131-148.
set -e -o pipefail
cd "$(dirname "$0")/.."

SAVE_DIR=${1:-/tmp/check_generalization}
rm -rf ${SAVE_DIR}
mkdir -p ${SAVE_DIR}

DATA_ROOT=${SAVE_DIR}/datasets
export FSODTF_DATASETS=${DATA_ROOT}
python tools/_make_generalization_voc.py --root ${DATA_ROOT} \
    --train-2007 120 --train-2012 60 --val 60 --shots 10 --seed 0

# Calibrated floors (2026-08-20, CPU tiny profile, seed 5 — NOTES
# round-3 ledger: base held-out AP50 92.7 @1200 iters lr 0.01; after
# gfsod fine-tune bAP50 91.7 / nAP50 76.9 @500 iters; an independent
# dataset redraw measured 98.5/53.1). Floors leave >= 20 pts of margin
# for seed/dataset-draw/platform noise while still failing hard on
# regressions like a broken aug/transform or gradient contract.
BASE_AP50_FLOOR=${BASE_AP50_FLOOR:-60}
NOVEL_AP50_FLOOR=${NOVEL_AP50_FLOOR:-30}
BASE_AFTER_FT_FLOOR=${BASE_AFTER_FT_FLOOR:-70}
ITERS_BASE=${ITERS_BASE:-1200}
ITERS_FT=${ITERS_FT:-500}

# Tiny model profile: PRODUCTION regularizers and aug semantics at a
# CI-able scale. No dropout/GDL/score-thresh overrides — those come
# from the real configs.
TINY_OPTS="MODEL.RESNETS.DEPTH 14 MODEL.RESNETS.STEM_OUT_CHANNELS 8
MODEL.RESNETS.RES2_OUT_CHANNELS 16 MODEL.RESNETS.WIDTH_PER_GROUP 4
MODEL.BACKBONE.FREEZE_AT 0
MODEL.RPN.PRE_NMS_TOPK_TRAIN 256 MODEL.RPN.POST_NMS_TOPK_TRAIN 64
MODEL.RPN.PRE_NMS_TOPK_TEST 256 MODEL.RPN.POST_NMS_TOPK_TEST 64
MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE 32
TPU.IMAGE_BUCKETS ((288,384),) TPU.MAX_GT 10 TPU.MAX_DETECTIONS_PRE_NMS 128
TPU.COMPUTE_DTYPE float32
INPUT.MIN_SIZE_TRAIN (224,256,288) INPUT.MAX_SIZE_TRAIN 384
INPUT.MIN_SIZE_TEST 288 INPUT.MAX_SIZE_TEST 384
SOLVER.IMS_PER_BATCH 8
SOLVER.CHECKPOINT_PERIOD 0 SEED 5"

if [ "${GEN_SABOTAGE:-0}" != "1" ]; then
echo "=== 1. base training (15 base classes, held-out eval) ==="
# lr 0.01 + warmup 100: lr 0.02 at this scale is a convergence coin
# flip (a dataset redraw measured AP50 94.8 vs 44.0 at the same seed);
# 0.01 landed 92.7 on the redrawn data (NOTES round-3)
python main.py --config-file configs/voc/defrcn_det_r101_base1.yaml \
    --opts MODEL.WEIGHTS "" SOLVER.MAX_ITER ${ITERS_BASE} \
    SOLVER.STEPS "($((ITERS_BASE*3/4)),$((ITERS_BASE*9/10)))" \
    SOLVER.BASE_LR 0.01 SOLVER.WARMUP_ITERS 100 \
    TEST.EXPECTED_RESULTS "[('bbox','AP50',100.0,$((100-BASE_AP50_FLOOR)))]" \
    OUTPUT_DIR ${SAVE_DIR}/base1 ${TINY_OPTS}

echo "=== 2. checkpoint surgery (15 -> 20 classes) ==="
python tools/model_surgery.py --dataset voc --method randinit \
    --src-path ${SAVE_DIR}/base1/model_final.ckpt --save-dir ${SAVE_DIR}/base1
else
echo "=== sabotage mode: reusing a cached base stage if present ==="
CACHED=${GEN_CACHED_BASE:-}
if [ -n "${CACHED}" ] && [ -f "${CACHED}" ]; then
    mkdir -p ${SAVE_DIR}/base1
    cp ${CACHED} ${SAVE_DIR}/base1/model_reset_surgery.ckpt
else
    python main.py --config-file configs/voc/defrcn_det_r101_base1.yaml \
        --opts MODEL.WEIGHTS "" SOLVER.MAX_ITER ${ITERS_BASE} \
        SOLVER.STEPS "($((ITERS_BASE*3/4)),$((ITERS_BASE*9/10)))" \
        SOLVER.BASE_LR 0.01 SOLVER.WARMUP_ITERS 100 \
        TEST.EVAL_PERIOD 0 DATASETS.TEST "()" \
        OUTPUT_DIR ${SAVE_DIR}/base1 ${TINY_OPTS}
    python tools/model_surgery.py --dataset voc --method randinit \
        --src-path ${SAVE_DIR}/base1/model_final.ckpt \
        --save-dir ${SAVE_DIR}/base1
fi
fi

echo "=== 3. create per-seed config ==="
# write into a throwaway config root: generating under configs/voc would
# race tests that enumerate the shipped tree (and dirty the checkout)
CFG_ROOT=${SAVE_DIR}/cfgs
mkdir -p ${CFG_ROOT}/voc
cp configs/Base-RCNN.yaml ${CFG_ROOT}/
cp configs/voc/defrcn_gfsod_r101_novelx_10shot_seedx.yaml ${CFG_ROOT}/voc/
python tools/create_config.py --dataset voc --config_root ${CFG_ROOT}/voc \
    --shot 10 --seed 0 --setting gfsod --split 1
CONFIG=${CFG_ROOT}/voc/defrcn_gfsod_r101_novel1_10shot_seed0.yaml

FT_GATE="[('bbox','nAP50',100.0,$((100-NOVEL_AP50_FLOOR))),('bbox','bAP50',100.0,$((100-BASE_AFTER_FT_FLOOR)))]"

if [ "${GEN_SABOTAGE:-0}" != "1" ]; then
echo "=== 4. gfsod 10-shot fine-tune (production gradient contract) ==="
OUT=${SAVE_DIR}/10shot_seed0
# PCB off HERE: with no ImageNet weights in this container its prototypes
# are random-feature rescores — pure noise on the floor being pinned.
# PCB-enabled evaluation stays covered by both workflow smokes and the
# on-chip PCB check (NOTES round-3 ledger).
python main.py --config-file ${CONFIG} \
    --opts MODEL.WEIGHTS ${SAVE_DIR}/base1/model_reset_surgery.ckpt \
    SOLVER.MAX_ITER ${ITERS_FT} SOLVER.STEPS "($((ITERS_FT*4/5)),)" \
    SOLVER.BASE_LR 0.01 SOLVER.WARMUP_ITERS 50 OUTPUT_DIR ${OUT} \
    TEST.PCB_ENABLE False \
    TEST.EXPECTED_RESULTS "${FT_GATE}" ${TINY_OPTS} \
    2>&1 | tee ${OUT}.log

if [ "${GEN_SKIP_TEXT:-0}" = "1" ]; then
    echo "GENERALIZATION GATE PASSED (held-out bAP50/nAP50 over floors; text leg skipped)"
    exit 0
fi

echo "=== 5. text-family base training (reference teacher recipe) ==="
# The flagship text contribution on held-out images: GeneralizedTextRCNN
# + TextRes5ROIHeads trained at the BASE stage (run_text_train_teacher.sh
# recipe; TEACHER+STUDENT True, DISTILLATE False = the active pure-CE
# student; glove resolves to the deterministic synthetic fallback).
# NOTE the eval protocol is the REFERENCE'S OWN: test-time GT boxes are
# painted into the text map (rcnn.py:64-67 + its keep-annotations test
# mapper) — GT-LEAKY by design, see PARITY. The gate still catches
# broken fusion/painting/attention wiring (a mis-fused eval scores ~0:
# exactly the round-3 bug this leg caught). Calibrated: AP50 92.3 at
# 1200 CPU iters lr 0.01 (45.9 at the unstable lr-0.02/800 recipe;
# 100.0 at 4000 TPU iters); floor 25.
TEXT_AP50_FLOOR=${TEXT_AP50_FLOOR:-25}
ITERS_TEXT=${ITERS_TEXT:-1200}
OUTT=${SAVE_DIR}/text_base
python main.py --config-file configs/voc/defrcn_det_r101_base1.yaml \
    --opts MODEL.WEIGHTS "" \
    MODEL.META_ARCHITECTURE GeneralizedTextRCNN \
    MODEL.ROI_HEADS.NAME TextRes5ROIHeads \
    MODEL.ADDITION.NAME glove \
    MODEL.ROI_HEADS.TEACHER_TRAINING True \
    MODEL.ROI_HEADS.STUDENT_TRAINING True \
    MODEL.ROI_HEADS.DISTILLATE False \
    SOLVER.MAX_ITER ${ITERS_TEXT} \
    SOLVER.STEPS "($((ITERS_TEXT*3/4)),$((ITERS_TEXT*9/10)))" \
    SOLVER.BASE_LR 0.01 SOLVER.WARMUP_ITERS 100 OUTPUT_DIR ${OUTT} \
    TEST.EXPECTED_RESULTS "[('bbox','AP50',100.0,$((100-TEXT_AP50_FLOOR)))]" \
    ${TINY_OPTS} \
    2>&1 | tee ${OUTT}.log
echo "GENERALIZATION GATE PASSED (held-out floors: flagship base/ft + text)"
else
echo "=== 4S. contract A/B: clean vs sabotaged fine-tune (same seed) ==="
# Discrimination proof for the GDL gradient contract. On this easy
# synthetic task a broken contract degrades held-out base AP by single
# digits (calibrated 2026-08-20: 10-shot clean/sab bAP50 91.7/88.3 and
# 98.5/91.8 on an independent dataset draw; the sabotaged arm's NOVEL
# AP can move either way), not below any noise-safe absolute floor — so
# the proof is a SAME-SEED A/B: the sabotaged run (BACKWARD_SCALE 1.0,
# FREEZE_FEAT False, everything else identical) must lose >= SAB_MARGIN
# held-out bAP50 vs the clean contract (measured deltas 3.5 and 6.7).
SAB_MARGIN=${SAB_MARGIN:-2}
for arm in clean sab; do
    OUT=${SAVE_DIR}/ab_${arm}
    EXTRA=""
    if [ "$arm" = "sab" ]; then
        EXTRA="MODEL.RPN.BACKWARD_SCALE 1.0 MODEL.ROI_HEADS.BACKWARD_SCALE 1.0 MODEL.ROI_HEADS.FREEZE_FEAT False"
    fi
    python main.py --config-file ${CONFIG} \
        --opts MODEL.WEIGHTS ${SAVE_DIR}/base1/model_reset_surgery.ckpt \
        SOLVER.MAX_ITER ${ITERS_FT} SOLVER.STEPS "($((ITERS_FT*4/5)),)" \
        SOLVER.BASE_LR 0.01 SOLVER.WARMUP_ITERS 50 OUTPUT_DIR ${OUT} \
        TEST.PCB_ENABLE False ${EXTRA} ${TINY_OPTS} \
        2>&1 | tee ${OUT}.log
done
python - <<EOF
import re
def bap50(path):
    rows = [l for l in open(path) if "copypaste:" in l and "," in l]
    vals = rows[-1].split("copypaste:")[-1].strip().split(",")
    return float(vals[4])  # AP,AP50,AP75,bAP,bAP50,...
clean = bap50("${SAVE_DIR}/ab_clean.log")
sab = bap50("${SAVE_DIR}/ab_sab.log")
print(f"held-out bAP50: clean={clean:.2f} sabotaged={sab:.2f} "
      f"delta={clean-sab:.2f} (margin ${SAB_MARGIN})")
assert clean - sab >= ${SAB_MARGIN}, "contract sabotage NOT detected"
print("SABOTAGE DETECTED: the gradient contract measurably protects "
      "held-out base AP")
EOF
fi
