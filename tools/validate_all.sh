#!/usr/bin/env bash
# One-command validation ledger: runs the standing validation artifacts
# (README "Beyond the suite" table) and prints PASS/FAIL per item.
#
#   bash tools/validate_all.sh           # quick: smokes + dryrun + parity + bench
#   bash tools/validate_all.sh --full    # + full pytest suite + production overfit
#
# Quick mode needs ~15 min on a 1-core host (plus TPU availability for the
# parity/bench steps — they are skipped with a warning off-TPU). --full adds
# the ~15-min CPU suite and a ~10-min TPU overfit run.
set -u
cd "$(dirname "$0")/.."

FULL=0
[ "${1:-}" = "--full" ] && FULL=1

declare -a RESULTS=()
FAILED=0

run_step() {
    local name="$1"; shift
    echo
    echo "=== ${name} ==="
    if "$@"; then
        RESULTS+=("PASS  ${name}")
    else
        RESULTS+=("FAIL  ${name}")
        FAILED=1
    fi
}

has_tpu() {
    python - <<'EOF'
import sys
import jax
sys.exit(0 if any(d.platform == "tpu" for d in jax.devices()) else 1)
EOF
}

# CPU-side artifacts (always run; force the CPU platform so a busy or
# absent TPU can't stall them)
run_step "VOC workflow smoke" \
    env FSODTF_PLATFORM=cpu timeout 3000 bash tools/smoke_workflow.sh /tmp/validate_voc
run_step "COCO workflow smoke" \
    env FSODTF_PLATFORM=cpu timeout 3000 bash tools/smoke_workflow_coco.sh /tmp/validate_coco
run_step "dryrun_multichip(8)" \
    timeout 1200 python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"

if [ "$FULL" = 1 ]; then
    run_step "full pytest suite" \
        timeout 3600 python -m pytest tests/ -q
    # held-out generalization gates (~60-80 min CPU on a 1-core host:
    # all VOC legs incl. the round-5 PCB-effect leg, plus the COCO gate).
    # The gate-marked pytest tests cover the same paths but are
    # deselected from the default suite (pyproject addopts).
    run_step "held-out generalization gate (VOC)" \
        env FSODTF_PLATFORM=cpu timeout 7200 \
        bash tools/check_generalization.sh /tmp/validate_gen
    run_step "held-out generalization gate (COCO)" \
        env FSODTF_PLATFORM=cpu timeout 4500 \
        bash tools/check_generalization_coco.sh /tmp/validate_gen_coco
fi

# TPU-side artifacts
if has_tpu; then
    run_step "on-chip kernel parity" \
        timeout 1800 python tools/tpu_kernel_parity.py
    # bench samples gapped rounds until it sees quiet windows; a TPU
    # contention burst can stretch it well past its usual ~7 min (its own
    # watchdog handles a dead relay — give contention room before the
    # hard kill)
    run_step "bench (one JSON line)" \
        timeout 2400 python bench.py
    if [ "$FULL" = 1 ]; then
        run_step "production overfit (R-101 on TPU)" \
            timeout 3600 python tools/overfit_map_check.py --production
    fi
else
    echo
    echo "WARNING: no TPU backend — skipped kernel parity / bench steps"
    RESULTS+=("SKIP  on-chip kernel parity (no TPU)")
    RESULTS+=("SKIP  bench (no TPU)")
fi

echo
echo "================ validation ledger ================"
for r in "${RESULTS[@]}"; do echo "  $r"; done
echo "==================================================="
exit ${FAILED}
