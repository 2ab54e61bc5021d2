"""Held-out generalization gate as a CI test (VERDICT r2 task 1).

Runs tools/check_generalization.sh (flagship path: base train on 180
train images -> surgery -> gfsod 10-shot fine-tune -> eval on 60
DISJOINT held-out images) with the production regularizers active and
asserts the calibrated held-out floors through TEST.EXPECTED_RESULTS.

This is the one test in the suite where a silently-disabled regularizer
or a wrong gradient contract (GDL BACKWARD_SCALE / FREEZE_FEAT) FAILS —
overfit checks can't see those. It is also the slowest (~12 min on a
1-core host, CPU); the text-family leg and the sabotage discrimination
proof run via the tool (see NOTES round-3 ledger), not here.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_heldout_generalization_gate(tmp_path):
    env = dict(
        os.environ,
        FSODTF_PLATFORM="cpu",
        GEN_SKIP_TEXT="1",
    )
    env.pop("JAX_PLATFORMS", None)
    r = subprocess.run(
        ["bash", "tools/check_generalization.sh", str(tmp_path / "gen")],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=3300,
    )
    tail = (r.stdout + r.stderr)[-4000:]
    assert r.returncode == 0, tail
    assert "GENERALIZATION GATE PASSED" in r.stdout, tail
