"""Multi-seed x multi-shot statistical protocol as a CI test (VERDICT r4
task 2): one subprocess run of tools/run_stats_protocol.sh drives the
reference's flagship experiment loop END TO END at CI scale —

  shared base train -> randinit surgery -> per-(shot in {1, 10},
  seed in {0, 1, 2}) create_config -> gfsod fine-tune -> eval ->
  results/{K}shot_seed{S}/log.txt -> tools/extract_results.py
  aggregation (mean +/- 1.96*sigma/sqrt(n), run_voc.sh:25-44) with the
  aggregation contract asserted (every per-seed copypaste line scraped,
  means finite, CI sane, bAP/nAP columns present)

— and feeds the same per-seed 10-shot runs into the PAIRED MULTI-SEED
sabotage A/B: mean held-out strict-bAP delta over the 3 k-shot draws
must clear MEAN_SAB_MARGIN (the robust replacement for the single-seed
SAB_MARGIN assert; round-4 per-draw deltas 7.8/16.8/4.2).

Slowest test in the suite (~10 tiny training runs; roughly an hour on a
1-core host). Marked `gate` and deselected by default — run with
`pytest tests/ -m gate`.
"""

import os
import subprocess

import pytest

pytestmark = pytest.mark.gate  # deselected by default (pyproject addopts)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_multiseed_stats_protocol_with_paired_ab(tmp_path):
    env = dict(os.environ, FSODTF_PLATFORM="cpu", STATS_AB="1")
    env.pop("JAX_PLATFORMS", None)
    r = subprocess.run(
        ["bash", "tools/run_stats_protocol.sh", str(tmp_path / "stats")],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=10800,
    )
    tail = (r.stdout + r.stderr)[-8000:]
    assert r.returncode == 0, tail
    assert "STATS AGGREGATION OK" in r.stdout, tail
    assert "PAIRED MULTI-SEED SABOTAGE DETECTED" in r.stdout, tail
    assert "STATS PROTOCOL PASSED" in r.stdout, tail
