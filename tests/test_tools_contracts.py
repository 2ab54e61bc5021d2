"""Unit contracts for the workflow tools the run scripts depend on:
tools/create_config.py (string-templated per-(shot, seed, split) configs,
ref tools/create_config.py:30-58) and tools/extract_results.py (copypaste
scrape -> mean ± 1.96·σ/√n table, ref tools/extract_results.py:8-58).
Previously only exercised through the end-to-end smokes."""

import math
import os
import shutil
import subprocess
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, cwd=ROOT):
    proc = subprocess.run(
        [sys.executable] + args, cwd=cwd, capture_output=True, text=True,
        timeout=120,
    )
    assert proc.returncode == 0, proc.stderr
    return proc.stdout


def test_create_config_voc_gfsod(tmp_path):
    cfg_root = tmp_path / "voc"
    cfg_root.mkdir()
    for tpl in (
        "defrcn_gfsod_r101_novelx_10shot_seedx.yaml",
        "Base-RCNN.yaml",
    ):
        src = os.path.join(
            ROOT, "configs", "voc" if "novelx" in tpl else "", tpl
        )
        if os.path.exists(src):
            shutil.copy(src, cfg_root / tpl)
    _run([
        "tools/create_config.py", "--dataset", "voc",
        "--config_root", str(cfg_root), "--shot", "10", "--seed", "3",
        "--setting", "gfsod", "--split", "2",
    ])
    out = cfg_root / "defrcn_gfsod_r101_novel2_10shot_seed3.yaml"
    assert out.exists()
    text = out.read_text()
    assert 'TRAIN: ("voc_2007_trainval_all2_10shot_seed3", )' in text
    assert 'TEST: ("voc_2007_test_all2",)' in text
    # fsod flavor names the novel split instead
    _run([
        "tools/create_config.py", "--dataset", "voc",
        "--config_root", str(cfg_root), "--shot", "10", "--seed", "0",
        "--setting", "fsod", "--split", "2",
    ]) if (cfg_root / "defrcn_fsod_r101_novelx_10shot_seedx.yaml").exists() \
        else shutil.copy(
            os.path.join(
                ROOT, "configs/voc/defrcn_fsod_r101_novelx_10shot_seedx.yaml"
            ),
            cfg_root / "defrcn_fsod_r101_novelx_10shot_seedx.yaml",
        )
    _run([
        "tools/create_config.py", "--dataset", "voc",
        "--config_root", str(cfg_root), "--shot", "10", "--seed", "0",
        "--setting", "fsod", "--split", "2",
    ])
    text = (cfg_root / "defrcn_fsod_r101_novel2_10shot_seed0.yaml").read_text()
    assert 'TRAIN: ("voc_2007_trainval_novel2_10shot_seed0", )' in text
    assert 'TEST: ("voc_2007_test_novel2",)' in text


def test_extract_results_aggregates_copypaste(tmp_path):
    header = "AP,AP50,AP75,bAP50,nAP50"
    vals = {
        0: [40.0, 60.0, 44.0, 65.0, 50.0],
        1: [42.0, 62.0, 46.0, 67.0, 54.0],
        2: [44.0, 64.0, 48.0, 69.0, 58.0],
    }
    for seed, v in vals.items():
        d = tmp_path / f"10shot_seed{seed}"
        d.mkdir()
        (d / "log.txt").write_text(
            "noise line\n"
            f"... copypaste: {header}\n"
            f"... copypaste: {','.join(str(x) for x in v)}\n"
            # a TEST.EXPECTED_RESULTS run logs this AFTER the CSV — the
            # scraper must key on 'copypaste:', not the last two lines
            "... INFO: Result verification passed.\n"
        )
    # a 1-shot run dir must NOT leak into the 10-shot table
    other = tmp_path / "1shot_seed0"
    other.mkdir()
    (other / "log.txt").write_text(
        f"copypaste: {header}\ncopypaste: 1,1,1,1,1\n"
    )

    _run([
        "tools/extract_results.py", "--res-dir", str(tmp_path),
        "--shot-list", "10",
    ])
    table = (tmp_path / "results.txt").read_text()
    arr = np.array(list(vals.values()))
    mean = arr.mean(axis=0)
    ci = 1.96 * arr.std(axis=0) / math.sqrt(3)
    assert "--> 10-shot" in table
    assert "nAP50" in table
    assert f"{mean[4]:.2f}" in table  # 54.00
    assert f"{ci[4]:.2f}" in table
    assert "1.00" not in table  # 1-shot rows excluded


def test_bench_watchdog_fire_and_disarm():
    """bench.py's relay watchdog: without progress beats it prints the
    null-value error JSON and exits 3; with beats/disarm it stays silent."""
    import json
    import textwrap

    code = textwrap.dedent("""
        import json, time, sys
        src = open(%r).read()
        cls = src[src.index('class _Watchdog'):src.index('def main(')]
        ns = {'json': json, 'time': time}
        exec(cls, ns)
        mode = sys.argv[1]
        # 10x headroom between beat cadence and timeout: the suite runs
        # under heavy CI load and tighter margins made the beat half flaky
        w = ns['_Watchdog'](timeout_s=2.0)
        if mode == 'fire':
            time.sleep(20)  # watchdog should _exit(3) long before this
            print('not reached')
        elif mode == 'partial':
            w.set_partial({'metric': 'm', 'value': 42.0})
            time.sleep(20)  # watchdog emits the partial record, exit 0
            print('not reached')
        else:
            for _ in range(6):
                time.sleep(0.2)
                w.beat()
            w.disarm()
            print('survived')
    """) % (os.path.join(ROOT, "bench.py"),)
    fire = subprocess.run(
        [sys.executable, "-c", code, "fire"],
        capture_output=True, text=True, timeout=60,
    )
    assert fire.returncode == 3, (fire.returncode, fire.stdout)
    rec = json.loads(fire.stdout.strip().splitlines()[-1])
    assert rec["value"] is None and "unresponsive" in rec["error"]

    # a stall AFTER the headline metric was measured must emit the
    # measured record (rc 0), never the null artifact
    part = subprocess.run(
        [sys.executable, "-c", code, "partial"],
        capture_output=True, text=True, timeout=60,
    )
    assert part.returncode == 0, (part.returncode, part.stdout)
    rec = json.loads(part.stdout.strip().splitlines()[-1])
    assert rec["value"] == 42.0 and "stalled" in rec["error"]
    assert "not reached" not in part.stdout

    ok = subprocess.run(
        [sys.executable, "-c", code, "beat"],
        capture_output=True, text=True, timeout=60,
    )
    assert ok.returncode == 0 and "survived" in ok.stdout


def test_bench_text_recipe_matches_cited_script():
    """bench.build_text must construct exactly the recipe its docstring
    cites (run_text_train_teacher_novel.sh student stage): TextRes5ROIHeads
    student, DISTILLATE with KL on (schema default) and L2 OFF."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(ROOT, "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    m = bench.build_text()
    assert m.roi_heads_name == "TextRes5ROIHeads"
    assert m.distill_kl is True
    assert m.distill_l2 is False
    assert m.num_classes == 15
    assert float(m.kl_temp) == 5.0


def test_setup_compilation_cache(tmp_path, monkeypatch):
    """The CLI persists jit compiles across processes (the few-shot
    workflow re-launches main.py per shot/seed/stage); env overrides the
    location and an empty value disables."""
    import jax

    from fewshotobjectdetection_imporove_via_text_feature_tpu import cli

    # restore the process-global cache config afterwards — conftest points
    # it at the persistent /tmp/fsodtf_jax_cache that keeps the rest of
    # the suite warm; leaking the tmp dir would cold-compile everything
    # that runs after this test
    prev_dir = jax.config.jax_compilation_cache_dir
    prev_min = jax.config.jax_persistent_cache_min_compile_time_secs
    try:
        monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", str(tmp_path / "jc"))
        cli._setup_compilation_cache()
        assert jax.config.jax_compilation_cache_dir == str(tmp_path / "jc")
        assert jax.config.jax_persistent_cache_min_compile_time_secs == 1.0

        monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", "")
        jax.config.update("jax_compilation_cache_dir", str(tmp_path / "keep"))
        cli._setup_compilation_cache()  # disabled: must not touch config
        assert jax.config.jax_compilation_cache_dir == str(tmp_path / "keep")
    finally:
        jax.config.update("jax_compilation_cache_dir", prev_dir)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", prev_min
        )


def test_resolve_eval_iter_checkpoint(tmp_path):
    """--eval-iter N accepts both the exact name and the 0-based periodic
    name N-1, preferring the exact one; missing -> FileNotFoundError."""
    import pytest

    import main as cli

    d = str(tmp_path)
    open(os.path.join(d, "model_0000999.ckpt"), "w").close()
    # the period-multiple the flag is naturally used with
    assert cli.resolve_eval_iter_checkpoint(d, 1000).endswith(
        "model_0000999.ckpt"
    )
    # exact name wins when both exist
    open(os.path.join(d, "model_0001000.ckpt"), "w").close()
    assert cli.resolve_eval_iter_checkpoint(d, 1000).endswith(
        "model_0001000.ckpt"
    )
    # orbax directory checkpoints resolve too
    os.makedirs(os.path.join(d, "model_0001999.orbax"))
    assert cli.resolve_eval_iter_checkpoint(d, 2000).endswith(
        "model_0001999.orbax"
    )
    with pytest.raises(FileNotFoundError):
        cli.resolve_eval_iter_checkpoint(d, 500)


def test_validate_all_script_contract():
    """tools/validate_all.sh must be syntactically valid and every repo
    script/tool it invokes must exist (the ledger is only useful if it
    can't silently drift from the artifacts it claims to run)."""
    import re

    path = os.path.join(ROOT, "tools", "validate_all.sh")
    subprocess.run(["bash", "-n", path], check=True)
    src = open(path).read()
    referenced = re.findall(r"(?:bash |python )((?:tools/|bench)\S+\.(?:sh|py))", src)
    assert len(referenced) >= 5  # smokes, parity, bench, overfit
    for rel in set(referenced):
        assert os.path.isfile(os.path.join(ROOT, rel)), rel
    # the driver-checked entry must be invoked exactly as the driver does
    assert "dryrun_multichip(8)" in src
