"""tools/preflight_real_{voc,coco}.py gate logic: accepts structurally-
valid weight files, rejects truncated/alien ones with actionable messages,
and the runbooks exit 1 (without starting anything) when data is missing."""

import importlib.util
import os
import pickle
import subprocess
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

spec = importlib.util.spec_from_file_location(
    "preflight_real_voc", os.path.join(ROOT, "tools", "preflight_real_voc.py")
)
preflight = importlib.util.module_from_spec(spec)
spec.loader.exec_module(preflight)


def _fake_r101_blobs():
    """Minimal structurally-complete Caffe2 R-101 blob dict (names only
    need to translate; preflight checks naming + depth, not values)."""
    blobs = {
        "conv1_w": np.zeros((64, 3, 7, 7), np.float32),
        "res_conv1_bn_s": np.zeros(64, np.float32),
        "res_conv1_bn_b": np.zeros(64, np.float32),
    }
    for stage, n in (("res2", 3), ("res3", 4), ("res4", 23), ("res5", 3)):
        for b in range(n):
            for br in ("branch2a", "branch2b", "branch2c"):
                blobs[f"{stage}_{b}_{br}_w"] = np.zeros((1, 1, 1, 1), np.float32)
                blobs[f"{stage}_{b}_{br}_bn_s"] = np.zeros(1, np.float32)
                blobs[f"{stage}_{b}_{br}_bn_b"] = np.zeros(1, np.float32)
            if b == 0:
                blobs[f"{stage}_{b}_branch1_w"] = np.zeros((1, 1, 1, 1), np.float32)
                blobs[f"{stage}_{b}_branch1_bn_s"] = np.zeros(1, np.float32)
                blobs[f"{stage}_{b}_branch1_bn_b"] = np.zeros(1, np.float32)
    # momentum blobs and the ImageNet classifier head must be tolerated
    blobs["res2_0_branch2a_w_momentum"] = np.zeros(1, np.float32)
    blobs["fc1000_w"] = np.zeros((1000, 2048), np.float32)
    blobs["fc1000_b"] = np.zeros(1000, np.float32)
    return blobs


def test_r101_gate_accepts_valid_pkl(tmp_path):
    p = tmp_path / "R-101.pkl"
    with open(p, "wb") as f:
        pickle.dump({"blobs": _fake_r101_blobs()}, f)
    assert preflight.check_r101_pkl(str(p)) == []


def test_r101_gate_rejects_r50_depth(tmp_path):
    blobs = {
        k: v for k, v in _fake_r101_blobs().items() if "res4_22" not in k
    }
    p = tmp_path / "R-50.pkl"
    with open(p, "wb") as f:
        pickle.dump({"blobs": blobs}, f)
    problems = preflight.check_r101_pkl(str(p))
    assert any("ResNet-101" in m for m in problems)


def test_r101_gate_rejects_alien_blobs(tmp_path):
    blobs = _fake_r101_blobs()
    blobs["mystery_layer_w"] = np.zeros(3, np.float32)
    p = tmp_path / "weird.pkl"
    with open(p, "wb") as f:
        pickle.dump({"blobs": blobs}, f)
    problems = preflight.check_r101_pkl(str(p))
    assert any("do not translate" in m for m in problems)


def test_pcb_gate_flags_missing_keys(tmp_path):
    import torch

    state = {"conv1.weight": torch.zeros(64, 3, 7, 7)}
    p = tmp_path / "pcb.pth"
    torch.save(state, str(p))
    problems = preflight.check_pcb_pth(str(p))
    assert any("manifest keys missing" in m for m in problems)


spec_c = importlib.util.spec_from_file_location(
    "preflight_real_coco", os.path.join(ROOT, "tools", "preflight_real_coco.py")
)
preflight_coco = importlib.util.module_from_spec(spec_c)
spec_c.loader.exec_module(preflight_coco)


def test_coco_image_tree_gate(tmp_path):
    d = tmp_path / "coco" / "trainval2014"
    d.mkdir(parents=True)
    # missing val2014
    assert preflight_coco.check_image_tree(str(tmp_path), "val2014", 3)
    for i in range(4):
        (d / f"COCO_trainval2014_{i:012d}.jpg").touch()
    assert preflight_coco.check_image_tree(str(tmp_path), "trainval2014", 3) == []
    problems = preflight_coco.check_image_tree(str(tmp_path), "trainval2014", 100)
    assert any("synthetic" in m for m in problems)


def test_coco_datasplit_size_gate(tmp_path):
    d = tmp_path / "cocosplit" / "datasplit"
    d.mkdir(parents=True)
    (d / "trainvalno5k.json").write_text("{}")  # truncated
    with open(d / "5k.json", "wb") as f:  # sparse 3 MB: passes the size gate
        f.seek(3_000_000)
        f.write(b"\0")
    problems = preflight_coco.check_datasplit(str(tmp_path))
    assert any("trainvalno5k.json" in m and "truncated" in m for m in problems)
    assert not any("/5k.json" in m.replace(os.sep, "/") for m in problems)
    missing = preflight_coco.check_datasplit(str(tmp_path / "nowhere"))
    assert len(missing) == 2


def test_coco_split_gate_all_80_classes(tmp_path):
    sd = tmp_path / "cocosplit" / "seed0"
    sd.mkdir(parents=True)
    classes = preflight_coco.coco_class_names()
    assert len(classes) == 80 and "traffic light" in classes  # raw names
    for c in classes[:-1]:
        (sd / f"full_box_10shot_{c}_trainval.json").write_text("{}")
    problems = preflight_coco.check_cocosplit(str(tmp_path), 10, [0])
    assert any("1/80" in m for m in problems)
    (sd / f"full_box_10shot_{classes[-1]}_trainval.json").write_text("{}")
    assert preflight_coco.check_cocosplit(str(tmp_path), 10, [0]) == []


def test_coco_runbook_exits_1_without_data(tmp_path):
    (tmp_path / "data").mkdir()
    env = dict(
        os.environ,
        DATA_ROOT=str(tmp_path / "data"),
        IMAGENET_PRETRAIN=str(tmp_path / "no-R-101.pkl"),
        PCB_PRETRAIN=str(tmp_path / "no-pcb.pth"),
    )
    proc = subprocess.run(
        ["bash", "tools/run_real_coco.sh", "10", "0"],
        cwd=ROOT,
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 1
    assert "Preflight FAILED" in proc.stdout
    assert "Base Pre-train" not in proc.stdout


def test_runbook_exits_1_without_data(tmp_path):
    # Point the runbook at an EMPTY data root and nonexistent weights so
    # the gate must trip even on a machine where real VOC data and
    # weights have been provisioned in the default locations — otherwise
    # this test would start an actual base pre-train there.
    (tmp_path / "data").mkdir()
    env = dict(
        os.environ,
        DATA_ROOT=str(tmp_path / "data"),
        IMAGENET_PRETRAIN=str(tmp_path / "no-R-101.pkl"),
        PCB_PRETRAIN=str(tmp_path / "no-pcb.pth"),
    )
    proc = subprocess.run(
        ["bash", "tools/run_real_voc.sh", "1", "10", "0"],
        cwd=ROOT,
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 1
    assert "Preflight FAILED" in proc.stdout
    # the gate must trip BEFORE any training starts
    assert "Base Pre-train" not in proc.stdout
