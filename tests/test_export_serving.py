"""AOT serving export (engine/export.py): the serialized artifact's
detections must match DefaultPredictor exactly (shared preprocessing +
same program), across bucket orientations, after a save/load round trip."""

import numpy as np
import pytest

from fewshotobjectdetection_imporove_via_text_feature_tpu.config import get_cfg
from fewshotobjectdetection_imporove_via_text_feature_tpu.engine.export import (
    ServingPredictor,
    export_inference,
    load_serving_artifact,
    save_serving_artifact,
)
from fewshotobjectdetection_imporove_via_text_feature_tpu.engine.predictor import (
    DefaultPredictor,
)

TINY = [
    "MODEL.RESNETS.DEPTH", "14",
    "MODEL.RESNETS.STEM_OUT_CHANNELS", "8",
    "MODEL.RESNETS.RES2_OUT_CHANNELS", "16",
    "MODEL.RESNETS.WIDTH_PER_GROUP", "4",
    "MODEL.RPN.PRE_NMS_TOPK_TEST", "128",
    "MODEL.RPN.POST_NMS_TOPK_TEST", "32",
    "MODEL.ROI_HEADS.NUM_CLASSES", "5",
    "INPUT.MIN_SIZE_TEST", "96",
    "INPUT.MAX_SIZE_TEST", "192",
    "TPU.IMAGE_BUCKETS", "[(128, 192)]",
    "TPU.COMPUTE_DTYPE", "float32",
]


@pytest.fixture(scope="module")
def artifact(tmp_path_factory):
    cfg = get_cfg()
    cfg.merge_from_list(list(TINY))
    pred = DefaultPredictor(cfg)
    meta, programs = export_inference(cfg, pred.params, batch=1)
    path = str(tmp_path_factory.mktemp("srv") / "tiny.fsodtf")
    save_serving_artifact(path, meta, programs, pred.params)
    return cfg, pred, path


def test_artifact_contents(artifact):
    _, _, path = artifact
    meta, params, programs = load_serving_artifact(path)
    # both orientations of the configured bucket, keyed (batch, h, w)
    assert set(programs) == {(1, 128, 192), (1, 192, 128)}
    assert meta["batches"] == [1]
    assert meta["input_format"] == "BGR"
    assert meta["min_size_test"] == 96 and meta["max_size_test"] == 192
    assert any(k.startswith("backbone") for k in params)


def test_legacy_program_names_load(artifact, tmp_path):
    """Pre-multi-batch artifacts named programs {H}x{W}.shlo with the
    batch only in meta — they must keep loading (batch from meta)."""
    import zipfile

    _, _, path = artifact
    legacy = str(tmp_path / "legacy.fsodtf")
    with zipfile.ZipFile(path) as src, zipfile.ZipFile(legacy, "w") as dst:
        for name in src.namelist():
            data = src.read(name)
            if name.startswith("programs/b1_"):
                name = "programs/" + name[len("programs/b1_"):]
            if name == "meta.json":
                import json as _json

                m = _json.loads(data)
                m.pop("batches")
                data = _json.dumps(m)
            dst.writestr(name, data)
    meta, _, programs = load_serving_artifact(legacy)
    assert set(programs) == {(1, 128, 192), (1, 192, 128)}
    assert meta["batches"] == [1]
    serving = ServingPredictor(legacy)
    img = np.random.RandomState(0).randint(0, 256, (100, 150, 3), np.uint8)
    serving(img)  # serves


def test_multibatch_artifact_predict_batch(artifact, tmp_path):
    """--batches 1,4 artifacts serve coalesced requests: predict_batch
    groups by bucket and runs the smallest exported batch that fits;
    results set-match the per-image path."""
    from test_server import assert_detections_setmatch

    cfg, pred, _ = artifact
    meta, programs = export_inference(cfg, pred.params, batch=(1, 4))
    assert meta["batches"] == [1, 4]
    assert len(programs) == 4  # 2 buckets x 2 batch sizes
    p = str(tmp_path / "mb.fsodtf")
    save_serving_artifact(p, meta, programs, pred.params)
    serving = ServingPredictor(p)
    rng = np.random.RandomState(9)
    imgs = [
        rng.randint(0, 256, hw + (3,), dtype=np.uint8)
        for hw in [(100, 150), (150, 100), (90, 140)]
    ]
    outs = serving.predict_batch(imgs)
    for im, out in zip(imgs, outs):
        assert_detections_setmatch(out, serving(im))


@pytest.mark.parametrize("hw0", [(100, 150), (150, 100)])
def test_serving_matches_default_predictor(artifact, hw0):
    cfg, pred, path = artifact
    serving = ServingPredictor(path)
    rng = np.random.RandomState(sum(hw0))
    img = rng.randint(0, 256, (*hw0, 3), dtype=np.uint8)
    a = pred(img)
    b = serving(img)
    assert a["boxes"].shape == b["boxes"].shape
    np.testing.assert_allclose(a["boxes"], b["boxes"], rtol=0, atol=1e-5)
    np.testing.assert_allclose(a["scores"], b["scores"], rtol=0, atol=1e-6)
    np.testing.assert_array_equal(a["classes"], b["classes"])


def test_uncovered_bucket_rejected(artifact):
    _, _, path = artifact
    serving = ServingPredictor(path)
    # forces the round-up-to-64 pick_bucket fallback: min_size_test=96 on a
    # 1:4 strip -> resized (96, 192) is fine, but a huge square resizes to
    # (96, 96)... use a shape whose resize escapes every bucket instead:
    # max_size_test=192 caps the long side, so only the fallback path via a
    # tiny bucket list can trip — simulate by shrinking the program table.
    serving._programs = {
        k: v for k, v in serving._programs.items() if k == (1, 192, 128)
    }
    img = np.zeros((100, 150, 3), np.uint8)  # needs (128, 192)
    with pytest.raises(ValueError, match="re-export"):
        serving(img)


def test_multiplatform_export_runs_on_cpu(artifact):
    """--platforms tpu,cpu artifacts must trace without backend-specific
    custom calls (the Pallas NMS path is forced to the lax implementation)
    and execute on the current (CPU) backend with identical results."""
    cfg, pred, path = artifact
    meta, programs = export_inference(
        cfg, pred.params, batch=1, platforms=("tpu", "cpu")
    )
    assert meta["platforms"] == ["tpu", "cpu"]
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "mp.fsodtf")
        save_serving_artifact(p, meta, programs, pred.params)
        serving = ServingPredictor(p)
        ref = ServingPredictor(path)
        rng = np.random.RandomState(3)
        img = rng.randint(0, 256, (100, 150, 3), dtype=np.uint8)
        a, b = ref(img), serving(img)
        np.testing.assert_allclose(a["boxes"], b["boxes"], rtol=0, atol=1e-5)
        np.testing.assert_array_equal(a["classes"], b["classes"])


def test_single_nontpu_platform_forces_xla_nms(artifact, monkeypatch):
    """A single-platform export whose target is NOT tpu must also force the
    portable XLA NMS — e.g. `--platforms cpu` issued from the TPU box would
    otherwise trace the Mosaic custom call into a cpu-labeled program.
    Simulated here by pinning FSODTF_NMS=pallas (Mosaic cannot lower on
    CPU): the export only succeeds if the tracer overrides it to xla."""
    cfg, pred, _ = artifact
    monkeypatch.setenv("FSODTF_NMS", "pallas")
    meta, programs = export_inference(
        cfg, pred.params, batch=1, platforms=("cpu",)
    )
    assert meta["platforms"] == ["cpu"]
    assert len(programs) == 2


def test_text_family_export_serves(tmp_path):
    """Serving export of a TEXT-family model (TextRes5ROIHeads student
    inference). The text modules carry numpy class-embedding attributes
    that make them unhashable — the class of model that crashed the
    evaluator's jit cache in an earlier round (NOTES.md session-8); the
    export tracer must not depend on module hashability either."""
    cfg = get_cfg()
    cfg.merge_from_list(list(TINY) + [
        "MODEL.ROI_HEADS.NUM_CLASSES", "15",
        "MODEL.ROI_HEADS.NAME", "TextRes5ROIHeads",
        "MODEL.ROI_HEADS.STUDENT_TRAINING", "True",
        "MODEL.ADDITION.NAME", "glove",
        "DATASETS.TRAIN", "('voc_2007_trainval_base1',)",
    ])
    pred = DefaultPredictor(cfg)
    meta, programs = export_inference(cfg, pred.params, batch=1)
    path = str(tmp_path / "text.fsodtf")
    save_serving_artifact(path, meta, programs, pred.params)
    serving = ServingPredictor(path)
    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, (100, 150, 3), dtype=np.uint8)
    a, b = pred(img), serving(img)
    np.testing.assert_allclose(a["boxes"], b["boxes"], rtol=0, atol=1e-5)
    np.testing.assert_allclose(a["scores"], b["scores"], rtol=0, atol=1e-6)
    np.testing.assert_array_equal(a["classes"], b["classes"])


def test_batch_mismatch_rejected(artifact):
    cfg, pred, _ = artifact
    meta, programs = export_inference(cfg, pred.params, batch=2)
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "b2.fsodtf")
        save_serving_artifact(p, meta, programs, pred.params)
        with pytest.raises(ValueError, match="batch-1"):
            ServingPredictor(p)


def test_spatial_partition_rejected_by_export(artifact):
    """TPU.SPATIAL_PARTITION must fail loudly: jax.export emits
    single-device programs, so exporting would silently serve
    unpartitioned (the knob serves through DefaultPredictor only)."""
    cfg, pred, _ = artifact
    cfg2 = cfg.clone()
    cfg2.TPU.SPATIAL_PARTITION = 2
    with pytest.raises(ValueError, match="SPATIAL_PARTITION"):
        export_inference(cfg2, pred.params, batch=1)
