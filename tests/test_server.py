"""HTTP detection service (engine/server.py): responses must match the
wrapped predictor exactly; contract errors surface as HTTP codes, not 500s."""

import io
import json
import urllib.error
import urllib.request

import numpy as np
import pytest
from PIL import Image

from fewshotobjectdetection_imporove_via_text_feature_tpu.config import get_cfg
from fewshotobjectdetection_imporove_via_text_feature_tpu.engine.export import (
    ServingPredictor,
    export_inference,
    save_serving_artifact,
)
from fewshotobjectdetection_imporove_via_text_feature_tpu.engine.predictor import (
    DefaultPredictor,
)
from fewshotobjectdetection_imporove_via_text_feature_tpu.engine.server import (
    DetectionServer,
)

from test_export_serving import TINY


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    cfg = get_cfg()
    cfg.merge_from_list(list(TINY))
    pred = DefaultPredictor(cfg)
    server = DetectionServer(
        pred, port=0, class_names=[f"c{i}" for i in range(5)],
        meta={"num_classes": 5},
    ).start()
    yield pred, server
    server.stop()


def _url(server, path):
    return f"http://{server.host}:{server.port}{path}"


def _post(server, body, path="/detect"):
    req = urllib.request.Request(_url(server, path), data=body, method="POST")
    with urllib.request.urlopen(req) as r:
        return json.loads(r.read())


def _png(arr_rgb):
    buf = io.BytesIO()
    Image.fromarray(arr_rgb).save(buf, format="PNG")
    return buf.getvalue()


def test_detect_matches_predictor(served):
    pred, server = served
    rng = np.random.RandomState(0)
    rgb = rng.randint(0, 256, (100, 150, 3), dtype=np.uint8)
    out = _post(server, _png(rgb))
    # PNG is lossless: the server-decoded image is bit-identical to what
    # the predictor sees directly (BGR convention)
    ref = pred(rgb[:, :, ::-1])
    np.testing.assert_allclose(out["boxes"], ref["boxes"], rtol=0, atol=1e-5)
    np.testing.assert_allclose(out["scores"], ref["scores"], rtol=0, atol=1e-6)
    np.testing.assert_array_equal(out["classes"], ref["classes"])
    assert out["class_names"] == [f"c{c}" for c in ref["classes"]]


def test_health_meta_and_counter(served):
    _, server = served
    with urllib.request.urlopen(_url(server, "/healthz")) as r:
        h = json.loads(r.read())
    assert h["status"] == "ok" and h["requests_served"] >= 1
    with urllib.request.urlopen(_url(server, "/meta")) as r:
        m = json.loads(r.read())
    assert m["num_classes"] == 5 and m["class_names"][0] == "c0"


def test_bad_payload_is_400(served):
    _, server = served
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server, b"this is not an image")
    assert e.value.code == 400
    assert "decode" in json.loads(e.value.read())["error"]


def test_exif_orientation_applied(served):
    """Phone-camera JPEGs carry EXIF Orientation; the server must detect
    on the DISPLAYED pixels like every other decode path in the repo
    (data/mapper._open_oriented) and the reference's cv2.imread."""
    pred, server = served
    rng = np.random.RandomState(2)
    displayed = rng.randint(0, 256, (100, 150, 3), dtype=np.uint8)
    # store the image rotated 90° CW with Orientation=6 ("rotate 90 CW to
    # display"): exif_transpose(stored, o=6) == displayed
    stored = np.rot90(displayed, k=1)  # CCW: undoes the viewer's CW
    exif = Image.Exif()
    exif[0x0112] = 6
    buf = io.BytesIO()
    Image.fromarray(stored).save(buf, format="PNG", exif=exif)
    out = _post(server, buf.getvalue())
    ref = pred(displayed[:, :, ::-1])
    np.testing.assert_allclose(out["boxes"], ref["boxes"], rtol=0, atol=1e-5)
    np.testing.assert_array_equal(out["classes"], ref["classes"])


def test_internal_error_is_500(served):
    """A non-contract predictor failure must come back as an HTTP 500 with
    a JSON body, not a dropped connection."""
    _, server = served
    real = server._predictor

    def boom(_):
        raise RuntimeError("device exploded")

    server._predictor = boom
    try:
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(server, _png(np.zeros((60, 80, 3), np.uint8)))
        assert e.value.code == 500
        assert "device exploded" in json.loads(e.value.read())["error"]
    finally:
        server._predictor = real


def test_oversized_body_is_413():
    server = DetectionServer(
        lambda im: {}, port=0, max_body_bytes=1000
    ).start()
    try:
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(server, b"x" * 2000)
        assert e.value.code == 413
        assert "limit" in json.loads(e.value.read())["error"]
    finally:
        server.stop()


def test_unknown_route_is_404(served):
    _, server = served
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server, b"x", path="/nope")
    assert e.value.code == 404


def _iou(a, b):
    ix1, iy1 = max(a[0], b[0]), max(a[1], b[1])
    ix2, iy2 = min(a[2], b[2]), min(a[3], b[3])
    inter = max(0.0, ix2 - ix1) * max(0.0, iy2 - iy1)
    area = lambda r: max(0.0, r[2] - r[0]) * max(0.0, r[3] - r[1])
    return inter / max(area(a) + area(b) - inter, 1e-9)


def assert_detections_setmatch(out, ref, iou=0.9, score_atol=1e-3):
    """Batch-1 and batch-N are DIFFERENT compiled programs; with untrained
    near-tied scores, fusion-level float diffs reorder ties in top-k/NMS
    (NOTES.md numerics-drive caveat). The stable contract is the detection
    SET: same count, and a 1:1 class/IoU/score matching."""
    boxes_o, boxes_r = np.asarray(out["boxes"]), np.asarray(ref["boxes"])
    assert len(boxes_o) == len(boxes_r)
    used = set()
    for bo, so, co in zip(boxes_o, out["scores"], out["classes"]):
        hit = None
        for j, (br, sr, cr) in enumerate(
            zip(boxes_r, ref["scores"], ref["classes"])
        ):
            if (
                j not in used
                and cr == co
                and abs(sr - so) < score_atol
                and _iou(bo, br) > iou
            ):
                hit = j
                break
        assert hit is not None, (bo, so, co)
        used.add(hit)


def test_predict_batch_matches_single(served):
    """DefaultPredictor.predict_batch: grouped-by-bucket batched programs
    must reproduce per-image __call__ (as a detection set — see
    assert_detections_setmatch) incl. mixed orientations and the
    pad-to-BATCH_SIZES row replication."""
    pred, _ = served
    rng = np.random.RandomState(4)
    imgs = [
        rng.randint(0, 256, hw + (3,), dtype=np.uint8)
        for hw in [(100, 150), (150, 100), (90, 140), (100, 150), (150, 100)]
    ]
    batched = pred.predict_batch(imgs)
    for im, out in zip(imgs, batched):
        assert_detections_setmatch(out, pred(im))


def test_dynamic_batching_groups_requests(served):
    """max_batch>1: concurrent requests coalesce into predict_batch calls
    (fewer calls than requests) and every caller gets its own result."""
    import threading

    pred, _ = served
    calls = []

    class Spy:
        def predict_batch(self, images):
            calls.append(len(images))
            return pred.predict_batch(images)

    server = DetectionServer(Spy(), port=0, max_batch=4,
                             batch_window_ms=1000.0).start()
    try:
        rng = np.random.RandomState(5)
        imgs = [
            rng.randint(0, 256, (100, 150, 3), dtype=np.uint8)
            for _ in range(4)
        ]
        outs = [None] * 4
        errs = []

        def post(k):
            try:
                outs[k] = _post(server, _png(imgs[k]))
            except Exception as e:  # pragma: no cover - surfaced below
                errs.append(e)

        threads = [threading.Thread(target=post, args=(k,)) for k in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errs
        assert sum(calls) == 4
        assert len(calls) < 4 and max(calls) >= 2  # genuinely coalesced
        for k in range(4):
            assert_detections_setmatch(outs[k], pred(imgs[k][:, :, ::-1]))
        with urllib.request.urlopen(_url(server, "/healthz")) as r:
            assert json.loads(r.read())["requests_served"] == 4
    finally:
        server.stop()


def test_batched_error_propagates_to_all_waiters(served):
    import threading

    class Boom:
        def predict_batch(self, images):
            raise RuntimeError("batch exploded")

    server = DetectionServer(Boom(), port=0, max_batch=2,
                             batch_window_ms=500.0).start()
    try:
        codes = []

        def post():
            try:
                _post(server, _png(np.zeros((60, 80, 3), np.uint8)))
            except urllib.error.HTTPError as e:
                codes.append(e.code)

        threads = [threading.Thread(target=post) for _ in range(2)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert codes == [500, 500]
    finally:
        server.stop()


def test_max_batch_needs_predict_batch():
    with pytest.raises(ValueError, match="predict_batch"):
        DetectionServer(lambda im: {}, port=0, max_batch=4)


def test_artifact_backed_server(tmp_path):
    """ServingPredictor behind the same endpoint; a bucket miss maps to
    HTTP 422 (client contract error), not a 500."""
    cfg = get_cfg()
    cfg.merge_from_list(list(TINY))
    pred = DefaultPredictor(cfg)
    meta, programs = export_inference(cfg, pred.params, batch=1)
    path = str(tmp_path / "srv.fsodtf")
    save_serving_artifact(path, meta, programs, pred.params)
    serving = ServingPredictor(path)
    server = DetectionServer(serving, port=0).start()
    try:
        rng = np.random.RandomState(1)
        rgb = rng.randint(0, 256, (100, 150, 3), dtype=np.uint8)
        out = _post(server, _png(rgb))
        ref = serving(rgb[:, :, ::-1])
        np.testing.assert_allclose(
            out["boxes"], ref["boxes"], rtol=0, atol=1e-5
        )
        # drop the needed bucket: the predictor's ValueError -> 422
        serving._programs = {
            k: v for k, v in serving._programs.items() if k == (1, 192, 128)
        }
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(server, _png(rgb))
        assert e.value.code == 422
        assert "re-export" in json.loads(e.value.read())["error"]
    finally:
        server.stop()
