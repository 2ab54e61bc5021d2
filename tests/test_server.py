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


def test_unknown_route_is_404(served):
    _, server = served
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server, b"x", path="/nope")
    assert e.value.code == 404


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
            k: v for k, v in serving._programs.items() if k == (192, 128)
        }
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(server, _png(rgb))
        assert e.value.code == 422
        assert "re-export" in json.loads(e.value.read())["error"]
    finally:
        server.stop()
