"""HTTP detection service over a predictor (live model or serving artifact).

The reference's serving story ends at ``DefaultPredictor``
(defrcn/engine/defaults.py:131-192) — an in-process Python object the
caller must embed. A production TPU deployment wants a network-facing
endpoint; this module wraps either predictor flavor (``DefaultPredictor``
or ``engine.export.ServingPredictor``) in a dependency-free HTTP service
(stdlib ``http.server``). Beyond-reference capability; documented in
docs/migration_from_reference.md ("Serving").

Endpoints:
    GET  /healthz   liveness + request counter
    GET  /meta      input contract (resize bounds, class names if known)
    POST /detect    body = an encoded image (anything PIL decodes: JPEG,
                    PNG, ...); response = JSON {"boxes": [[x1,y1,x2,y2]...]
                    (original-image coords), "scores": [...],
                    "classes": [...], "class_names": [...] when known}

Images decode via PIL to RGB and are handed to the predictor in its BGR
convention (``preprocess_single_image``). Requests run under a lock: the
chip executes one program at a time anyway, and serialized execution keeps
per-request latency honest instead of interleaving device dispatches.
"""

from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional, Sequence

import numpy as np

__all__ = ["DetectionServer"]


class DetectionServer:
    """Serve ``predictor`` (any callable: BGR uint8 HxWx3 -> dict with
    numpy "boxes"/"scores"/"classes") over HTTP.

    ``port=0`` binds an ephemeral port (read ``.port`` after construction).
    ``start()`` runs in a daemon thread; ``serve_forever()`` blocks.
    """

    def __init__(
        self,
        predictor,
        host: str = "127.0.0.1",
        port: int = 8080,
        class_names: Optional[Sequence[str]] = None,
        meta: Optional[dict] = None,
    ):
        self._predictor = predictor
        self._lock = threading.Lock()
        self._served = 0
        self._class_names = list(class_names) if class_names else None
        self._meta = dict(meta or {})
        outer = self

        class _Handler(BaseHTTPRequestHandler):
            # stdlib default logs every request to stderr; route through
            # our logger-free counter instead (the access log is the
            # caller's concern)
            def log_message(self, fmt, *args):  # noqa: D401
                pass

            def _json(self, code: int, payload: dict):
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/healthz":
                    self._json(
                        200, {"status": "ok", "requests_served": outer._served}
                    )
                elif self.path == "/meta":
                    meta = dict(outer._meta)
                    if outer._class_names:
                        meta["class_names"] = outer._class_names
                    self._json(200, meta)
                else:
                    self._json(404, {"error": f"no route {self.path!r}"})

            def do_POST(self):
                if self.path != "/detect":
                    self._json(404, {"error": f"no route {self.path!r}"})
                    return
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    raw = self.rfile.read(n)
                    from PIL import Image, ImageOps

                    img = Image.open(io.BytesIO(raw))
                    # apply EXIF orientation like every other decode path
                    # (data/mapper._open_oriented; the reference's
                    # cv2.imread applies it too) — phone-camera JPEGs
                    # would otherwise be detected sideways
                    img = ImageOps.exif_transpose(img).convert("RGB")
                    bgr = np.asarray(img, np.uint8)[:, :, ::-1]
                except Exception as e:  # undecodable payload
                    self._json(400, {"error": f"could not decode image: {e}"})
                    return
                try:
                    with outer._lock:
                        det = outer._predictor(bgr)
                        outer._served += 1
                except ValueError as e:
                    # predictor contract errors (e.g. an artifact missing
                    # the needed bucket) are the client's 422, not a 500
                    self._json(422, {"error": str(e)})
                    return
                except Exception as e:  # anything else: an honest 500
                    # (a raw socketserver traceback closes the connection
                    # mid-request — curl would see a reset, no error body)
                    self._json(
                        500, {"error": f"{type(e).__name__}: {e}"}
                    )
                    return
                classes = np.asarray(det["classes"]).tolist()
                payload = {
                    "boxes": np.asarray(det["boxes"], np.float64).tolist(),
                    "scores": np.asarray(det["scores"], np.float64).tolist(),
                    "classes": classes,
                }
                if outer._class_names:
                    payload["class_names"] = [
                        outer._class_names[c]
                        if 0 <= c < len(outer._class_names)
                        else str(c)
                        for c in classes
                    ]
                self._json(200, payload)

        self._httpd = ThreadingHTTPServer((host, port), _Handler)
        self.host, self.port = self._httpd.server_address[:2]
        self._thread: Optional[threading.Thread] = None

    def start(self):
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()
        return self

    def serve_forever(self):
        self._httpd.serve_forever()

    def stop(self):
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread is not None:
            self._thread.join(timeout=5)
