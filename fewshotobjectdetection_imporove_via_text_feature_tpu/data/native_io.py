"""ctypes binding for the native data-IO core (csrc/fsodtf_dataio.cpp).

JPEG decode + shortest-edge resize + flip + padded-canvas write run in
C++ (libjpeg + OpenMP) — the native equivalent of the torch-DataLoader
worker pipeline the reference rides on. Auto-builds on first use if the
shared library is missing; falls back cleanly when unavailable (callers
check ``available()``).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading

import numpy as np

logger = logging.getLogger(__name__)

_lock = threading.Lock()
_lib = None
_tried = False

_REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
# FSODTF_NATIVE_LIB: prebuilt-.so override for wheel installs that have no
# repo checkout (csrc/ lives at the repo root, not inside the package)
_SO = os.environ.get(
    "FSODTF_NATIVE_LIB", os.path.join(_REPO, "build", "libfsodtf_dataio.so")
)
_SRC = os.path.join(_REPO, "csrc", "fsodtf_dataio.cpp")


def _build():
    os.makedirs(os.path.dirname(_SO), exist_ok=True)
    cmd = [
        "g++", "-O3", "-fPIC", "-shared", "-fopenmp",
        "-o", _SO, _SRC, "-ljpeg",
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if not os.path.exists(_SO) and os.path.exists(_SRC):
                _build()
            lib = ctypes.CDLL(_SO)
            lib.fsodtf_load_image.restype = ctypes.c_int
            lib.fsodtf_load_image.argtypes = [
                ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
            ]
            lib.fsodtf_load_batch.restype = ctypes.c_int
            _lib = lib
            logger.info("native data-IO core loaded (%s)", _SO)
        except Exception as e:  # missing toolchain/libjpeg: PIL fallback
            logger.warning("native data-IO unavailable (%s); using PIL", e)
            _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def load_image(
    path: str,
    short_edge: int,
    max_size: int,
    out_hw,
    flip: bool = False,
    bgr: bool = True,
):
    """Decode+resize+flip+pad one JPEG natively.

    Returns (canvas float32 (H, W, 3), new_hw (2,), orig_hw (2,)) or None
    when the native core is unavailable or decoding failed (caller falls
    back to PIL).
    """
    lib = _load()
    if lib is None:
        return None
    oh, ow = out_hw
    canvas = np.zeros((oh, ow, 3), np.float32)
    new_hw = np.zeros(2, np.int32)
    orig_hw = np.zeros(2, np.int32)
    rc = lib.fsodtf_load_image(
        path.encode(), int(short_edge), int(max_size), int(oh), int(ow),
        int(bool(flip)), int(bool(bgr)),
        canvas.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        new_hw.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        orig_hw.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    if rc != 0:
        return None
    return canvas, new_hw, orig_hw
