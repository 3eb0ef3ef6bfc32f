"""ctypes bridge to the native sample-prep library (native/sampleprep.cpp).

Compiled on first use with g++ (cached next to the source); every entry point
has a numpy fallback so the package works without a toolchain.  Disable with
SEMSTEREO_NATIVE=0.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "sampleprep.cpp")
_SO = os.path.join(_REPO_ROOT, "native", "libsampleprep.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if os.environ.get("SEMSTEREO_NATIVE", "1") == "0":
            return None
        try:
            if (not os.path.exists(_SO)) or (
                os.path.exists(_SRC)
                and os.path.getmtime(_SRC) > os.path.getmtime(_SO)
            ):
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC, "-o", _SO],
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(_SO)
            lib.normalize_image_u8.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ]
            lib.downsample_nearest_f32.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def normalize_image(img: np.ndarray, mean: np.ndarray, std: np.ndarray) -> np.ndarray | None:
    """uint8 [H,W,3] -> normalized float32, or None if native is unavailable."""
    lib = _load()
    if lib is None or img.dtype != np.uint8 or not img.flags.c_contiguous:
        return None
    h, w, c = img.shape
    assert c == 3
    out = np.empty((h, w, 3), np.float32)
    m = np.ascontiguousarray(mean, np.float32)
    s = np.ascontiguousarray(std, np.float32)
    lib.normalize_image_u8(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        h, w,
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        s.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out


def downsample_nearest(arr: np.ndarray, factor: int) -> np.ndarray | None:
    lib = _load()
    if lib is None or arr.dtype != np.float32 or not arr.flags.c_contiguous:
        return None
    h, w = arr.shape
    out = np.empty((h // factor, w // factor), np.float32)
    lib.downsample_nearest_f32(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        h, w, factor,
    )
    return out
