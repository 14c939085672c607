"""ctypes bindings for the native runtime (native/tgtc_runtime.cpp).

Compiles the shared library on first use (g++ -O3, cached beside the
source); every entry point has a pure-Python (PIL/numpy) fallback so the
framework works on machines without a toolchain.

Use :func:`write_png_async` in artifact-heavy loops (geometry dump, Phase-F
renders) and :func:`wait_writes` before relying on the files.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_SRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native", "tgtc_runtime.cpp",
)
_LIB_PATH = os.path.join(os.path.dirname(_SRC), "libtgtc_runtime.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> Optional[str]:
    if os.path.exists(_LIB_PATH) and (
        os.path.getmtime(_LIB_PATH) >= os.path.getmtime(_SRC)
    ):
        return _LIB_PATH
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
             "-o", _LIB_PATH, "-lz", "-pthread"],
            check=True, capture_output=True, timeout=120,
        )
        return _LIB_PATH
    except Exception:
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        path = _build()
        if path is None:
            return None
        lib = ctypes.CDLL(path)
        lib.tgtc_write_png.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.tgtc_write_png.restype = ctypes.c_int
        lib.tgtc_write_png_async.argtypes = lib.tgtc_write_png.argtypes
        lib.tgtc_write_png_async.restype = None
        lib.tgtc_wait_writes.restype = ctypes.c_long
        lib.tgtc_resize_box.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.tgtc_resize_box.restype = None
        _lib = lib
        return _lib


def _as_u8(img: np.ndarray) -> np.ndarray:
    img = np.ascontiguousarray(img)
    if img.dtype != np.uint8:
        img = (np.clip(img, 0.0, 1.0) * 255).astype(np.uint8)
    return img


def write_png(path: str, img: np.ndarray) -> None:
    """Synchronous PNG write (native if available, PIL otherwise)."""
    img = _as_u8(img)
    lib = get_lib()
    if lib is not None and img.ndim == 3 and img.shape[2] in (1, 3, 4):
        h, w, c = img.shape
        rc = lib.tgtc_write_png(
            path.encode(), img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            h, w, c,
        )
        if rc == 0:
            return
    from PIL import Image

    Image.fromarray(img.squeeze() if img.ndim == 3 and img.shape[2] == 1
                    else img).save(path)


def write_png_async(path: str, img: np.ndarray) -> None:
    """Queue a PNG write on the native thread pool (falls back to sync)."""
    img = _as_u8(img)
    lib = get_lib()
    if lib is not None and img.ndim == 3 and img.shape[2] in (1, 3, 4):
        h, w, c = img.shape
        lib.tgtc_write_png_async(
            path.encode(), img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            h, w, c,
        )
        return
    write_png(path, img)


def wait_writes() -> int:
    """Block until queued async writes finish; returns error count."""
    lib = get_lib()
    if lib is None:
        return 0
    return int(lib.tgtc_wait_writes())


def resize_box(img: np.ndarray, factor: int) -> np.ndarray:
    """Area-average downsample by integer factor (native or numpy)."""
    img = _as_u8(img)
    h, w, c = img.shape
    dh, dw = h // factor, w // factor
    lib = get_lib()
    if lib is not None:
        out = np.empty((dh, dw, c), np.uint8)
        lib.tgtc_resize_box(
            img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            h, w, c, factor,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        return out
    trimmed = img[: dh * factor, : dw * factor]
    return (
        trimmed.reshape(dh, factor, dw, factor, c)
        .mean(axis=(1, 3))
        .astype(np.uint8)
    )
