"""ctypes binding for the native C++ JPEG decode pool (native/loader.cc).

The shared library is optional: build it with `make -C native` (libjpeg).
When absent, the pipeline falls back to cv2/PIL decode transparently.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "libpeclr_loader.so",
)

_lib = None
_checked = False


def _load():
    global _lib, _checked
    if _checked:
        return _lib
    _checked = True
    if not os.path.exists(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.peclr_decode_jpeg.restype = ctypes.c_int
        lib.peclr_decode_jpeg.argtypes = [
            ctypes.c_char_p,                  # path
            ctypes.POINTER(ctypes.c_ubyte),   # out buffer
            ctypes.c_int,                     # buffer capacity (bytes)
            ctypes.POINTER(ctypes.c_int),     # out height
            ctypes.POINTER(ctypes.c_int),     # out width
        ]
        lib.peclr_decode_batch.restype = ctypes.c_int
        lib.peclr_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),  # paths
            ctypes.c_int,                     # count
            ctypes.POINTER(ctypes.c_ubyte),   # out canvas buffer
            ctypes.c_int,                     # canvas size (square)
            ctypes.c_int,                     # threads
        ]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def decode(path: str, max_side: int = 4096) -> Optional[np.ndarray]:
    """Decode one JPEG to RGB uint8 (H, W, 3); None on failure."""
    lib = _load()
    if lib is None:
        return None
    cap = max_side * max_side * 3
    buf = np.empty((cap,), np.uint8)
    h = ctypes.c_int(0)
    w = ctypes.c_int(0)
    rc = lib.peclr_decode_jpeg(
        path.encode(),
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        cap,
        ctypes.byref(h),
        ctypes.byref(w),
    )
    if rc != 0:
        return None
    return buf[: h.value * w.value * 3].reshape(h.value, w.value, 3).copy()


def decode_batch_to_canvas(paths, canvas: int, threads: int = 8) -> Optional[np.ndarray]:
    """Decode many JPEGs into a pre-allocated (N, canvas, canvas, 3) uint8
    canvas batch with the C++ thread pool (images are center-fit by the
    native code; currently requires canvas-sized sources like FreiHAND)."""
    lib = _load()
    if lib is None:
        return None
    n = len(paths)
    out = np.zeros((n, canvas, canvas, 3), np.uint8)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    rc = lib.peclr_decode_batch(
        arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), canvas, threads
    )
    if rc != 0:
        return None
    return out
