"""ctypes bindings for the native C++ image loader (libegorear_native.so).

Builds on first use if the shared object is absent and a toolchain is
available; callers fall back to the PIL path when unavailable. The native
pipeline decodes JPEG/PNG, applies PIL-equivalent antialiased bicubic
resampling, and optionally fuses ImageNet normalization into CHW float32
(see image_loader.cc).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libegorear_native.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-s", "-C", _DIR, "libegorear_native.so"],
            check=True, capture_output=True, timeout=300,
        )
        return os.path.exists(_SO)
    except Exception:
        return False


def load_library() -> Optional[ctypes.CDLL]:
    """Return the loaded native library, building it on demand; None if
    unavailable (callers must fall back to PIL)."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.er_load_u8_batch.restype = ctypes.c_int
        lib.er_load_u8_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
        ]
        lib.er_load_f32_batch.restype = ctypes.c_int
        lib.er_load_f32_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return load_library() is not None


def _paths_array(paths: Sequence[str]):
    arr = (ctypes.c_char_p * len(paths))()
    arr[:] = [p.encode() for p in paths]
    return arr


def load_u8_batch(paths: Sequence[str], out_size: int = 256,
                  n_threads: int = 0) -> np.ndarray:
    """Decode+resize files -> (N, out, out, 3) uint8."""
    lib = load_library()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    n_threads = n_threads or min(8, os.cpu_count() or 1)
    out = np.empty((len(paths), out_size, out_size, 3), np.uint8)
    fails = lib.er_load_u8_batch(
        _paths_array(paths), len(paths), out_size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n_threads,
    )
    if fails:
        raise IOError(f"native loader: {fails}/{len(paths)} decode failures")
    return out


def load_f32_batch(paths: Sequence[str], out_size: int = 256,
                   n_threads: int = 0) -> np.ndarray:
    """Decode+resize+ImageNet-normalize -> (N, 3, out, out) float32."""
    lib = load_library()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    n_threads = n_threads or min(8, os.cpu_count() or 1)
    out = np.empty((len(paths), 3, out_size, out_size), np.float32)
    fails = lib.er_load_f32_batch(
        _paths_array(paths), len(paths), out_size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n_threads,
    )
    if fails:
        raise IOError(f"native loader: {fails}/{len(paths)} decode failures")
    return out
