"""Native (C++) host-side input-pipeline kernels, loaded via ctypes.

Builds ``libnerf_rpn_native.so`` from ``augment.cpp`` on first use (g++,
-O3 -march=native) and caches it next to the source; every entry point has a
numpy fallback so the package works without a toolchain.  See
``tests/test_native.py`` for numpy-parity coverage.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "augment.cpp")
_LIB = os.path.join(_DIR, "libnerf_rpn_native.so")
_lib = None
_load_failed = False


def _load():
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    try:
        if not os.path.isfile(_LIB) or (
            os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
        ):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 _SRC, "-o", _LIB],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(_LIB)
        f32p = ctypes.POINTER(ctypes.c_float)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.rotate_scale_resample.argtypes = [
            f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.c_float, f32p,
        ]
        lib.density_to_alpha_ngp.argtypes = [f32p, ctypes.c_int64, ctypes.c_int]
        lib.density_to_alpha_relu.argtypes = [f32p, ctypes.c_int64, ctypes.c_int]
        lib.u8_to_unit_float.argtypes = [u8p, ctypes.c_int64, f32p]
        _lib = lib
    except Exception:
        _load_failed = True
    return _lib


def available() -> bool:
    return _load() is not None


def rotate_scale_resample(volume: np.ndarray, angle: float, scale: float):
    """(W, L, H, C) float32 -> resampled copy; None if native unavailable."""
    lib = _load()
    if lib is None:
        return None
    src = np.ascontiguousarray(volume, np.float32)
    dst = np.empty_like(src)
    w, l, h, c = src.shape
    lib.rotate_scale_resample(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), w, l, h, c,
        ctypes.c_float(angle), ctypes.c_float(scale),
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return dst


def density_to_alpha_inplace(rgbsigma: np.ndarray, relu: bool = False) -> bool:
    """Apply density->alpha to the last channel in place; False = no native."""
    lib = _load()
    if lib is None or rgbsigma.dtype != np.float32 or not rgbsigma.flags.c_contiguous:
        return False
    c = rgbsigma.shape[-1]
    n = rgbsigma.size // c
    fn = lib.density_to_alpha_relu if relu else lib.density_to_alpha_ngp
    fn(rgbsigma.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n, c)
    return True
