"""ctypes binding to the native Dantzig boxed-LCP solver (native/lcp_dantzig.cpp).

The native library plays the role of the reference's vendored ODE pivot
solver (dart/external/odelcpsolver — SURVEY.md §2.1): an exact host-side
oracle for validating the batched on-device solvers, and a CPU fall-back for
applications needing pivot-grade accuracy. Builds on demand with g++ (or
cmake) and caches the .so next to the sources.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libdantzig.so")
_lib = None


class NativeBuildError(RuntimeError):
    pass


def _build():
    src = os.path.join(_NATIVE_DIR, "lcp_dantzig.cpp")
    if not os.path.exists(src):
        raise NativeBuildError(f"source not found: {src}")
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-o", _LIB_PATH, src]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        raise NativeBuildError(f"native build failed: {e}") from e


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        _build()
    lib = ctypes.CDLL(_LIB_PATH)
    lib.boxed_lcp_dantzig.restype = ctypes.c_int
    lib.boxed_lcp_dantzig.argtypes = [
        ctypes.c_int,
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
    ]
    _lib = lib
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except NativeBuildError:
        return False


def boxed_lcp_dantzig(A, b, lo, hi, mu, fidx):
    """Exact pivot solve (host, f64). Returns (lam, w, status)."""
    lib = _load()
    A = np.ascontiguousarray(np.asarray(A, np.float64))
    b = np.ascontiguousarray(np.asarray(b, np.float64))
    n = len(b)
    lo = np.ascontiguousarray(np.clip(np.asarray(lo, np.float64), -1e30, 1e30))
    hi = np.ascontiguousarray(np.clip(np.asarray(hi, np.float64), -1e30, 1e30))
    mu = np.ascontiguousarray(np.asarray(mu, np.float64))
    fidx = np.ascontiguousarray(np.asarray(fidx, np.int32))
    x = np.zeros(n)
    w = np.zeros(n)
    status = lib.boxed_lcp_dantzig(n, A, b, lo, hi, mu, fidx, x, w)
    return x, w, int(status)
