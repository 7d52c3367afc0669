"""ctypes loader for the native C++ library (builds on first use).

Native replacements for the reference's Fortran-backed host numerics
(SciPy LSODA at dataloader.py:151-161, SciPy NNLS at
run_simulation_ensemble.py:135). Falls back gracefully: `available()`
reports whether the shared library could be built/loaded.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "native.cpp")
_SO = os.path.join(_HERE, "libhybridode_native.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC, "-o", _SO]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return True
    except Exception:
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None

        lib.ho_roche_dopri5_batch.restype = ctypes.c_int
        lib.ho_roche_dopri5_batch.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double), ctypes.c_int,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int,
            ctypes.c_double, ctypes.c_double, ctypes.c_int,
            ctypes.POINTER(ctypes.c_double),
        ]
        lib.ho_nnls.restype = ctypes.c_int
        lib.ho_nnls.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _ptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def roche_dopri5_batch(y0, dose_times, dose_amounts, params13, ml_coef, ts,
                       rtol=1e-8, atol=1e-10, max_steps=100000):
    """Cohort ground-truth integration in C++ (f64). Returns (T, B, D)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    y0 = np.ascontiguousarray(y0, np.float64)
    dose_times = np.ascontiguousarray(dose_times, np.float64)
    dose_amounts = np.ascontiguousarray(dose_amounts, np.float64)
    params13 = np.ascontiguousarray(params13, np.float64)
    ts = np.ascontiguousarray(ts, np.float64)
    B, D = y0.shape
    n_dose = dose_times.shape[1]
    ml_dim = D - 4
    if ml_dim > 0:
        ml = np.ascontiguousarray(ml_coef, np.float64)
        assert ml.shape == (D, ml_dim)
    else:
        ml = np.zeros((D, 0), np.float64)
    T = len(ts)
    out = np.empty((T, B, D), np.float64)
    failures = lib.ho_roche_dopri5_batch(
        _ptr(y0), B, D, _ptr(dose_times), n_dose, _ptr(dose_amounts),
        _ptr(params13), _ptr(ml), ml_dim, _ptr(ts), T,
        ctypes.c_double(rtol), ctypes.c_double(atol), max_steps, _ptr(out))
    if failures:
        raise RuntimeError(f"native cohort solve failed for {failures} patients")
    return out


def nnls(A, b):
    """Lawson-Hanson NNLS in C++. Same contract as scipy.optimize.nnls."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    A = np.ascontiguousarray(A, np.float64)
    b = np.ascontiguousarray(b, np.float64)
    m, n = A.shape
    x = np.empty(n, np.float64)
    rnorm = ctypes.c_double(0.0)
    lib.ho_nnls(_ptr(A), _ptr(b), m, n, _ptr(x), ctypes.byref(rnorm))
    return x, float(rnorm.value)
