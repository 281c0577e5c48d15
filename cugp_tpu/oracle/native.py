"""ctypes bindings for the serial C++ GP baseline (native/gp_serial.cpp).

Mirrors the reference's serial C++ oracle (SURVEY.md section 2, C12). Builds
the shared library on first use if the toolchain is available; callers
should treat `available()` as a feature gate (pybind11 is not in this image,
hence ctypes — see the driver environment notes).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libgpserial.so"))

KIND_IDS = {"rbf": 0, "matern12": 1, "matern32": 2, "matern52": 3}

_lib = None


def _build():
    subprocess.run(["make", "-C", os.path.abspath(_NATIVE_DIR)], check=True,
                   capture_output=True)


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        _build()
    lib = ctypes.CDLL(_LIB_PATH)
    dptr = ctypes.POINTER(ctypes.c_double)
    i64 = ctypes.c_int64
    i32 = ctypes.c_int32
    dbl = ctypes.c_double

    lib.gp_covariance.argtypes = [dptr, i64, i64, dptr, dbl, dbl, dbl, i32,
                                  dptr]
    lib.gp_cross_covariance.argtypes = [dptr, i64, dptr, i64, i64, dptr, dbl,
                                        i32, dptr]
    lib.gp_cholesky.argtypes = [dptr, i64]
    lib.gp_cholesky.restype = i64
    lib.gp_lml.argtypes = [dptr, dptr, i64, i64, dptr, dbl, dbl, dbl, i32,
                           dptr, dptr, ctypes.POINTER(i64)]
    lib.gp_lml.restype = dbl
    lib.gp_posterior.argtypes = [dptr, dptr, i64, i64, dptr, i64, dptr, dbl,
                                 dbl, dbl, i32, dptr, dptr]
    _lib = lib
    return lib


def available():
    try:
        _load()
        return True
    except Exception:
        return False


def _ptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def _prep(params):
    ell = np.ascontiguousarray(
        np.atleast_1d(np.asarray(params["log_lengthscale"], np.float64)))
    sf2 = float(np.asarray(params["log_signal_var"]))
    sn2 = float(np.asarray(params["log_noise_var"]))
    return ell, sf2, sn2


def train_covariance(params, X, kind="rbf", jitter=1e-6):
    lib = _load()
    X = np.ascontiguousarray(X, np.float64)
    n, d = X.shape
    ell, sf2, sn2 = _prep(params)
    out = np.empty((n, n), np.float64)
    lib.gp_covariance(_ptr(X), n, d, _ptr(ell), sf2, sn2, jitter,
                      KIND_IDS[kind], _ptr(out))
    return out


def cholesky(a):
    lib = _load()
    a = np.ascontiguousarray(a, np.float64).copy()
    status = lib.gp_cholesky(_ptr(a), a.shape[0])
    if status != 0:
        raise np.linalg.LinAlgError(f"not PD at column {status - 1}")
    return a


def log_marginal_likelihood(params, X, y, kind="rbf", jitter=1e-6):
    lib = _load()
    X = np.ascontiguousarray(X, np.float64)
    y = np.ascontiguousarray(y, np.float64)
    n, d = X.shape
    ell, sf2, sn2 = _prep(params)
    alpha = np.empty(n, np.float64)
    status = ctypes.c_int64(0)
    val = lib.gp_lml(_ptr(X), _ptr(y), n, d, _ptr(ell), sf2, sn2, jitter,
                     KIND_IDS[kind], _ptr(alpha), None,
                     ctypes.byref(status))
    if status.value != 0:
        raise np.linalg.LinAlgError(f"not PD at column {status.value - 1}")
    return float(val)


# ---- OpenMP-threaded baseline (native/gp_parallel.cpp) — the parallel-CPU
# tier of the speedup ladder; same pipeline, gpp_* C ABI.

_PAR_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libgppar.so"))
_par_lib = None


def _load_parallel():
    global _par_lib
    if _par_lib is not None:
        return _par_lib
    if not os.path.exists(_PAR_LIB_PATH):
        _build()
    lib = ctypes.CDLL(_PAR_LIB_PATH)
    dptr = ctypes.POINTER(ctypes.c_double)
    i64 = ctypes.c_int64
    i32 = ctypes.c_int32
    dbl = ctypes.c_double
    lib.gpp_num_threads.restype = i32
    lib.gpp_covariance.argtypes = [dptr, i64, i64, dptr, dbl, dbl, dbl, i32,
                                   dptr]
    lib.gpp_cholesky.argtypes = [dptr, i64]
    lib.gpp_cholesky.restype = i64
    lib.gpp_lml.argtypes = [dptr, dptr, i64, i64, dptr, dbl, dbl, dbl, i32,
                            dptr, dptr, ctypes.POINTER(i64)]
    lib.gpp_lml.restype = dbl
    _par_lib = lib
    return lib


def parallel_available():
    try:
        _load_parallel()
        return True
    except Exception:
        return False


def num_threads():
    return int(_load_parallel().gpp_num_threads())


def log_marginal_likelihood_parallel(params, X, y, kind="rbf", jitter=1e-6):
    """Threaded-CPU LML (OpenMP over covariance rows + Cholesky panels)."""
    lib = _load_parallel()
    X = np.ascontiguousarray(X, np.float64)
    y = np.ascontiguousarray(y, np.float64)
    n, d = X.shape
    ell, sf2, sn2 = _prep(params)
    alpha = np.empty(n, np.float64)
    status = ctypes.c_int64(0)
    val = lib.gpp_lml(_ptr(X), _ptr(y), n, d, _ptr(ell), sf2, sn2, jitter,
                      KIND_IDS[kind], _ptr(alpha), None,
                      ctypes.byref(status))
    if status.value != 0:
        raise np.linalg.LinAlgError(f"not PD at column {status.value - 1}")
    return float(val)


def posterior(params, X, y, Xs, kind="rbf", jitter=1e-6):
    lib = _load()
    X = np.ascontiguousarray(X, np.float64)
    y = np.ascontiguousarray(y, np.float64)
    Xs = np.ascontiguousarray(Xs, np.float64)
    n, d = X.shape
    ns = Xs.shape[0]
    ell, sf2, sn2 = _prep(params)
    mu = np.empty(ns, np.float64)
    var = np.empty(ns, np.float64)
    lib.gp_posterior(_ptr(X), _ptr(y), n, d, _ptr(Xs), ns, _ptr(ell), sf2,
                     sn2, jitter, KIND_IDS[kind], _ptr(mu), _ptr(var))
    return mu, var
