"""ctypes binding for the native host-side kernels.

Reference equivalent: src/parity_polytope/exact.py:12-60 (lazy
ctypes.cdll load + ndpointer signatures). Here the shared library is also
built on demand (``make`` in this directory) the first time it is needed,
so there is no separate build step to forget.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np
from numpy.ctypeslib import ndpointer

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libldpc_native.so")
_lib = None


def _build() -> None:
    subprocess.run(["make", "-s", "-C", _DIR], check=True)


def get_lib() -> ctypes.CDLL:
    """Load (building if necessary) the native library."""
    global _lib
    if _lib is not None:
        return _lib
    src = os.path.join(_DIR, "parity_polytope.cpp")
    if (not os.path.exists(_LIB_PATH)
            or os.path.getmtime(_LIB_PATH) < os.path.getmtime(src)):
        _build()
    lib = ctypes.cdll.LoadLibrary(_LIB_PATH)

    f64 = ndpointer(ctypes.c_double, flags="C_CONTIGUOUS")
    i32 = ndpointer(ctypes.c_int32, flags="C_CONTIGUOUS")
    lib.pp_project_vec.restype = None
    lib.pp_project_vec.argtypes = [ctypes.c_int, f64, f64]
    lib.pp_project_rows.restype = None
    lib.pp_project_rows.argtypes = [ctypes.c_int, ctypes.c_int, f64, f64]
    lib.pp_project_csr.restype = None
    lib.pp_project_csr.argtypes = [ctypes.c_int, i32, f64, f64]
    _lib = lib
    return lib


def proj_vec(v: np.ndarray) -> np.ndarray:
    """Project one vector onto PP_d (reference exact.py:41-44)."""
    v = np.ascontiguousarray(v, dtype=np.float64)
    out = np.empty_like(v)
    get_lib().pp_project_vec(v.size, v, out)
    return out


def proj_rows(rows: np.ndarray) -> np.ndarray:
    """Project each row of a [N, d] array (reference exact.py:55-60)."""
    rows = np.ascontiguousarray(rows, dtype=np.float64)
    out = np.empty_like(rows)
    get_lib().pp_project_rows(rows.shape[0], rows.shape[1], rows, out)
    return out


def proj_csr(indptr: np.ndarray, data: np.ndarray) -> np.ndarray:
    """Project CSR row slices of mixed degree (reference exact.py:47-52)."""
    indptr = np.ascontiguousarray(indptr, dtype=np.int32)
    data = np.ascontiguousarray(data, dtype=np.float64)
    out = np.empty_like(data)
    get_lib().pp_project_csr(indptr.size - 1, indptr, data, out)
    return out
