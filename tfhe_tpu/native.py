"""ctypes bindings for the native C++ oracle (native/tfhe_core.cpp).

Builds libtfhe_core.so on demand (``make -C native``) and exposes NumPy-array
wrappers.  This is the framework's second independent oracle (SURVEY.md
section 5 "native equivalent" obligations): the Rust reference is native, so
the build carries a native bit-exact implementation of the integer core, used
for cross-validation (incl. fast exhaustive decomposer sweeps infeasible in
NumPy) — not on any runtime hot path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_DIR, "libtfhe_core.so")
_lib = None


def _u32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32))


def load():
    """Load (building if necessary) the native library; raises if unbuildable."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        subprocess.run(["make", "-C", _DIR], check=True, capture_output=True)
    lib = ctypes.CDLL(_LIB_PATH)
    lib.decomposer_selfcheck.restype = ctypes.c_uint64
    lib.decomposer_selfcheck.argtypes = [ctypes.c_uint64, ctypes.c_uint64,
                                         ctypes.c_int, ctypes.c_int, ctypes.c_int]
    _lib = lib
    return lib


def available() -> bool:
    try:
        load()
        return True
    except Exception:
        return False


def decompose(values: np.ndarray, log_base: int, levels: int, log_q: int) -> np.ndarray:
    v = np.ascontiguousarray(values, dtype=np.uint32).reshape(-1)
    out = np.empty((v.size, levels), dtype=np.uint32)
    load().decompose_u32(_u32p(v), ctypes.c_int64(v.size), log_base, levels,
                         log_q, _u32p(out))
    return out.reshape(values.shape + (levels,))


def recompose(digits: np.ndarray, log_base: int, levels: int, log_q: int) -> np.ndarray:
    d = np.ascontiguousarray(digits, dtype=np.uint32)
    n = d.size // levels
    out = np.empty(n, dtype=np.uint32)
    load().recompose_u32(_u32p(d), ctypes.c_int64(n), log_base, levels, log_q,
                         _u32p(out))
    return out.reshape(digits.shape[:-1])


def decomposer_selfcheck(start: int, count: int, log_base: int, levels: int,
                         log_q: int) -> int:
    """Failures of recompose(decompose(v)) == round_value(v) over a u32 range."""
    return int(load().decomposer_selfcheck(start, count, log_base, levels, log_q))


def negacyclic_mul(p0: np.ndarray, p1: np.ndarray) -> np.ndarray:
    a = np.ascontiguousarray(p0, dtype=np.uint32)
    b = np.ascontiguousarray(p1, dtype=np.uint32)
    out = np.empty_like(a)
    load().negacyclic_mul(_u32p(a), _u32p(b), a.size, _u32p(out))
    return out


def monomial_mul(p: np.ndarray, e: int) -> np.ndarray:
    a = np.ascontiguousarray(p, dtype=np.uint32)
    out = np.empty_like(a)
    load().monomial_mul(_u32p(a), a.size, ctypes.c_int64(e), _u32p(out))
    return out


def switch_modulus(v: np.ndarray, log_from: int, log_to: int) -> np.ndarray:
    a = np.ascontiguousarray(v, dtype=np.uint32).reshape(-1)
    out = np.empty_like(a)
    load().switch_modulus(_u32p(a), ctypes.c_int64(a.size), log_from, log_to, _u32p(out))
    return out.reshape(np.shape(v))


def external_product(ggsw: np.ndarray, glwe: np.ndarray, k: int, n: int,
                     log_base: int, levels: int, log_q: int) -> np.ndarray:
    g = np.ascontiguousarray(ggsw, dtype=np.uint32)
    c = np.ascontiguousarray(glwe, dtype=np.uint32)
    out = np.empty((k + 1, n), dtype=np.uint32)
    load().external_product(_u32p(g), _u32p(c), k, n, log_base, levels, log_q,
                            _u32p(out))
    return out
