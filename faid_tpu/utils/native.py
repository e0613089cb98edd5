"""ctypes bindings for the native (C++) host-side components.

The shared library is built lazily from ``native_src/`` with g++ -O3 and
cached next to the sources; no pip/pybind dependency.  Python fallbacks
exist for every function (see callers), so the framework works without a
compiler - the native path is a ~60x speedup for code-matrix tooling.
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path

import numpy as np

_SRC = Path(__file__).parent / "native_src"
_LIB_PATH = _SRC / "libfaidtpu.so"
_lock = threading.Lock()
_lib = None


def _build() -> None:
    srcs = sorted(str(p) for p in _SRC.glob("*.cpp"))
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           "-o", str(_LIB_PATH), *srcs]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        newest_src = max(p.stat().st_mtime for p in _SRC.glob("*.cpp"))
        if not _LIB_PATH.exists() or _LIB_PATH.stat().st_mtime < newest_src:
            _build()
        lib = ctypes.CDLL(str(_LIB_PATH))
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        c = ctypes.c_int
        lib.gf2_solve_parity.argtypes = [u8p, c, c, c, u8p]
        lib.gf2_solve_parity.restype = c
        lib.gf2_matmul_mod2.argtypes = [u8p, u8p, c, c, c, u8p]
        lib.gf2_matmul_mod2.restype = None
        lib.gf2_syndrome_weight.argtypes = [u8p, u8p, c, c, c, i32p]
        lib.gf2_syndrome_weight.restype = None
        _lib = lib
        return lib


def gf2_solve_parity(h: np.ndarray, n_info: int) -> np.ndarray:
    """P with parity = (P @ u) % 2; raises on singular H_p.
    Native equivalent of encoder.solve_parity_projection."""
    h = np.ascontiguousarray(h, dtype=np.uint8)
    n_chk, n_var = h.shape
    out = np.empty((n_chk, n_info), dtype=np.uint8)
    rc = get_lib().gf2_solve_parity(h, n_chk, n_var, n_info, out)
    if rc != 0:
        raise ValueError("H_p singular over GF(2)")
    return out


def gf2_matmul_mod2(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    a = np.ascontiguousarray(a, dtype=np.uint8)
    b = np.ascontiguousarray(b, dtype=np.uint8)
    m, k = a.shape
    k2, n = b.shape
    assert k == k2
    out = np.empty((m, n), dtype=np.uint8)
    get_lib().gf2_matmul_mod2(a, b, m, k, n, out)
    return out


def gf2_syndrome_weight(h: np.ndarray, c: np.ndarray) -> np.ndarray:
    h = np.ascontiguousarray(h, dtype=np.uint8)
    c = np.ascontiguousarray(c, dtype=np.uint8)
    n_chk, n_var = h.shape
    batch = c.shape[0]
    assert c.shape[1] == n_var
    out = np.empty((batch,), dtype=np.int32)
    get_lib().gf2_syndrome_weight(h, c, n_chk, n_var, batch, out)
    return out
