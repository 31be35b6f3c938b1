"""ctypes bindings for the native host runtime (native/libmvicp_host.so).

Fast .xyz parsing (mmap + strtod) and a grid-hash CPU 1-NN — the native
replacements for the reference's C++ loader (include/common.h:224-239) and
nanoflann KD-tree (include/nanoflann.hpp). Builds with ``make -C native``;
every caller degrades to numpy when the library is absent, and
:func:`build` compiles it on demand if a toolchain is available.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libmvicp_host.so"))

_lib = None
_checked = False


def build(quiet: bool = True) -> bool:
    """Compile the shared library. Returns success."""
    try:
        subprocess.run(["make", "-C", os.path.abspath(_NATIVE_DIR)],
                       check=True,
                       capture_output=quiet)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def _load():
    global _lib, _checked
    if _checked:
        return _lib
    _checked = True
    if not os.path.exists(_LIB_PATH):
        build()
    if not os.path.exists(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.mvicp_parse_floats.restype = ctypes.c_long
        lib.mvicp_parse_floats.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_double), ctypes.c_long]
        lib.mvicp_nn_grid.restype = None
        lib.mvicp_nn_grid.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_long,
            ctypes.POINTER(ctypes.c_double), ctypes.c_long,
            ctypes.c_double,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_double)]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def parse_floats_file(path: str) -> np.ndarray:
    """All whitespace-separated doubles in the file, as one array."""
    lib = _load()
    if lib is None:
        return np.fromfile(path, dtype=np.float64, sep=" ")
    n = lib.mvicp_parse_floats(path.encode(), None, 0)
    if n < 0:
        raise IOError(f"cannot read {path}")
    out = np.empty(n, dtype=np.float64)
    got = lib.mvicp_parse_floats(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        n)
    if got != n:
        raise IOError(f"{path}: short read ({got} != {n})")
    return out


def nn_grid(query: np.ndarray, ref: np.ndarray, cell: float):
    """Grid-hash 1-NN, exact within ``cell`` (else idx -1, d2 1e30).

    With ``cell`` set to the ICP cutoff this returns exactly the
    correspondences the pipeline keeps (frame.cpp:156-160 discards the
    rest). CPU path / A-B baseline; requires the native library.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not built (make -C native)")
    q = np.ascontiguousarray(query, dtype=np.float64)
    r = np.ascontiguousarray(ref, dtype=np.float64)
    n, m = q.shape[0], r.shape[0]
    idx = np.empty(n, dtype=np.int32)
    d2 = np.empty(n, dtype=np.float64)
    lib.mvicp_nn_grid(
        q.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n,
        r.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), m,
        float(cell),
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        d2.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return idx, d2
