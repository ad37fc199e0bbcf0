"""ctypes loader for the C++ host-runtime library (native/).

Builds ``libseqlib_native.so`` on demand with g++ (cached by source
mtime).  Pure-numpy fallbacks exist for every native entry point, so
the framework still works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC_DIR = os.path.join(_REPO, "native")
_BUILD_DIR = os.path.join(_SRC_DIR, "build")
_SOURCES = ["sais.cpp"]

_lib = None
_lib_tried = False


def _build_so() -> str | None:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    so = os.path.join(_BUILD_DIR, "libseqlib_native.so")
    srcs = [os.path.join(_SRC_DIR, s) for s in _SOURCES
            if os.path.exists(os.path.join(_SRC_DIR, s))]
    if not srcs:
        return None
    newest = max(os.path.getmtime(s) for s in srcs)
    if os.path.exists(so) and os.path.getmtime(so) >= newest:
        return so
    cmd = ["g++", "-O3", "-fPIC", "-shared", "-std=c++17",
           *srcs, "-o", so]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        return so
    except (subprocess.CalledProcessError, FileNotFoundError,
            subprocess.TimeoutExpired):
        return None


def get_lib():
    global _lib, _lib_tried
    if _lib is None and not _lib_tried:
        _lib_tried = True
        so = _build_so()
        if so:
            lib = ctypes.CDLL(so)
            lib.sais_u8.restype = ctypes.c_int
            lib.sais_u8.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64)]
            _lib = lib
    return _lib


# ---------------------------------------------------------------------------
# suffix array
# ---------------------------------------------------------------------------

def suffix_array(text: np.ndarray) -> np.ndarray:
    """Suffix array of ``text`` (uint8 codes, values >= 1) **with an
    implicit terminal sentinel**: returns SA of length len(text)+1 with
    SA[0] == len(text)."""
    t = np.asarray(text, dtype=np.uint8)
    if t.size and t.min() < 1:
        raise ValueError("suffix_array: symbols must be >= 1")
    padded = np.concatenate([t, np.zeros(1, dtype=np.uint8)])
    n = padded.size
    lib = get_lib()
    if lib is not None:
        sa = np.empty(n, dtype=np.int64)
        rc = lib.sais_u8(
            padded.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.c_int64(n),
            sa.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        if rc == 0:
            return sa
    return _suffix_array_doubling(padded)


def _suffix_array_doubling(t: np.ndarray) -> np.ndarray:
    """O(n log^2 n) prefix-doubling fallback (numpy argsort-based)."""
    n = t.size
    rank = t.astype(np.int64)
    k = 1
    sa = np.argsort(rank, kind="stable")
    while True:
        key2 = np.full(n, -1, dtype=np.int64)
        key2[:n - k] = rank[k:]
        order = np.lexsort((key2, rank))
        new_rank = np.zeros(n, dtype=np.int64)
        r0 = rank[order]
        k2 = key2[order]
        changed = np.ones(n, dtype=bool)
        changed[1:] = (r0[1:] != r0[:-1]) | (k2[1:] != k2[:-1])
        new_rank[order] = np.cumsum(changed) - 1
        rank = new_rank
        sa = order
        if rank[order[-1]] == n - 1:
            return sa
        k *= 2
