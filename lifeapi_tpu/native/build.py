"""Build + ctypes bindings for the native oracle.

Compiles oracle.c to a shared library next to this file (cached by source
mtime) and exposes numpy-friendly wrappers."""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_HERE = Path(__file__).parent
_SRC = _HERE / "oracle.c"
_LIB = _HERE / "_oracle.so"

N = 64


def _ensure_built():
    if _LIB.exists() and _LIB.stat().st_mtime >= _SRC.stat().st_mtime:
        return
    cc = os.environ.get("CC", "cc")
    subprocess.run(
        [cc, "-O2", "-shared", "-fPIC", "-o", str(_LIB), str(_SRC)],
        check=True,
    )


_lib = None


def load_oracle():
    """Return the ctypes module handle, building if needed."""
    global _lib
    if _lib is None:
        _ensure_built()
        lib = ctypes.CDLL(str(_LIB))
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        u64p = np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS")
        lib.life_step_dense.argtypes = [u8p, u8p, ctypes.c_int]
        lib.life_step_dense_n.argtypes = [u8p, u8p, ctypes.c_int, ctypes.c_int]
        lib.life_step_packed.argtypes = [u64p, u64p, ctypes.c_int]
        lib.life_step_packed_n.argtypes = [u64p, u64p, ctypes.c_int, ctypes.c_int]
        _lib = lib
    return _lib


def step_dense(grids, steps=1):
    """grids: uint8/bool [B, 64, 64] indexed [x, y]; returns same shape."""
    lib = load_oracle()
    grids = np.ascontiguousarray(np.asarray(grids), dtype=np.uint8)
    single = grids.ndim == 2
    if single:
        grids = grids[None]
    out = np.empty_like(grids)
    lib.life_step_dense_n(grids, out, grids.shape[0], steps)
    return out[0] if single else out


def step_packed64(boards, steps=1):
    """boards: uint64 [B, 64] reference-layout columns; returns stepped."""
    lib = load_oracle()
    boards = np.ascontiguousarray(np.asarray(boards), dtype=np.uint64)
    single = boards.ndim == 1
    if single:
        boards = boards[None]
    out = np.empty_like(boards)
    lib.life_step_packed_n(boards, out, boards.shape[0], steps)
    return out[0] if single else out


def packed32_to_packed64(packed):
    """uint32[..., 64, 2] (framework layout) -> uint64[..., 64]."""
    p = np.asarray(packed, dtype=np.uint32)
    return p[..., 0].astype(np.uint64) | (p[..., 1].astype(np.uint64) << 32)


def packed64_to_packed32(boards):
    b = np.asarray(boards, dtype=np.uint64)
    lo = (b & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hi = (b >> np.uint64(32)).astype(np.uint32)
    return np.stack([lo, hi], axis=-1)
