"""Native (C) host-staging kernels, built on demand and loaded via ctypes.

The TPU compute path is JAX/Pallas; this package covers the *host* side of
ingest — the role the reference delegates to pyread_eagle's C extension
(`io/EAGLE/_SnapshotEAGLE.py:115`). The shared object is compiled once per
machine from :mod:`hostops.c` with the system C compiler and cached next to
the source; every caller falls back to the NumPy formulation when no
toolchain is available, so the package never becomes a hard dependency.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import shutil
import subprocess
import tempfile
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "hostops.c")
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_I64 = ctypes.c_int64
_I32 = ctypes.c_int32
_F64 = ctypes.c_double
_PD = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
_PF = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
_PI = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_PI16 = np.ctypeslib.ndpointer(np.int16, flags="C_CONTIGUOUS")
_PI64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
_PU16 = np.ctypeslib.ndpointer(np.uint16, flags="C_CONTIGUOUS")
_PU32 = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")


def _build() -> Optional[str]:
    with open(_SRC, "rb") as f:
        tag = hashlib.sha256(f.read()).hexdigest()[:16]
    out = os.path.join(_DIR, f"_hostops_{tag}.so")
    if os.path.exists(out):
        return out
    cc = shutil.which("cc") or shutil.which("gcc") or shutil.which("clang")
    if cc is None:
        return None
    fd, tmp = tempfile.mkstemp(suffix=".so", dir=_DIR)
    os.close(fd)
    try:
        subprocess.run(
            [cc, "-O3", "-shared", "-fPIC", _SRC, "-o", tmp],
            check=True, capture_output=True, timeout=120,
        )
        os.replace(tmp, out)  # atomic: concurrent builders race benignly
        return out
    except (subprocess.SubprocessError, OSError):
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    """The compiled hostops library, or None when unavailable."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _build()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.assign_tiles_f64.argtypes = [
            _PD, _PD, _PF, _I64,
            _F64, _F64, _F64, _F64,
            _I64, _I64, _I32, _F64,
            _I32, _PD, _PI, _PI, _PI, _PI, _PI, _I64,
            _PI, _PF, _PF,
        ]
        lib.assign_tiles_f64.restype = None
        lib.scale_cast_f64.argtypes = [_PD, _I64, _F64, _PF]
        lib.scale_cast_f64.restype = None
        lib.scale_cast_f32.argtypes = [_PF, _I64, _F64, _PF]
        lib.scale_cast_f32.restype = None
        lib.morton_delta_encode_u16.argtypes = [
            _PU16, _PU16, _I64, _I64, _PI16, _PU32, _PI64, _PU32,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.morton_delta_encode_u16.restype = None
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def assign_tiles_f64(
    x: np.ndarray,
    y: np.ndarray,
    h: np.ndarray,
    *,
    x0: float,
    y0: float,
    psx: float,
    psy: float,
    nx: int,
    ny: int,
    periodic: bool,
    support_factor: float,
    bounds,  # per-level max s_pix, < 0 for disabled levels
    ntx, nty, tw, th, marg,  # per-level geometry
    stride: int,
):
    """Fused (level, tile, tile-local f32 coords) assignment, or None when
    the native library is unavailable (callers fall back to NumPy)."""
    lib = get_lib()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, np.float64)
    y = np.ascontiguousarray(y, np.float64)
    h = np.ascontiguousarray(h, np.float32)
    n = x.shape[0]
    key = np.empty(n, np.int32)
    u_loc = np.empty(n, np.float32)
    v_loc = np.empty(n, np.float32)
    lib.assign_tiles_f64(
        x, y, h, n,
        float(x0), float(y0), float(psx), float(psy),
        int(nx), int(ny), int(bool(periodic)), float(support_factor),
        len(bounds), np.asarray(bounds, np.float64),
        np.asarray(ntx, np.int32), np.asarray(nty, np.int32),
        np.asarray(tw, np.int32), np.asarray(th, np.int32),
        np.asarray(marg, np.int32), int(stride),
        key, u_loc, v_loc,
    )
    return key, u_loc, v_loc


def scale_cast(src: np.ndarray, scale: float) -> Optional[np.ndarray]:
    """One-pass ``(src * scale).astype(float32)``, or None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    src = np.ascontiguousarray(src)
    out = np.empty(src.shape, np.float32)
    flat = src.reshape(-1)
    if src.dtype == np.float64:
        lib.scale_cast_f64(flat, flat.shape[0], float(scale), out.reshape(-1))
    elif src.dtype == np.float32:
        lib.scale_cast_f32(flat, flat.shape[0], float(scale), out.reshape(-1))
    else:
        return None
    return out


def morton_delta_encode_u16(x_q: np.ndarray, y_q: np.ndarray, seg: int):
    """One-pass Morton-delta encode (io/packing.py semantics), or None
    when the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    x_q = np.ascontiguousarray(x_q, np.uint16)
    y_q = np.ascontiguousarray(y_q, np.uint16)
    n = x_q.shape[0]
    n_seg = -(-n // seg)
    deltas = np.empty(n_seg * seg, np.int16)
    bases = np.empty(n_seg, np.uint32)
    exc_idx = np.empty(n_seg * seg, np.int64)
    exc_corr = np.empty(n_seg * seg, np.uint32)
    ne = ctypes.c_int64(0)
    lib.morton_delta_encode_u16(
        x_q, y_q, n, seg, deltas, bases, exc_idx, exc_corr,
        ctypes.byref(ne),
    )
    k = int(ne.value)
    return deltas, bases, exc_idx[:k].copy(), exc_corr[:k].copy(), n
