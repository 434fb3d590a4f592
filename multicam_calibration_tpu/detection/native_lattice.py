"""ctypes binding for the native lattice-growth stage (native/src/lattice.cc).

The host lattice ordering is the one combinatorial step of the detection
pipeline that stays off the accelerator (reference analogue: OpenCV's quad
assembly inside findChessboardCorners, detection.py:384). The numpy
implementation (`detector._grow_lattice_numpy`) costs ~3 ms/frame in
per-call numpy overhead; the C++ port is the same algorithm at ~0.05
ms/frame. Results are bit-identical on the test corpus
(tests/test_native_lattice.py); numpy remains the fallback when the native
runtime is unavailable.
"""
from __future__ import annotations

import ctypes
import os

import numpy as np

from .native_video import _load_lib

_CONFIGURED = False
_AVAILABLE = False


def _lib():
    """The shared native runtime, with mccl_* argtypes configured once.

    Returns None when the library (or, for stale builds predating
    lattice.cc, the symbol) is unavailable — callers fall back to numpy.
    """
    global _CONFIGURED, _AVAILABLE
    lib = _load_lib()
    if lib is None:
        return None
    if not _CONFIGURED:
        _CONFIGURED = True
        try:
            fn = lib.mccl_order_candidates
        except AttributeError:  # stale .so built before lattice.cc existed
            _AVAILABLE = False
        else:
            fn.restype = ctypes.c_int
            fn.argtypes = [
                ctypes.POINTER(ctypes.c_double),  # pts (n, 2)
                ctypes.POINTER(ctypes.c_double),  # scores (n,)
                ctypes.c_int,                     # n
                ctypes.c_int,                     # rows
                ctypes.c_int,                     # cols
                ctypes.c_double,                  # pitch_tol
                ctypes.POINTER(ctypes.c_int32),   # keep_out
                ctypes.POINTER(ctypes.c_int32),   # n_keep_out
                ctypes.POINTER(ctypes.c_double),  # pitch_out
                ctypes.POINTER(ctypes.c_int32),   # cells_out
                ctypes.POINTER(ctypes.c_int32),   # n_cells_out
            ]
            _AVAILABLE = True
    return lib if _AVAILABLE else None


def available() -> bool:
    return (
        os.environ.get("MCC_NO_NATIVE_LATTICE") is None and _lib() is not None
    )


def grow_lattice(pts, sc, n_needed, pitch_tol):
    """Native counterpart of ``detector._grow_lattice_numpy``.

    Returns ``(pts, sc, pitch, grid_or_None)`` or None when the native
    runtime is unavailable (callers fall back to numpy).
    """
    if os.environ.get("MCC_NO_NATIVE_LATTICE"):
        return None
    lib = _lib()
    if lib is None:
        return None
    # rows*cols == n_needed is all the C side uses them for; pass as (1, n).
    pts_c = np.ascontiguousarray(pts, dtype=np.float64)
    sc_c = np.ascontiguousarray(sc, dtype=np.float64)
    n = len(pts_c)
    keep = np.empty(n, dtype=np.int32)
    cells = np.empty(3 * max(n, 1), dtype=np.int32)
    n_keep = ctypes.c_int32(0)
    n_cells = ctypes.c_int32(0)
    pitch = ctypes.c_double(0.0)
    rc = lib.mccl_order_candidates(
        pts_c.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        sc_c.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        n,
        1,
        int(n_needed),
        float(pitch_tol),
        keep.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.byref(n_keep),
        ctypes.byref(pitch),
        cells.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.byref(n_cells),
    )
    if rc != 0:
        return None
    kept = keep[: n_keep.value]
    pts_out = pts_c[kept]
    sc_out = sc_c[kept]
    if n_cells.value == 0:
        return pts_out, sc_out, float(pitch.value), None
    tri = cells[: 3 * n_cells.value].reshape(-1, 3)
    grid = {(int(i), int(j)): int(k) for i, j, k in tri}
    return pts_out, sc_out, float(pitch.value), grid
