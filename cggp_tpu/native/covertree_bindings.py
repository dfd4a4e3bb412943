"""ctypes bindings for the native cover-tree builder."""

from __future__ import annotations

import ctypes
from typing import Optional, Tuple

import numpy as np

from cggp_tpu.native.build import load_library

_configured = False


def _lib():
    global _configured
    lib = load_library()
    if lib is None:
        return None
    if not _configured:
        lib.covertree_build.restype = ctypes.c_int
        lib.covertree_build.argtypes = [
            ctypes.POINTER(ctypes.c_double),  # x
            ctypes.c_int64, ctypes.c_int64,   # n, d
            ctypes.c_double,                  # spatial_resolution
            ctypes.c_int64,                   # num_levels_in
            ctypes.c_int, ctypes.c_int,       # lloyds, voronoi
            ctypes.POINTER(ctypes.c_double),  # centers_out
            ctypes.POINTER(ctypes.c_int64),   # labels_out
            ctypes.POINTER(ctypes.c_int64),   # num_centers_out
            ctypes.POINTER(ctypes.c_int64),   # num_levels_out
        ]
        _configured = True
    return lib


def covertree_build_native(
    x: np.ndarray,
    spatial_resolution: Optional[float],
    num_levels: int = 1,
    lloyds: bool = True,
    voronoi: bool = True,
) -> Optional[Tuple[np.ndarray, np.ndarray, int]]:
    """Build; returns ``(centers [M, D], labels [N], num_levels)`` or None
    when the native library is unavailable."""
    lib = _lib()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, dtype=np.float64)
    n, d = x.shape
    centers = np.empty((n, d), dtype=np.float64)
    labels = np.empty((n,), dtype=np.int64)
    num_centers = ctypes.c_int64(0)
    num_levels_out = ctypes.c_int64(0)

    status = lib.covertree_build(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        n, d,
        ctypes.c_double(-1.0 if spatial_resolution is None else float(spatial_resolution)),
        int(num_levels),
        int(bool(lloyds)), int(bool(voronoi)),
        centers.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.byref(num_centers), ctypes.byref(num_levels_out),
    )
    if status != 0:
        return None
    m = int(num_centers.value)
    return centers[:m].copy(), labels, int(num_levels_out.value)
