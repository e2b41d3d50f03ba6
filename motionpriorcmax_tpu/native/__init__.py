"""ctypes bindings for the native host-pipeline kernels (event_ops.cc).

Builds the shared library on first use with g++ -O3 (cached next to the
source); every entry point has a NumPy fallback so the package works without
a toolchain.  No pybind11 — plain C ABI via ctypes.
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

_HERE = Path(__file__).parent
_SRC = _HERE / "event_ops.cc"
_LIB_PATH = _HERE / "_event_ops.so"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not _LIB_PATH.exists() or _LIB_PATH.stat().st_mtime < _SRC.stat().st_mtime:
            try:
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                     str(_SRC), "-o", str(_LIB_PATH)],
                    check=True, capture_output=True, timeout=120)
            except Exception:
                _build_failed = True
                return None
        lib = ctypes.CDLL(str(_LIB_PATH))
        c_i64 = ctypes.c_int64
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        u16p = np.ctypeslib.ndpointer(np.uint16, flags="C_CONTIGUOUS")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")

        lib.lower_bound_i64.restype = c_i64
        lib.lower_bound_i64.argtypes = [i64p, c_i64, c_i64]
        lib.voxelize_trilinear.restype = None
        lib.voxelize_trilinear.argtypes = [f32p, f32p, f32p, f32p, c_i64,
                                           c_i64, c_i64, c_i64, f32p]
        lib.voxelize_temporal.restype = None
        lib.voxelize_temporal.argtypes = [i32p, i32p, f32p, f32p, c_i64,
                                          c_i64, c_i64, c_i64, f32p]
        lib.pack_dsec_events.restype = c_i64
        lib.pack_dsec_events.argtypes = [u16p, u16p, i64p, u8p, c_i64, f32p,
                                         c_i64, c_i64, c_i64, f32p]
        lib.lut_cell_sort_segment.restype = None
        lib.lut_cell_sort_segment.argtypes = [f32p, c_i64, c_i64, c_i64,
                                              c_i64, ctypes.c_float, f32p,
                                              i32p, i32p, i32p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def lower_bound(t: np.ndarray, value: int) -> int:
    """First index i with t[i] >= value (== np.searchsorted side='left')."""
    lib = _load()
    t = np.ascontiguousarray(t, np.int64)
    if lib is None:
        return int(np.searchsorted(t, value, side="left"))
    return int(lib.lower_bound_i64(t, len(t), int(value)))


def voxelize_trilinear(x, y, t_norm, p, num_bins: int, height: int,
                       width: int) -> np.ndarray:
    """Fractional-coordinate 8-corner vote -> [num_bins, H, W] float32."""
    lib = _load()
    x = np.ascontiguousarray(x, np.float32)
    y = np.ascontiguousarray(y, np.float32)
    t_norm = np.ascontiguousarray(t_norm, np.float32)
    p = np.ascontiguousarray(p, np.float32)
    grid = np.zeros(num_bins * height * width, np.float32)
    if lib is None:
        from ..data.host_ops import voxel_grid_numpy  # slow path
        # host_ops normalizes internally; emulate by passing prenormalized t.
        raise RuntimeError("native voxelize unavailable; use data.host_ops")
    lib.voxelize_trilinear(x, y, t_norm, p, len(x), num_bins, height, width,
                           grid)
    return grid.reshape(num_bins, height, width)


def voxelize_temporal(x, y, t_norm, p, num_bins: int, height: int,
                      width: int) -> np.ndarray:
    """Integer-coordinate two-tap time vote -> [num_bins, H, W] float32."""
    lib = _load()
    assert lib is not None, "native voxelize unavailable"
    x = np.ascontiguousarray(x, np.int32)
    y = np.ascontiguousarray(y, np.int32)
    t_norm = np.ascontiguousarray(t_norm, np.float32)
    p = np.ascontiguousarray(p, np.float32)
    grid = np.zeros(num_bins * height * width, np.float32)
    lib.voxelize_temporal(x, y, t_norm, p, len(x), num_bins, height, width,
                          grid)
    return grid.reshape(num_bins, height, width)


def lut_cell_sort_segment(events: np.ndarray, hq: int, wq: int,
                          num_bins: int, superpixel: float):
    """Counting-sort [m, 6] event rows by y-major LUT cell; None if no lib.

    Returns (sorted_events [m, 6] float32, ends [hq*num_bins*wq] int32) or
    None when the native library is unavailable (callers fall back to the
    numpy path in data/host_ops.py)."""
    lib = _load()
    if lib is None:
        return None
    events = np.ascontiguousarray(events, np.float32)
    m = len(events)
    cells = hq * num_bins * wq
    out = np.empty_like(events)
    ends = np.empty(cells, np.int32)
    counts = np.zeros(cells, np.int32)
    keys = np.empty(max(m, 1), np.int32)
    lib.lut_cell_sort_segment(events.reshape(-1), m, hq, wq, num_bins,
                              float(superpixel), out.reshape(-1), ends,
                              counts, keys)
    return out, ends


def pack_dsec_events(x, y, t, p, rectify_map: np.ndarray, height: int,
                     width: int, num_bins: int) -> np.ndarray:
    """Rectify + normalize + bin + pack (y, x, t, p, bin) rows -> [M, 5]."""
    lib = _load()
    assert lib is not None, "native pack unavailable"
    x = np.ascontiguousarray(x, np.uint16)
    y = np.ascontiguousarray(y, np.uint16)
    t = np.ascontiguousarray(t, np.int64)
    p = np.ascontiguousarray(p, np.uint8)
    rect = np.ascontiguousarray(rectify_map, np.float32)
    out = np.empty((len(x), 5), np.float32)
    m = lib.pack_dsec_events(x, y, t, p, len(x), rect.reshape(-1), height,
                             width, num_bins, out.reshape(-1))
    return out[:m]
