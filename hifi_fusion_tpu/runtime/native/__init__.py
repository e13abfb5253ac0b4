"""ctypes bindings for the native host runtime (libfusion_native.so).

Loads lazily and degrades gracefully: every entry point has a NumPy
fallback at its call site, so the framework works without the shared
library; building it (``make`` in this directory, or
``python -m hifi_fusion_tpu.runtime.native``) accelerates host-side decode
and ASCII export — the components the reference implements natively
(FUSION.cpp:182-216 decode; OccupancyGrid.hpp:456-488 export).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libfusion_native.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    i64p = ctypes.POINTER(ctypes.c_int64)
    i64 = ctypes.c_int64
    lib.hf_decode_xyzrgb.argtypes = [u8p, i64, i64, i64, i64, i64, i64,
                                     ctypes.c_int, f32p, f32p]
    lib.hf_decode_xyzrgb.restype = None
    lib.hf_zclip_compact.argtypes = [f32p, f32p, i64, ctypes.c_float,
                                     ctypes.c_float, f32p, f32p]
    lib.hf_zclip_compact.restype = i64
    lib.hf_write_ascii_table.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                         f32p, i64, i64, ctypes.c_int]
    lib.hf_write_ascii_table.restype = ctypes.c_int
    f64p = ctypes.POINTER(ctypes.c_double)
    lib.hf_write_metadata_csv.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                          f64p, i64p, i64]
    lib.hf_write_metadata_csv.restype = ctypes.c_int
    _lib = lib
    return _lib


def build(force: bool = False) -> bool:
    """Compile the shared library in-place via make. Returns success."""
    if os.path.exists(_LIB_PATH) and not force:
        return True
    try:
        subprocess.run(["make", "-C", _DIR] + (["--always-make"] if force
                                               else []),
                       check=True, capture_output=True)
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False
    global _tried, _lib
    _tried = False
    _lib = None
    return _load() is not None


def available() -> bool:
    return _load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def decode_xyzrgb(data: bytes, n_points: int, point_step: int,
                  off_x: int, off_y: int, off_z: int, off_rgb: int,
                  blue_shift_bug: bool = False):
    lib = _load()
    buf = np.frombuffer(data, np.uint8)
    out_xyz = np.empty((n_points, 3), np.float32)
    out_rgb = np.empty((n_points, 3), np.float32)
    lib.hf_decode_xyzrgb(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n_points, point_step, off_x, off_y, off_z, off_rgb,
        1 if blue_shift_bug else 0, _fptr(out_xyz), _fptr(out_rgb))
    return out_xyz, out_rgb


def zclip_compact(xyz: np.ndarray, rgb: np.ndarray, zmin: float,
                  zmax: float):
    lib = _load()
    n = xyz.shape[0]
    out_xyz = np.empty_like(xyz)
    out_rgb = np.empty_like(rgb)
    m = lib.hf_zclip_compact(_fptr(xyz), _fptr(rgb), n, zmin, zmax,
                             _fptr(out_xyz), _fptr(out_rgb))
    return out_xyz[:m], out_rgb[:m]


def write_pcd_ascii(path: str, header: str, cols: np.ndarray) -> None:
    lib = _load()
    cols = np.ascontiguousarray(cols, np.float32)
    rc = lib.hf_write_ascii_table(path.encode(), header.encode(),
                                  _fptr(cols), cols.shape[0], cols.shape[1],
                                  0)
    if rc != 0:
        raise IOError(f"native ascii write failed for {path}")


def write_metadata_csv(path: str, header: str, cols5: np.ndarray,
                       count: np.ndarray) -> None:
    """cols5 must be float64: the native writer formats doubles with %.6g,
    byte-identical to the NumPy fallback (the format oracle, io/pcd.py)."""
    lib = _load()
    cols5 = np.ascontiguousarray(cols5, np.float64)
    count = np.ascontiguousarray(count, np.int64)
    rc = lib.hf_write_metadata_csv(
        path.encode(), header.encode(),
        cols5.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        count.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        cols5.shape[0])
    if rc != 0:
        raise IOError(f"native csv write failed for {path}")


if __name__ == "__main__":
    ok = build(force=True)
    print(f"native build {'ok' if ok else 'FAILED'}: {_LIB_PATH}")
