"""ctypes wrapper for the C++ reference-equivalent oracle.

``NativeOracle`` mirrors the OracleGrid API (integrate_frame / refine /
extract) at C++ speed — used for large parity tests and as the benchmark's
single-threaded CPU baseline (the reference integrates serially; survey §6).
"""

from __future__ import annotations

import ctypes
import os
from typing import Dict, Optional

import numpy as np

from ..config import FusionConfig

_LIB_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "..", "runtime", "native", "liboracle_native.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    path = os.path.abspath(_LIB_PATH)
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    f32p = ctypes.POINTER(ctypes.c_float)
    f64p = ctypes.POINTER(ctypes.c_double)
    i64p = ctypes.POINTER(ctypes.c_int64)
    i64 = ctypes.c_int64
    lib.hf_oracle_create.argtypes = [f64p, f32p, ctypes.c_float,
                                     ctypes.c_float, ctypes.c_float,
                                     ctypes.c_int, ctypes.c_int,
                                     ctypes.c_int, i64p]
    lib.hf_oracle_create.restype = ctypes.c_void_p
    lib.hf_oracle_add_frame.argtypes = [ctypes.c_void_p, f32p, i64, f32p]
    lib.hf_oracle_add_frame.restype = None
    lib.hf_oracle_refine.argtypes = [ctypes.c_void_p]
    lib.hf_oracle_refine.restype = None
    lib.hf_oracle_set_reclaim.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.hf_oracle_set_reclaim.restype = None
    lib.hf_oracle_extract.argtypes = [ctypes.c_void_p, f32p, f32p, f64p,
                                      f64p, i64p, i64p, i64]
    lib.hf_oracle_extract.restype = i64
    lib.hf_oracle_n_voxels.argtypes = [ctypes.c_void_p]
    lib.hf_oracle_n_voxels.restype = i64
    lib.hf_oracle_destroy.argtypes = [ctypes.c_void_p]
    lib.hf_oracle_destroy.restype = None
    # TSDF variant oracle (BASELINE config 5 denominator) — older .so
    # builds lack it; gate on presence so a stale library still serves
    # the flagship oracle
    if hasattr(lib, "hf_tsdf_create"):
        lib.hf_tsdf_create.argtypes = [f64p, f32p, ctypes.c_float,
                                       ctypes.c_float, ctypes.c_float,
                                       ctypes.c_int, i64p]
        lib.hf_tsdf_create.restype = ctypes.c_void_p
        lib.hf_tsdf_add_frame.argtypes = [ctypes.c_void_p, f32p, i64, f32p]
        lib.hf_tsdf_add_frame.restype = None
        lib.hf_tsdf_extract.argtypes = [ctypes.c_void_p, ctypes.c_float,
                                        ctypes.c_float, i64p, f32p, f32p,
                                        i64]
        lib.hf_tsdf_extract.restype = i64
        lib.hf_tsdf_n_cells.argtypes = [ctypes.c_void_p]
        lib.hf_tsdf_n_cells.restype = i64
        lib.hf_tsdf_destroy.argtypes = [ctypes.c_void_p]
        lib.hf_tsdf_destroy.restype = None
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _f32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


class NativeOracle:
    def __init__(self, config: FusionConfig):
        lib = _load()
        if lib is None:
            raise RuntimeError(
                "liboracle_native.so not built; run `make` in "
                "hifi_fusion_tpu/runtime/native")
        self._lib = lib
        self.config = config
        bbox = np.asarray(config.bbox, np.float64)
        res = np.asarray(config.resolution, np.float32)
        dims = np.asarray(config.dims, np.int64)
        self._h = lib.hf_oracle_create(
            bbox.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            _f32p(res), config.z_clip[0], config.z_clip[1],
            config.cylinder_radius, config.k_neighborhood, config.line_k,
            config.min_neighbors,
            dims.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        lib.hf_oracle_set_reclaim(self._h,
                                  1 if config.reclaim_buffer else 0)

    def integrate_frame(self, points_cam: np.ndarray,
                        rgb: Optional[np.ndarray],
                        pose: np.ndarray) -> None:
        pts = np.ascontiguousarray(points_cam, np.float32)
        pose = np.ascontiguousarray(pose, np.float32)
        self._lib.hf_oracle_add_frame(self._h, _f32p(pts), pts.shape[0],
                                      _f32p(pose))

    def refine(self) -> None:
        self._lib.hf_oracle_refine(self._h)

    def n_voxels(self) -> int:
        return int(self._lib.hf_oracle_n_voxels(self._h))

    def extract(self, cap: int = 1 << 22) -> Dict[str, np.ndarray]:
        centroid = np.empty((cap, 3), np.float32)
        normal = np.empty((cap, 3), np.float32)
        sd = np.empty((cap, 3), np.float64)
        dist = np.empty((cap, 2), np.float64)
        count = np.empty(cap, np.int64)
        cell = np.empty(cap, np.int64)
        n = int(self._lib.hf_oracle_extract(
            self._h, _f32p(centroid), _f32p(normal),
            sd.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            dist.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            count.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            cell.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), cap))
        return {
            "cell": cell[:n].copy(),
            "centroid": centroid[:n].astype(np.float64),
            "normal": normal[:n].astype(np.float64),
            "sd": sd[:n].copy(),
            "mean_dist": dist[:n, 0].copy(),
            "sd_dist": dist[:n, 1].copy(),
            "count": count[:n].copy(),
        }

    def __del__(self):
        try:
            if getattr(self, "_h", None):
                self._lib.hf_oracle_destroy(self._h)
                self._h = None
        except Exception:
            pass


def tsdf_available() -> bool:
    lib = _load()
    return lib is not None and hasattr(lib, "hf_tsdf_create")


class NativeTsdfOracle:
    """Single-threaded C++ TSDF band integrator — the BASELINE config-5
    denominator (PERF.md §12).  Mirrors oracle/tsdf_oracle.py's semantics
    (geometry path; color accumulation omitted, as in the flagship
    baseline timing)."""

    def __init__(self, tsdf_config):
        lib = _load()
        if lib is None or not hasattr(lib, "hf_tsdf_create"):
            raise RuntimeError(
                "liboracle_native.so missing the TSDF oracle; rebuild with "
                "`make` in hifi_fusion_tpu/runtime/native")
        self._lib = lib
        self.cfg = tsdf_config
        base = tsdf_config.base
        bbox = np.asarray(base.bbox, np.float64)
        res = np.asarray(base.resolution, np.float32)
        dims = np.asarray(base.dims, np.int64)
        self._h = lib.hf_tsdf_create(
            bbox.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            _f32p(res), base.z_clip[0], base.z_clip[1],
            tsdf_config.truncation, tsdf_config.n_samples,
            dims.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))

    def integrate_frame(self, points_cam: np.ndarray,
                        pose: np.ndarray) -> None:
        pts = np.ascontiguousarray(points_cam, np.float32)
        pose = np.ascontiguousarray(pose, np.float32)
        self._lib.hf_tsdf_add_frame(self._h, _f32p(pts), pts.shape[0],
                                    _f32p(pose))

    def n_cells(self) -> int:
        return int(self._lib.hf_tsdf_n_cells(self._h))

    def extract(self, cap: int = 1 << 22) -> Dict[str, np.ndarray]:
        cell = np.empty(cap, np.int64)
        tsdf = np.empty(cap, np.float32)
        weight = np.empty(cap, np.float32)
        n = int(self._lib.hf_tsdf_extract(
            self._h, self.cfg.min_weight, self.cfg.surface_band,
            cell.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            _f32p(tsdf), _f32p(weight), cap))
        n = min(n, cap)
        return {"cell": cell[:n].copy(), "tsdf": tsdf[:n].copy(),
                "weight": weight[:n].copy()}

    def __del__(self):
        try:
            if getattr(self, "_h", None):
                self._lib.hf_tsdf_destroy(self._h)
                self._h = None
        except Exception:
            pass
