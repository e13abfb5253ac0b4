"""Pure-NumPy sequential oracle of the fusion semantics.

This is the "golden-path oracle" from the survey's test strategy (§4): a
small, readable, sequential re-statement of the reference algorithm
(OccupancyGrid.hpp addPoints / updateThicknessVectors / downloadData,
FUSION.cpp decode/clip/transform threads) used to check the TPU kernels
point-for-point on synthetic frames, and — timed — as the CPU baseline
denominator for the benchmark (BASELINE.md north-star).

Semantics follow the reference with the deliberate, documented fixes also
applied on the TPU path (see ops/geometry.py and ops/refine.py docstrings):

* insert requires validCoord (edge-sliver points dropped),
* ghost-voxel dependants are appended, not overwritten,
* stats use commutative centered sums (what the reference's running Welford
  converges to), ``mean_dist`` is 0-initialized,
* PCA normal from numpy.linalg.eigh (smallest eigenvector).

Geometry math is done in float32 to mirror the device arithmetic.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..config import FusionConfig


@dataclasses.dataclass
class OracleVoxel:
    occupied: bool = False
    normal_found: bool = False
    normal: Optional[np.ndarray] = None
    viewpoint: Optional[np.ndarray] = None
    count: int = 0
    sum_q: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(3, np.float64))
    sumsq_q: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(3, np.float64))
    sum_d: float = 0.0
    sumsq_d: float = 0.0
    buffer: List[np.ndarray] = dataclasses.field(default_factory=list)
    deps: List[int] = dataclasses.field(default_factory=list)
    rgb_sum: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(3, np.float64))
    n_pts: int = 0


class OracleGrid:
    def __init__(self, config: FusionConfig):
        self.config = config
        self.dims = config.dims
        self.origin = np.asarray(config.origin, np.float32)
        self.res = np.asarray(config.resolution, np.float32)
        self.voxels: Dict[int, OracleVoxel] = {}

    # -- geometry helpers (mirror ops/geometry.py in f32) -----------------
    def cell_coords(self, p: np.ndarray) -> np.ndarray:
        return np.floor((p.astype(np.float32) - self.origin)
                        / self.res).astype(np.int64)

    def cell_center(self, c: np.ndarray) -> np.ndarray:
        return (self.origin + self.res
                * (c.astype(np.float32) + np.float32(0.5)))

    def valid_point(self, p: np.ndarray) -> bool:
        b = self.config.bbox
        lo = np.asarray([b[0], b[2], b[4]], np.float32)
        hi = np.asarray([b[1], b[3], b[5]], np.float32)
        p = p.astype(np.float32)
        return bool(np.all(p > lo) and np.all(p < hi))

    def valid_coord(self, c: np.ndarray) -> bool:
        return bool(np.all(c >= 0) and np.all(c < np.asarray(self.dims)))

    def cell_id(self, c: np.ndarray) -> int:
        _, dy, dz = self.dims
        return int((c[0] * dy + c[1]) * dz + c[2])

    def id_to_coords(self, cid: int) -> np.ndarray:
        _, dy, dz = self.dims
        z = cid % dz
        xy = cid // dz
        return np.asarray([xy // dy, xy % dy, z], np.int64)

    # -- integrate (FUSION.cpp:251-296 + OccupancyGrid.hpp:185-280) --------
    def integrate_frame(self, points_cam: np.ndarray, rgb: np.ndarray,
                        pose: np.ndarray) -> None:
        pose = pose.astype(np.float32)
        R, t = pose[:3, :3], pose[:3, 3]
        zmin, zmax = self.config.z_clip
        vp = t.copy()
        for i in range(points_cam.shape[0]):
            pc = points_cam[i].astype(np.float32)
            if not (pc[2] > zmin and pc[2] < zmax):
                continue
            # elementwise transform, mirrors ops.geometry.transform_points
            p = np.asarray([
                R[0, 0] * pc[0] + R[0, 1] * pc[1] + R[0, 2] * pc[2] + t[0],
                R[1, 0] * pc[0] + R[1, 1] * pc[1] + R[1, 2] * pc[2] + t[1],
                R[2, 0] * pc[0] + R[2, 1] * pc[1] + R[2, 2] * pc[2] + t[2],
            ], np.float32)
            self.add_point(p, rgb[i], vp)

    def add_point(self, p: np.ndarray, rgb: np.ndarray,
                  viewpoint: np.ndarray) -> None:
        if not self.valid_point(p):
            return
        c = self.cell_coords(p)
        if not self.valid_coord(c):
            return
        cid = self.cell_id(c)
        v = self.voxels.get(cid)
        if v is None:
            v = OracleVoxel()
            self.voxels[cid] = v
        if not v.occupied:
            v.occupied = True
            v.viewpoint = viewpoint.astype(np.float32).copy()
        if not v.normal_found:
            v.buffer.append(p.copy())
        v.n_pts += 1
        v.rgb_sum += rgb.astype(np.float64)
        # stream through dependants (OccupancyGrid.hpp:244-277)
        for oid in v.deps:
            self._cylinder_accumulate(self.voxels[oid], oid, p)

    def _cylinder_accumulate(self, owner: OracleVoxel, oid: int,
                             p: np.ndarray) -> None:
        center = self.cell_center(self.id_to_coords(oid))
        n = owner.normal.astype(np.float32)
        q = p.astype(np.float32) - center
        tdot = np.float32(np.dot(q, n))
        q_proj = tdot * n
        dist = float(np.linalg.norm(q - q_proj))
        if dist < self.config.cylinder_radius:
            owner.count += 1
            owner.sum_q += q_proj.astype(np.float64)
            owner.sumsq_q += (q_proj.astype(np.float64)) ** 2
            owner.sum_d += dist
            owner.sumsq_d += dist * dist

    # -- refine (OccupancyGrid.hpp:311-454) --------------------------------
    def refine(self) -> None:
        cfg = self.config
        k = cfg.k_neighborhood
        candidates = [cid for cid, v in self.voxels.items()
                      if v.occupied and not v.normal_found]
        candidates.sort()
        for cid in candidates:
            v = self.voxels[cid]
            c = self.id_to_coords(cid)
            occ_offsets = []
            for dx in range(-k, k + 1):
                for dy in range(-k, k + 1):
                    for dz in range(-k, k + 1):
                        nc = c + np.asarray([dx, dy, dz])
                        if not self.valid_coord(nc):
                            continue
                        nv = self.voxels.get(self.cell_id(nc))
                        if nv is not None and nv.occupied:
                            occ_offsets.append([dx, dy, dz])
            total = len(occ_offsets)
            if total < cfg.min_neighbors:
                continue
            # PCA over occupied neighbor centers, in offset space (meters)
            off = np.asarray(occ_offsets, np.float64) * self.res.astype(
                np.float64)
            mean = off.mean(axis=0)
            d = off - mean
            cov = d.T @ d / total
            w, vecs = np.linalg.eigh(cov)
            normal = vecs[:, 0].astype(np.float32)   # smallest eigenvalue
            center = self.cell_center(c)
            dirv = v.viewpoint - center
            if float(np.dot(dirv, normal)) < 0:
                normal = -normal
            v.normal = normal
            v.normal_found = True
            # dependant registration + retroactive replay
            for i in range(-cfg.line_k, cfg.line_k + 1):
                pos = center + np.float32(i) * self.res[0] * normal
                if not self.valid_point(pos):
                    continue
                lc = self.cell_coords(pos)
                if not self.valid_coord(lc):
                    continue
                lid = self.cell_id(lc)
                lv = self.voxels.get(lid)
                if lv is None:
                    lv = OracleVoxel()        # ghost: occupied stays False
                    self.voxels[lid] = lv
                lv.deps.append(cid)
                if lv.occupied:
                    for p in lv.buffer:
                        self._cylinder_accumulate(v, cid, p)
        if self.config.reclaim_buffer:
            # mirror of the device's post-pass reclamation (ops/refine.py):
            # frozen buffers of normal-found voxels are dropped
            for v in self.voxels.values():
                if v.normal_found and v.buffer:
                    v.buffer.clear()

    # -- extract (OccupancyGrid.hpp:456-488) -------------------------------
    def extract(self) -> Dict[str, np.ndarray]:
        rows = []
        for cid in sorted(self.voxels):
            v = self.voxels[cid]
            if not (v.occupied and v.normal_found):
                continue
            center = self.cell_center(self.id_to_coords(cid))
            if v.count > 0:
                mean_q = v.sum_q / v.count
                centroid = center.astype(np.float64) + mean_q
                sd = v.sumsq_q / v.count - mean_q ** 2
                mean_d = v.sum_d / v.count
                sd_d = v.sumsq_d / v.count - mean_d ** 2
            else:
                centroid = np.zeros(3)
                sd = np.zeros(3)
                mean_d = 0.0
                sd_d = 0.0
            rgb = v.rgb_sum / max(v.n_pts, 1)
            rows.append((cid, centroid, v.normal, sd, mean_d, sd_d,
                         v.count, rgb, v.n_pts))
        if not rows:
            empty3 = np.zeros((0, 3))
            return {"cell": np.zeros(0, np.int64), "centroid": empty3,
                    "normal": empty3, "sd": empty3,
                    "mean_dist": np.zeros(0), "sd_dist": np.zeros(0),
                    "count": np.zeros(0, np.int64), "rgb": empty3,
                    "n_pts": np.zeros(0, np.int64)}
        return {
            "cell": np.asarray([r[0] for r in rows], np.int64),
            "centroid": np.stack([r[1] for r in rows]),
            "normal": np.stack([r[2] for r in rows]).astype(np.float64),
            "sd": np.stack([r[3] for r in rows]),
            "mean_dist": np.asarray([r[4] for r in rows]),
            "sd_dist": np.asarray([r[5] for r in rows]),
            "count": np.asarray([r[6] for r in rows], np.int64),
            "rgb": np.stack([r[7] for r in rows]),
            "n_pts": np.asarray([r[8] for r in rows], np.int64),
        }
