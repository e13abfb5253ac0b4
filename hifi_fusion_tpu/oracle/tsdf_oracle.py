"""Pure-NumPy oracle for the TSDF variant (models/tsdf.py).

Restates the TSDF integrate/extract semantics with sequential dictionary
accumulation — the same role oracle.py plays for the flagship pipeline
(survey §4: the reference has no tests, so parity is established against an
independent restatement).  All arithmetic is float32 in the same operation
order as the device kernel, so small-frame results agree to f32
reduction-order noise (integer cells exactly, accumulated sums to ~1e-5).

Semantics restated (see models/tsdf.py for the device formulation):
* per valid point, S samples at centered-integer offsets spanning [-tau, tau]
  along the unit camera->point ray; sample voxel accumulates (w=1, -s);
* the middle sample (s == 0) also accumulates the point color;
* a point is valid iff lane-masked, camera-z in (zmin, zmax), every sample
  position strictly inside the bbox and its cell inside [0, dims);
  NB validity is PER SAMPLE on device — a sample outside the bbox drops
  only that sample;
* extraction keeps voxels with weight >= min_weight and |mean sdf| <
  surface_band * res_x; normal = normalized central-difference TSDF
  gradient (one-sided where a neighbor is missing); centroid =
  center - tsdf * normal.
"""

from __future__ import annotations

import numpy as np

from ..models.tsdf import TsdfConfig


class TsdfOracle:
    def __init__(self, config: TsdfConfig):
        self.cfg = config
        self.cells = {}      # cell id -> [w_sum, wsdf_sum, r, g, b, n_rgb]

    def integrate_frame(self, points_cam: np.ndarray, rgb: np.ndarray,
                        pose: np.ndarray) -> None:
        """points_cam (N,3) f32 camera-frame; rgb (N,3) f32 or None."""
        cfg = self.cfg.base
        f32 = np.float32
        pts = np.asarray(points_cam, f32)
        pose = np.asarray(pose, f32)
        S = self.cfg.n_samples
        tau = f32(self.cfg.truncation)
        origin = np.asarray(cfg.origin, f32)
        res = np.asarray(cfg.resolution, f32)
        dims = np.asarray(cfg.dims, np.int64)
        b = np.asarray(cfg.bbox, f32)
        zmin, zmax = cfg.z_clip

        world = (pts @ pose[:3, :3].T.astype(f32)
                 + pose[:3, 3].astype(f32))                    # (N,3)
        vp = pose[:3, 3].astype(f32)
        ray = world - vp
        dist = np.sqrt(np.sum(ray * ray, axis=1, dtype=f32)).astype(f32)
        dirn = ray / np.maximum(dist, f32(1e-6))[:, None]
        zok = (pts[:, 2] > zmin) & (pts[:, 2] < zmax)

        # identical bit construction to the device kernel (models/tsdf.py):
        # centered integers x an f64-computed step cast to f32
        step = f32(2.0 * self.cfg.truncation / (S - 1))
        svals = ((np.arange(S, dtype=f32) - f32((S - 1) / 2.0))
                 * step).astype(f32)
        for i in np.flatnonzero(zok):
            for j, s in enumerate(svals):
                pos = (world[i] + s * dirn[i]).astype(f32)
                if not ((pos > b[[0, 2, 4]]).all()
                        and (pos < b[[1, 3, 5]]).all()):
                    continue
                c = np.floor((pos - origin) / res).astype(np.int64)
                if (c < 0).any() or (c >= dims).any():
                    continue
                cid = int((c[0] * dims[1] + c[1]) * dims[2] + c[2])
                acc = self.cells.setdefault(cid, [f32(0)] * 6)
                acc[0] += f32(1.0)
                acc[1] += f32(-s)
                if j == S // 2 and rgb is not None:
                    acc[2] += f32(rgb[i, 0])
                    acc[3] += f32(rgb[i, 1])
                    acc[4] += f32(rgb[i, 2])
                    acc[5] += f32(1.0)

    def extract(self) -> dict:
        cfg = self.cfg.base
        f32 = np.float32
        origin = np.asarray(cfg.origin, f32)
        res = np.asarray(cfg.resolution, f32)
        dims = np.asarray(cfg.dims, np.int64)

        def mean_sdf(cid):
            acc = self.cells.get(cid)
            if acc is None or acc[0] <= 0:
                return None
            return f32(acc[1] / max(acc[0], 1e-9))

        out = {k: [] for k in ("cell", "centroid", "normal", "tsdf",
                               "weight", "rgb")}
        for cid in sorted(self.cells):
            acc = self.cells[cid]
            t = mean_sdf(cid)
            if t is None or acc[0] < self.cfg.min_weight or \
                    abs(t) >= self.cfg.surface_band * res[0]:
                continue
            c = np.asarray([cid // (dims[1] * dims[2]),
                            (cid // dims[2]) % dims[1],
                            cid % dims[2]], np.int64)
            center = (origin + res * (c.astype(f32) + f32(0.5))).astype(f32)
            grad = np.zeros(3, f32)
            for ax in range(3):
                vals = []
                for sign in (1, -1):
                    cc = c.copy()
                    cc[ax] += sign
                    ok = (cc >= 0).all() and (cc < dims).all()
                    tn = mean_sdf(int((cc[0] * dims[1] + cc[1]) * dims[2]
                                      + cc[2])) if ok else None
                    vals.append((t if tn is None else tn, tn is not None))
                (fp, okp), (fm, okm) = vals
                span = f32((okp + okm) * res[ax])
                grad[ax] = (fp - fm) / max(span, f32(1e-9))
            gn = np.sqrt(np.sum(grad * grad, dtype=f32))
            normal = (grad / gn if gn > 1e-9
                      else np.asarray([0, 0, 1], f32)).astype(f32)
            nrgb = max(acc[5], 1.0)
            out["cell"].append(cid)
            out["centroid"].append(center - t * normal)
            out["normal"].append(normal)
            out["tsdf"].append(t)
            out["weight"].append(acc[0])
            out["rgb"].append(np.asarray(acc[2:5], f32) / f32(nrgb))
        return {k: np.asarray(v) for k, v in out.items()}
