"""Tests: TSDF model family + spatial-hash queries."""

import jax.numpy as jnp
import numpy as np
import pytest

from hifi_fusion_tpu.config import small_test_config
from hifi_fusion_tpu.grid import make_grid, occupied_slots
from hifi_fusion_tpu.models.tsdf import (TsdfConfig, TsdfPipeline,
                                         tsdf_to_host)
from hifi_fusion_tpu.ops import integrate_frame, refine_pass
from hifi_fusion_tpu.ops.queries import (occupied_neighbor_counts,
                                         query_points, radius_outlier_mask)
from hifi_fusion_tpu.utils.synthetic import make_sweep, pad_frame

CFG = small_test_config()


def _plane_frames(n_frames=4, n_pts=1500, z0=0.1, seed=0):
    """Flat plane z=z0 observed from above (plane normal = +z)."""
    rng = np.random.default_rng(seed)
    frames = []
    cam_h = 0.25
    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = [[1, 0, 0], [0, -1, 0], [0, 0, -1]]
    pose[:3, 3] = [0.0, 0.0, z0 + cam_h]
    inv = np.linalg.inv(pose.astype(np.float64))
    for _ in range(n_frames):
        w = np.stack([rng.uniform(-0.15, 0.15, n_pts),
                      rng.uniform(-0.15, 0.15, n_pts),
                      np.full(n_pts, z0) + rng.normal(0, 1e-4, n_pts)],
                     axis=-1)
        pc = (w @ inv[:3, :3].T + inv[:3, 3]).astype(np.float32)
        frames.append((pc, rng.uniform(0, 255, (n_pts, 3)).astype(
            np.float32), pose))
    return frames


def _to_planar(pc, rgb, n_max):
    pts = np.zeros((3, n_max), np.float32)
    cols = np.zeros((3, n_max), np.float32)
    mask = np.zeros(n_max, bool)
    n = pc.shape[0]
    pts[:, :n] = pc.T
    cols[:, :n] = rgb.T
    mask[:n] = True
    return jnp.asarray(pts), jnp.asarray(cols), jnp.asarray(mask)


def test_tsdf_reconstructs_plane():
    cfg = TsdfConfig(base=small_test_config(z_clip=(0.05, 0.5)),
                     truncation=0.03, n_samples=7, min_weight=3.0)
    pipe = TsdfPipeline(cfg)
    grid = pipe.init()
    for pc, rgb, pose in _plane_frames():
        pts, cols, mask = _to_planar(pc, rgb, cfg.base.max_points)
        grid = pipe.step(grid, pts, cols, mask, jnp.asarray(pose))
    out = tsdf_to_host(pipe.extract(grid))
    n = out["cell"].shape[0]
    assert n > 200
    # surface voxels sit near the plane; TSDF-projected centroids closer
    # to z=0.1 than raw voxel quantization
    err = np.abs(out["centroid"][:, 2] - 0.1)
    assert np.median(err) < 0.004          # sub-voxel (pitch = 0.01)
    # gradient normals point along +z (toward the camera side)
    nz = out["normal"][:, 2]
    assert (np.abs(nz) > 0.9).mean() > 0.9
    # weights accumulate across frames
    assert out["weight"].max() >= 4


def test_tsdf_signs():
    """Voxels in front of the surface (toward camera) have positive tsdf."""
    cfg = TsdfConfig(base=small_test_config(z_clip=(0.05, 0.5)),
                     truncation=0.03, n_samples=7, min_weight=0.5,
                     surface_band=10.0)     # wide band: inspect off-surface
    pipe = TsdfPipeline(cfg)
    grid = pipe.init()
    for pc, rgb, pose in _plane_frames(2):
        pts, cols, mask = _to_planar(pc, rgb, cfg.base.max_points)
        grid = pipe.step(grid, pts, cols, mask, jnp.asarray(pose))
    out = tsdf_to_host(pipe.extract(grid))
    z = out["centroid"][:, 2]
    t = out["tsdf"]
    # camera looks down from +z: cells above plane (z>0.1) -> positive sdf
    above = out["cell"] >= 0
    zc = (out["centroid"] + out["tsdf"][:, None] * out["normal"])[:, 2]
    # use raw cell center z reconstructed from centroid defn instead:
    assert (t[zc > 0.105] > 0).mean() > 0.9
    assert (t[zc < 0.095] < 0).mean() > 0.9


def _fused_grid(n_frames=5):
    grid = make_grid(CFG)
    for i, fr in enumerate(make_sweep(CFG, n_frames, 800, seed=2)):
        pf = pad_frame(fr, CFG.max_points)
        grid = integrate_frame(grid, jnp.asarray(pf.points_cam),
                               jnp.asarray(pf.rgb), jnp.asarray(pf.mask),
                               jnp.asarray(pf.pose), config=CFG)
    return refine_pass(grid, config=CFG)


def test_neighbor_counts_match_bruteforce():
    grid = _fused_grid(3)
    key = np.asarray(grid.key[:CFG.capacity])
    occ = np.asarray(occupied_slots(grid, CFG.capacity))
    occupied_cells = set(key[occ].tolist())
    slots = np.flatnonzero(occ)[:50].astype(np.int32)
    counts = occupied_neighbor_counts(grid, jnp.asarray(slots),
                                      config=CFG, radius_cells=2)
    dims = CFG.dims
    for i, s in enumerate(slots):
        cid = int(key[s])
        z = cid % dims[2]
        y = (cid // dims[2]) % dims[1]
        x = cid // (dims[2] * dims[1])
        brute = 0
        for dx in range(-2, 3):
            for dy in range(-2, 3):
                for dz in range(-2, 3):
                    xx, yy, zz = x + dx, y + dy, z + dz
                    if not (0 <= xx < dims[0] and 0 <= yy < dims[1]
                            and 0 <= zz < dims[2]):
                        continue
                    if ((xx * dims[1] + yy) * dims[2] + zz) \
                            in occupied_cells:
                        brute += 1
        assert int(counts[i]) == brute, (i, s)


def test_radius_outlier_removes_isolated_voxel():
    grid = _fused_grid(4)
    # inject one isolated occupied voxel far from the surface
    from hifi_fusion_tpu.ops import hashing as H
    lone = jnp.asarray([int(CFG.dims[2] * CFG.dims[1] * 3 + 7)], jnp.int32)
    key, slot, _ = H.lookup_or_insert(grid.key, lone, jnp.ones(1, bool),
                                      CFG.max_probes, CFG.capacity)
    # mark occupied: occupancy derives from n_pts > 0
    grid = grid._replace(key=key, n_pts=grid.n_pts.at[slot].set(1.0))
    keep = radius_outlier_mask(grid, config=CFG, radius_cells=2,
                               min_neighbors=4)
    assert not bool(keep[slot][0])          # isolated voxel rejected
    # most surface voxels survive
    surv = (float(jnp.sum(keep))
            / float(jnp.sum(occupied_slots(grid, CFG.capacity))))
    assert surv > 0.7


def test_query_points():
    grid = _fused_grid(4)
    key = np.asarray(grid.key[:CFG.capacity])
    occ_slots = np.flatnonzero(
        np.asarray(occupied_slots(grid, CFG.capacity)))[:10]
    from hifi_fusion_tpu.ops.geometry import cell_center, id_to_coords
    pts = cell_center(id_to_coords(jnp.asarray(key[occ_slots]), CFG), CFG)
    q = query_points(grid, pts, config=CFG)
    assert bool(q.occupied.all())
    # far-away point -> miss
    q2 = query_points(grid, jnp.asarray([[10.0], [10.0], [10.0]],
                                        jnp.float32), config=CFG)
    assert int(q2.slot[0]) == -1
