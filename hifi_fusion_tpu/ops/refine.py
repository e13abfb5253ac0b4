"""Normal refinement pass: the TPU rebuild of ``updateThicknessVectors``.

The reference (OccupancyGrid.hpp:311-454) walks every unprocessed voxel,
counts occupied cells in its 5x5x5 neighborhood, PCA-fits a plane normal over
the occupied neighbor centers, orients it toward the stored viewpoint, then
walks +-K voxels along the normal registering itself as a *dependant* of each
line voxel (creating "ghost" voxels where the line leaves occupancy) and
retroactively pushes each line voxel's buffered points through the cylinder
filter.

Here the whole pass is one batched device function:

* candidate compaction (occupied & !normal_found) with a static bound,
* neighborhood occupancy via batched hash lookups (125 keys per candidate),
* covariance in *offset space* (translation-invariant, so one shared
  (12, 125) moment basis turns the PCA accumulation into a single MXU
  matmul),
* closed-form eigen33 for the smallest eigenvector (ops/eigen33.py,
  component form — pure VPU),
* dependant-table append via sort + segment-rank (deterministic, replaces the
  reference's sequential ``dependants.push_back``),
* retroactive buffer replay vectorized over (new-dep slot x buffer lane).

Parallelizing the pass is semantically exact: within one reference pass,
processing order only affects ghost creation (where the reference *overwrites*
an existing ghost's dependants, OccupancyGrid.hpp:443-449 — a leak/link-loss
bug we fix by appending) — all statistics are consumed from pre-pass state.

Layout: candidate-batched intermediates are (M, U) / (3, M, U) planar — the
long axis minor (see ops/geometry.py on TPU tiling).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import FusionConfig
from ..grid import GridState
from . import geometry, hashing
from .eigen33 import smallest_eigenpair_sym


def _neighbor_offsets(config: FusionConfig) -> np.ndarray:
    """(3,M) int offsets in the same order as the reference's setK loop
    (OccupancyGrid.hpp:138-149): i (x) outermost, k (z) innermost."""
    k = config.k_neighborhood
    r = np.arange(-k, k + 1)
    grid = np.stack(np.meshgrid(r, r, r, indexing="ij"), axis=-1)
    return grid.reshape(-1, 3).T.copy()


def refine_pass_impl(grid: GridState, *, config: FusionConfig) -> GridState:
    C = config.capacity
    D = config.max_dependants
    U = config.max_refine_candidates
    K = config.line_k
    L = config.n_line            # 2K+1

    # --- candidate compaction -------------------------------------------
    cand_mask = grid.occupied & ~grid.normal_found
    n_cand = jnp.sum(cand_mask.astype(jnp.int32))
    (cand_slot,) = jnp.nonzero(cand_mask, size=U, fill_value=-1)
    cand_ok = cand_slot >= 0
    cslot = jnp.clip(cand_slot, 0, C - 1)
    overflow_refine = grid.overflow_refine + jnp.maximum(n_cand - U, 0)

    coords = geometry.id_to_coords(grid.key[cslot], config)       # (3,U)
    center = geometry.cell_center(coords, config)                 # (3,U)

    # --- neighborhood occupancy (OccupancyGrid.hpp:334-349) --------------
    offsets = jnp.asarray(_neighbor_offsets(config), jnp.int32)   # (3,M)
    M = offsets.shape[1]
    ncoords = coords[:, None, :] + offsets[:, :, None]            # (3,M,U)
    nvalid = geometry.valid_coords(ncoords, config) & cand_ok[None, :]
    nids = geometry.cell_id(ncoords, config)                      # (M,U)
    nslot = hashing.lookup(grid.key, nids.reshape(-1),
                           nvalid.reshape(-1), config.max_probes)
    nslot = nslot.reshape(M, U)
    nocc = (nslot >= 0) & grid.occupied[jnp.clip(nslot, 0, C - 1)] & nvalid
    total = jnp.sum(nocc.astype(jnp.int32), axis=0)               # (U,)
    gated = cand_ok & (total >= config.min_neighbors)             # "total>20"

    # --- PCA normal over occupied neighbor centers -----------------------
    # Work in offset space (meters, relative to the candidate's center):
    # translation-invariant, so all candidates share one (12,M) moment basis
    # and the accumulation is a single (12,M)x(M,U) MXU matmul.
    res = jnp.asarray(config.resolution, jnp.float32)
    off_m = offsets.astype(jnp.float32) * res[:, None]            # (3,M)
    ox, oy, oz = off_m[0], off_m[1], off_m[2]
    basis = jnp.stack([ox, oy, oz,
                       ox * ox, ox * oy, ox * oz,
                       oy * oy, oy * oz, oz * oz], axis=0)        # (9,M)
    moments = jnp.dot(basis, nocc.astype(jnp.float32),
                      preferred_element_type=jnp.float32)         # (9,U)
    tot_f = jnp.maximum(total.astype(jnp.float32), 1.0)           # (U,)
    mx, my, mz = (moments[0] / tot_f, moments[1] / tot_f,
                  moments[2] / tot_f)
    a00 = moments[3] / tot_f - mx * mx
    a01 = moments[4] / tot_f - mx * my
    a02 = moments[5] / tot_f - mx * mz
    a11 = moments[6] / tot_f - my * my
    a12 = moments[7] / tot_f - my * mz
    a22 = moments[8] / tot_f - mz * mz
    _, nvec = smallest_eigenpair_sym(a00, a01, a02, a11, a12, a22)  # (3,U)

    # Orient toward stored viewpoint (OccupancyGrid.hpp:393-396).
    vp = grid.viewpoint[:, cslot]                                 # (3,U)
    flip = jnp.sum((vp - center) * nvec, axis=0) < 0.0
    nvec = jnp.where(flip[None, :], -nvec, nvec)

    norm_idx = jnp.where(gated, cand_slot, C)
    normal = grid.normal.at[:, norm_idx].set(nvec, mode="drop")
    normal_found = grid.normal_found.at[norm_idx].set(True, mode="drop")

    # --- line voxels / ghost creation (OccupancyGrid.hpp:403-450) --------
    steps = jnp.arange(-K, K + 1, dtype=jnp.float32)              # (L,)
    # NB: the reference steps by xres_ only (its own TODO at GRID.hpp:391).
    line_pts = (center[:, None, :]
                + steps[None, :, None] * res[0] * nvec[:, None, :])  # (3,L,U)
    lp_valid = geometry.valid_points(line_pts, config) & gated[None, :]
    lcoords = geometry.cell_coords(line_pts, config)
    lp_valid = lp_valid & geometry.valid_coords(lcoords, config)  # (L,U)
    lids = geometry.cell_id(lcoords, config)
    key_table, lslot, _ = hashing.lookup_or_insert(
        grid.key, lids.reshape(-1), lp_valid.reshape(-1), config.max_probes)
    # Ghost semantics: a fresh slot gets only its key — occupied stays False,
    # matching the reference's ghost VoxelInfo (occupied=false, data set).
    lslot = lslot.reshape(L, U)
    pair_ok = lp_valid & (lslot >= 0)
    # A diagonal normal can revisit the same cell on consecutive steps; the
    # reference registers each visit, so duplicates are kept for parity.

    # --- dependant append: sort by line slot, rank within segment --------
    flatL = jnp.where(pair_ok, lslot, jnp.int32(C)).reshape(-1)   # (L*U,)
    flatO = jnp.broadcast_to(cand_slot[None, :], (L, U)).reshape(-1)
    order = jnp.argsort(flatL, stable=True)
    sL = flatL[order]
    sO = flatO[order]
    s_ok = sL < C
    idx = jnp.arange(sL.shape[0], dtype=jnp.int32)
    boundary = jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), sL[1:] != sL[:-1]])
    seg_start = jnp.where(boundary, idx, 0)
    seg_start = jax.lax.associative_scan(jnp.maximum, seg_start)
    rank = idx - seg_start
    sL_safe = jnp.clip(sL, 0, C - 1)
    pos = grid.dep_count[sL_safe] + rank
    write_ok = s_ok & (pos < D)
    wL = jnp.where(write_ok, sL, C)
    dep_count_old = grid.dep_count
    dep = grid.dep.at[jnp.clip(pos, 0, D - 1), wL].set(sO, mode="drop")
    dep_count = grid.dep_count.at[wL].add(1, mode="drop")
    overflow_dep = grid.overflow_dep + jnp.sum(
        (s_ok & ~write_ok).astype(jnp.int32))

    # --- retroactive buffer replay (OccupancyGrid.hpp:418-440) -----------
    # For every buffered point whose voxel just gained new dependants,
    # project it onto each new owner's axis and accumulate on a hit.
    Dj = jnp.arange(D, dtype=jnp.int32)[:, None]
    bslot = grid.buf_slot                                          # (B,)
    b_ok = bslot >= 0
    bs = jnp.clip(bslot, 0, C - 1)
    is_new = (b_ok[None, :] & (Dj >= dep_count_old[bs][None, :])
              & (Dj < dep_count[bs][None, :]))                     # (D,B)
    owner = dep[:, bs]                                             # (D,B)
    is_new = is_new & (owner >= 0)
    o_safe = jnp.clip(owner, 0, C - 1)
    o_center = geometry.cell_center(
        geometry.id_to_coords(key_table[o_safe], config), config)  # (3,D,B)
    o_normal = normal[:, o_safe]                                   # (3,D,B)
    q = grid.buf_pts[:, None, :] - o_center
    q_proj, dist = geometry.project_to_axis(q, o_normal)
    hit = is_new & (dist < config.cylinder_radius)
    stats = jnp.concatenate(
        [q_proj, q_proj * q_proj, dist[None], (dist * dist)[None]],
        axis=0)                                                    # (8,D,B)
    owner_drop = jnp.where(hit, owner, C).reshape(-1)
    cyl_stats = grid.cyl_stats.at[:, owner_drop].add(
        stats.reshape(8, -1), mode="drop")
    count = grid.count.at[owner_drop].add(1, mode="drop")

    return grid._replace(
        key=key_table,
        normal=normal,
        normal_found=normal_found,
        dep=dep,
        dep_count=dep_count,
        cyl_stats=cyl_stats,
        count=count,
        overflow_dep=overflow_dep,
        overflow_refine=overflow_refine,
    )


refine_pass = partial(jax.jit, static_argnames=("config",),
                      donate_argnames=("grid",))(refine_pass_impl)
