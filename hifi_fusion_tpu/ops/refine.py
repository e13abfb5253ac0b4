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
  (125, 12) moment matrix turns the PCA accumulation into a single MXU
  matmul),
* closed-form eigen33 for the smallest eigenvector (ops/eigen33.py),
* dependant-table append via sort + segment-rank (deterministic, replaces the
  reference's sequential ``dependants.push_back``),
* retroactive buffer replay vectorized over (buffer lane x new-dep slot).

Parallelizing the pass is semantically exact: within one reference pass,
processing order only affects ghost creation (where the reference *overwrites*
an existing ghost's dependants, OccupancyGrid.hpp:443-449 — a leak/link-loss
bug we fix by appending) — all statistics are consumed from pre-pass state.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import FusionConfig
from ..grid import GridState
from . import geometry, hashing
from .eigen33 import smallest_eigenpair


def _neighbor_offsets(config: FusionConfig) -> np.ndarray:
    """(125,3) int offsets in the same order as the reference's setK loop
    (OccupancyGrid.hpp:138-149): i (x) outermost, k (z) innermost."""
    k = config.k_neighborhood
    r = np.arange(-k, k + 1)
    return np.stack(np.meshgrid(r, r, r, indexing="ij"), axis=-1).reshape(-1, 3)


@partial(jax.jit, static_argnames=("config",), donate_argnames=("grid",))
def refine_pass(grid: GridState, *, config: FusionConfig) -> GridState:
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

    coords = geometry.id_to_coords(grid.key[cslot], config)       # (U,3)
    center = geometry.cell_center(coords, config)                 # (U,3)

    # --- neighborhood occupancy (OccupancyGrid.hpp:334-349) --------------
    offsets = jnp.asarray(_neighbor_offsets(config), jnp.int32)   # (M,3)
    M = offsets.shape[0]
    ncoords = coords[:, None, :] + offsets[None, :, :]            # (U,M,3)
    nvalid = geometry.valid_coords(ncoords, config) & cand_ok[:, None]
    nids = geometry.cell_id(ncoords, config)
    nslot = hashing.lookup(grid.key, nids.reshape(-1),
                           nvalid.reshape(-1), config.max_probes)
    nslot = nslot.reshape(U, M)
    nocc = (nslot >= 0) & grid.occupied[jnp.clip(nslot, 0, C - 1)] & nvalid
    total = jnp.sum(nocc.astype(jnp.int32), axis=1)               # (U,)
    gated = cand_ok & (total >= config.min_neighbors)             # "total>20"

    # --- PCA normal over occupied neighbor centers -----------------------
    # Work in offset space (meters, relative to the candidate's center):
    # translation-invariant, so all candidates share one (M,12) moment basis.
    res = jnp.asarray(config.resolution, jnp.float32)
    off_m = offsets.astype(jnp.float32) * res                     # (M,3)
    outer = off_m[:, :, None] * off_m[:, None, :]                 # (M,3,3)
    basis = jnp.concatenate([off_m, outer.reshape(M, 9)], axis=1)  # (M,12)
    moments = jnp.dot(nocc.astype(jnp.float32), basis,
                      preferred_element_type=jnp.float32)         # (U,12) MXU
    tot_f = jnp.maximum(total.astype(jnp.float32), 1.0)[:, None]
    mean = moments[:, :3] / tot_f                                 # (U,3)
    second = moments[:, 3:].reshape(U, 3, 3) / tot_f[..., None]
    cov = second - mean[:, :, None] * mean[:, None, :]            # (U,3,3)
    _, nvec = smallest_eigenpair(cov)

    # Orient toward stored viewpoint (OccupancyGrid.hpp:393-396).
    vp = grid.viewpoint[cslot]
    flip = jnp.sum((vp - center) * nvec, axis=-1) < 0.0
    nvec = jnp.where(flip[:, None], -nvec, nvec)

    norm_idx = jnp.where(gated, cand_slot, C)
    normal = grid.normal.at[norm_idx].set(nvec, mode="drop")
    normal_found = grid.normal_found.at[norm_idx].set(True, mode="drop")

    # --- line voxels / ghost creation (OccupancyGrid.hpp:403-450) --------
    steps = jnp.arange(-K, K + 1, dtype=jnp.float32)              # (L,)
    # NB: the reference steps by xres_ only (its own TODO at GRID.hpp:391).
    line_pts = center[:, None, :] + (steps[None, :, None]
                                     * res[0] * nvec[:, None, :])  # (U,L,3)
    lp_valid = geometry.valid_points(line_pts, config) & gated[:, None]
    lcoords = geometry.cell_coords(line_pts, config)
    lp_valid = lp_valid & geometry.valid_coords(lcoords, config)
    lids = geometry.cell_id(lcoords, config)
    key_table, lslot, _ = hashing.lookup_or_insert(
        grid.key, lids.reshape(-1), lp_valid.reshape(-1), config.max_probes)
    # Ghost semantics: a fresh slot gets only its key — occupied stays False,
    # so it matches the reference's ghost VoxelInfo (occupied=false, data set).
    lslot = lslot.reshape(U, L)
    pair_ok = lp_valid & (lslot >= 0)

    # Duplicate line cells for one owner (normal step < pitch can revisit a
    # cell): the reference registers each visit; with K steps of one pitch a
    # cell repeats only when |i| differs — dedupe matches the reference's
    # geometry since steps land in distinct cells along the dominant axis...
    # but a diagonal normal CAN revisit; keep duplicates for parity.

    # --- dependant append: sort by line slot, rank within segment --------
    flatL = jnp.where(pair_ok, lslot, jnp.int32(C)).reshape(-1)   # (U*L,)
    flatO = jnp.broadcast_to(cand_slot[:, None], (U, L)).reshape(-1)
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
    dep = grid.dep.at[wL, jnp.clip(pos, 0, D - 1)].set(sO, mode="drop")
    dep_count = grid.dep_count.at[wL].add(1, mode="drop")
    overflow_dep = grid.overflow_dep + jnp.sum(
        (s_ok & ~write_ok).astype(jnp.int32))

    # --- retroactive buffer replay (OccupancyGrid.hpp:418-440) -----------
    # For every buffered point whose voxel just gained new dependants,
    # project it onto each new owner's axis and accumulate on a hit.
    Dj = jnp.arange(D, dtype=jnp.int32)[None, :]
    bslot = grid.buf_slot                                          # (B,)
    b_ok = bslot >= 0
    bs = jnp.clip(bslot, 0, C - 1)
    is_new = (b_ok[:, None] & (Dj >= dep_count_old[bs][:, None])
              & (Dj < dep_count[bs][:, None]))                     # (B,D)
    owner = dep[bs]                                                # (B,D)
    is_new = is_new & (owner >= 0)
    o_safe = jnp.clip(owner, 0, C - 1)
    o_center = geometry.cell_center(
        geometry.id_to_coords(key_table[o_safe], config), config)  # (B,D,3)
    o_normal = normal[o_safe]                                      # (B,D,3)
    q = grid.buf_pts[:, None, :] - o_center
    q_proj, dist = geometry.project_to_axis(q, o_normal)
    hit = is_new & (dist < config.cylinder_radius)
    stats = jnp.concatenate(
        [q_proj, q_proj * q_proj, dist[..., None], (dist * dist)[..., None]],
        axis=-1)
    owner_drop = jnp.where(hit, owner, C).reshape(-1)
    cyl_stats = grid.cyl_stats.at[owner_drop].add(
        stats.reshape(-1, 8), mode="drop")
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
