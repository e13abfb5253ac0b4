"""Frame integration: fused transform + clip + hash-scatter + cylinder stream.

One jitted device function replaces the reference's decode thread, transform
thread and ``OccupancyGrid::addPoints`` hot loop (survey C6+C7+C11;
FUSION.cpp:218-299, OccupancyGrid.hpp:185-280).  Per frame it:

1. transforms camera-frame points into the fusion frame (SE(3)),
2. applies the camera-z clip and bbox validity as *masks* (fixed shapes),
3. batch-inserts points into the voxel hash (occupancy + first-viewpoint),
4. appends points of not-yet-normal voxels to the global pre-normal buffer
   (reference: ``data->buffer.push_back``, OccupancyGrid.hpp:211),
5. streams every valid point through its voxel's *dependants*: project onto
   each owner's normal axis, 1 mm cylinder gate, centered-sum Welford update
   (reference: OccupancyGrid.hpp:244-277).

All accumulators are sums, so the scatter-adds commute and the result is
independent of point order — the property that makes the reference's
"parallelize addPoints" TODO (its commented-out OMP criticals,
OccupancyGrid.hpp:207-244) actually achievable.

Layout: points are planar (3, N); per-point-per-dependant intermediates are
(D, N) / (3, D, N) so the minor axis is always the long one (see
ops/geometry.py on TPU tiling).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..config import FusionConfig
from ..grid import GridState
from . import geometry, hashing


def integrate_frame_impl(grid: GridState,
                         points_cam: jax.Array,  # (3,N) f32 camera-frame pts
                         rgb: jax.Array,         # (3,N) f32 colors [0,255]
                         mask: jax.Array,        # (N,)  bool lane validity
                         pose: jax.Array,        # (4,4) f32 fusion_T_camera
                         *, config: FusionConfig) -> GridState:
    C = config.capacity
    D = config.max_dependants
    B = config.buffer_capacity

    # --- 1/2: transform + clip masks (FUSION.cpp:251-255, 289) ------------
    zmin, zmax = config.z_clip
    zclip = (points_cam[2] > zmin) & (points_cam[2] < zmax)
    world = geometry.transform_points(points_cam, pose)       # (3,N)
    viewpoint = pose[:3, 3]

    coords = geometry.cell_coords(world, config)              # (3,N)
    valid = (mask & zclip
             & geometry.valid_points(world, config)
             & geometry.valid_coords(coords, config))
    ids = geometry.cell_id(coords, config)                    # (N,)

    # --- 3: find-or-insert into the voxel hash ---------------------------
    key_table, slot, n_failed = hashing.lookup_or_insert(
        grid.key, ids, valid, config.max_probes)
    placed = valid & (slot >= 0)
    slot_safe = jnp.clip(slot, 0, C - 1)
    drop = jnp.where(placed, slot, C)          # scatter index, C -> dropped

    occ0 = grid.occupied[slot_safe] & placed   # pre-frame occupancy
    nf0 = grid.normal_found[slot_safe] & placed

    occupied = grid.occupied.at[drop].set(True, mode="drop")
    # First-occupancy viewpoint (ghost voxels get re-stamped like the
    # reference's else-branch overwrite, OccupancyGrid.hpp:229,238).
    vp_idx = jnp.where(placed & ~occ0, slot, C)
    vp_rows = jnp.broadcast_to(viewpoint[:, None], world.shape)  # (3,N)
    viewpoint_arr = grid.viewpoint.at[:, vp_idx].set(vp_rows, mode="drop")

    # per-voxel color / hit telemetry (extension; the reference drops color)
    if config.store_color:
        rgb_sum = grid.rgb_sum.at[:, drop].add(rgb, mode="drop")
    else:
        rgb_sum = grid.rgb_sum
    n_pts = grid.n_pts.at[drop].add(1, mode="drop")

    # --- 4: buffer append for pre-normal voxels ---------------------------
    want_buf = placed & ~nf0
    local_off = jnp.cumsum(want_buf.astype(jnp.int32)) - 1
    buf_idx = grid.buf_count + local_off
    buf_ok = want_buf & (buf_idx < B)
    bidx = jnp.where(buf_ok, buf_idx, B)
    buf_pts = grid.buf_pts.at[:, bidx].set(world, mode="drop")
    buf_slot = grid.buf_slot.at[bidx].set(slot, mode="drop")
    n_want = jnp.sum(want_buf.astype(jnp.int32))
    buf_count = jnp.minimum(grid.buf_count + n_want, B)
    overflow_buf = grid.overflow_buf + (grid.buf_count + n_want - buf_count)

    # --- 5: stream through dependants (OccupancyGrid.hpp:244-277) ---------
    dep_rows = grid.dep[:, slot_safe]                     # (D,N)
    dep_cnt = grid.dep_count[slot_safe]                   # (N,)
    j_idx = jnp.arange(D, dtype=jnp.int32)[:, None]
    owner_active = (placed[None, :] & (j_idx < dep_cnt[None, :])
                    & (dep_rows >= 0))                    # (D,N)
    owner_safe = jnp.clip(dep_rows, 0, C - 1)
    o_coords = geometry.id_to_coords(key_table[owner_safe], config)  # (3,D,N)
    o_center = geometry.cell_center(o_coords, config)     # (3,D,N)
    o_normal = grid.normal[:, owner_safe]                 # (3,D,N)
    q = world[:, None, :] - o_center
    q_proj, dist = geometry.project_to_axis(q, o_normal)  # (3,D,N), (D,N)
    hit = owner_active & (dist < config.cylinder_radius)

    stats = jnp.concatenate(
        [q_proj, q_proj * q_proj, dist[None], (dist * dist)[None]],
        axis=0)                                           # (8,D,N)
    owner_drop = jnp.where(hit, dep_rows, C).reshape(-1)  # (D*N,)
    cyl_stats = grid.cyl_stats.at[:, owner_drop].add(
        stats.reshape(8, -1), mode="drop")
    count = grid.count.at[owner_drop].add(1, mode="drop")

    return grid._replace(
        key=key_table,
        occupied=occupied,
        viewpoint=viewpoint_arr,
        count=count,
        cyl_stats=cyl_stats,
        rgb_sum=rgb_sum,
        n_pts=n_pts,
        buf_pts=buf_pts,
        buf_slot=buf_slot,
        buf_count=buf_count,
        overflow_probe=grid.overflow_probe + n_failed,
        overflow_buf=overflow_buf,
        frames=grid.frames + 1,
    )


integrate_frame = partial(jax.jit, static_argnames=("config",),
                          donate_argnames=("grid",))(integrate_frame_impl)
