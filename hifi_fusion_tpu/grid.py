"""Functional grid state: the TPU-native replacement for ``OccupancyGrid``.

The reference (OccupancyGrid.hpp:51-136) stores a dense
``vector<vector<vector<Voxel>>>`` of {bool, void*} cells whose heap-allocated
``VoxelInfo`` holds a running Welford mean/variance, an unbounded point buffer
and a dependants vector.  That layout is pointer-chasing, mutex-guarded and
order-dependent — all wrong for a TPU.

Here the grid is a *pytree of flat SoA arrays in HBM*, addressed by an
open-addressing spatial hash (survey §7 "core representation decisions").
All vector fields use the planar component-major layout (see
ops/geometry.py): minor dim = capacity, so nothing pads against the TPU's
(8,128) tile:

* ``key``       (C,)   int32  dense cell id ``(x*ydim + y)*zdim + z``; -1 empty.
                 A slot with key != -1 corresponds to "data != nullptr" in the
                 reference; ``occupied`` is tracked separately so that *ghost*
                 voxels (line cells pre-created by normal refinement with
                 ``occupied == false``, OccupancyGrid.hpp:443-449) fall out of
                 the representation naturally.
* Welford stats -> **centered sum form**: per voxel we accumulate
  ``count, Σq, Σq², Σd, Σd²`` where ``q = projected_point - cell_center`` and
  ``d = distance to the normal axis``.  Sums commute, so parallel scatter-adds
  give order-independent results where the reference's sequential running
  update (OccupancyGrid.hpp:264-273) is order-dependent.  Centering keeps the
  f32 cancellation error tiny (|q| <= bball_radius).
* The pre-normal point buffer (OccupancyGrid.hpp:70,211) becomes one global
  append ring ``buf_pts/buf_slot`` with a scalar cursor.
* Dependant links (OccupancyGrid.hpp:417,447) become a fixed-width
  ``(C, D)`` slot-index table + per-slot count.

Slots are append-only between ``clear()`` calls, so slot indices stored in
``dep``/``buf_slot`` stay stable.  ``clear()`` rebuilds a fresh state, fixing
the reference's ghost-voxel leak and stale hash sets by construction
(OccupancyGrid.hpp:167-183, survey §2 C17).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .config import FusionConfig


class GridState(NamedTuple):
    """SoA voxel hash table + global point buffer (one device's shard)."""

    # hash table -------------------------------------------------------
    key: jax.Array          # (C,)   i32  dense cell id, -1 = empty slot
    occupied: jax.Array     # (C,)   bool voxel.occupied
    normal_found: jax.Array  # (C,)  bool VoxelInfo::normal_found
    normal: jax.Array       # (3,C)  f32  unit surface normal (planar)
    viewpoint: jax.Array    # (3,C)  f32  camera position at first occupancy
    # cylinder statistics (centered sum form) -------------------------
    count: jax.Array        # (C,)   i32  points that passed the 1mm gate
    cyl_stats: jax.Array    # (8,C)  f32  [Σq(3) | Σq²(3) | Σd | Σd²] —
                            #        8 rows exactly fill the f32 sublane tile
    # per-voxel color / hit telemetry ---------------------------------
    rgb_sum: jax.Array      # (3,C)  f32  Σ rgb of points landing in voxel
    n_pts: jax.Array        # (C,)   i32  raw points landing in voxel
    # dependant links -------------------------------------------------
    dep: jax.Array          # (D,C)  i32  owner slot indices, -1 = unset
    dep_count: jax.Array    # (C,)   i32
    # global pre-normal point buffer ----------------------------------
    buf_pts: jax.Array      # (3,B)  f32
    buf_slot: jax.Array     # (B,)   i32  destination slot, -1 = empty
    buf_count: jax.Array    # ()     i32  append cursor
    # overflow / telemetry counters -----------------------------------
    overflow_probe: jax.Array  # ()  i32  inserts dropped (probe bound hit)
    overflow_buf: jax.Array    # ()  i32  buffered points dropped
    overflow_dep: jax.Array    # ()  i32  dependant links dropped
    overflow_refine: jax.Array  # () i32  refine candidates deferred (U_max hit)
    frames: jax.Array          # ()  i32  frames integrated since clear


def make_grid(config: FusionConfig) -> GridState:
    C = config.capacity
    B = config.buffer_capacity
    D = config.max_dependants
    f32 = jnp.float32
    i32 = jnp.int32
    return GridState(
        key=jnp.full((C,), -1, i32),
        occupied=jnp.zeros((C,), jnp.bool_),
        normal_found=jnp.zeros((C,), jnp.bool_),
        normal=jnp.zeros((3, C), f32),
        viewpoint=jnp.zeros((3, C), f32),
        count=jnp.zeros((C,), i32),
        cyl_stats=jnp.zeros((8, C), f32),
        rgb_sum=jnp.zeros((3, C), f32),
        n_pts=jnp.zeros((C,), i32),
        dep=jnp.full((D, C), -1, i32),
        dep_count=jnp.zeros((C,), i32),
        buf_pts=jnp.zeros((3, B), f32),
        buf_slot=jnp.full((B,), -1, i32),
        buf_count=jnp.zeros((), i32),
        overflow_probe=jnp.zeros((), i32),
        overflow_buf=jnp.zeros((), i32),
        overflow_dep=jnp.zeros((), i32),
        overflow_refine=jnp.zeros((), i32),
        frames=jnp.zeros((), i32),
    )


def grid_metrics(grid: GridState) -> dict:
    """Host-side telemetry (survey §5.5): occupancy, load factor, overflows."""
    occ = int(jnp.sum(grid.occupied))
    used = int(jnp.sum(grid.key != -1))
    C = grid.key.shape[0]
    return {
        "occupied_voxels": occ,
        "slots_used": used,
        "hash_load_factor": used / C,
        "normals_found": int(jnp.sum(grid.normal_found)),
        "buffered_points": int(grid.buf_count),
        "frames": int(grid.frames),
        "overflow_probe": int(grid.overflow_probe),
        "overflow_buffer": int(grid.overflow_buf),
        "overflow_dependants": int(grid.overflow_dep),
        "overflow_refine": int(grid.overflow_refine),
    }
