"""Spatial-hash neighborhood queries (BASELINE.json config 4).

General-purpose queries over the fused grid, served by batched hash lookups
— the sparse-grid equivalent of the neighborhood scans the reference does
against its dense 63M-cell array (OccupancyGrid.hpp:334-349).  These scale
to 10^8-cell *logical* grids because cost follows occupied cells, not bbox
volume.

* ``occupied_neighbor_counts`` — per queried voxel, how many occupied cells
  lie in the (2r+1)^3 window (the refine gate's primitive, exposed).
* ``radius_outlier_mask``      — classic radius-outlier-removal over the
  occupied voxel set: keep voxels with >= min_neighbors occupied neighbors
  within a cell radius.  The batch analog of PCL's RadiusOutlierRemoval the
  reference links but never runs (FUSION.cpp:33).
* ``query_points``             — map arbitrary world points to their voxel's
  (occupied, normal_found, count) — point-in-surface lookups for downstream
  consumers.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import FusionConfig
from ..grid import GridState, count_at, occupied_at, occupied_slots
from . import geometry, hashing


def _window_offsets(r: int) -> np.ndarray:
    a = np.arange(-r, r + 1)
    return np.stack(np.meshgrid(a, a, a, indexing="ij"),
                    axis=-1).reshape(-1, 3).T.copy()     # (3,M)


@partial(jax.jit, static_argnames=("config", "radius_cells"))
def occupied_neighbor_counts(grid: GridState, query_slots: jax.Array,
                             *, config: FusionConfig,
                             radius_cells: int = 2) -> jax.Array:
    """(Q,) i32 occupied-cell count in the window around each query slot
    (slot -1 -> count 0). Includes the voxel itself when occupied."""
    C = config.capacity
    ok = query_slots >= 0
    qs = jnp.clip(query_slots, 0, C - 1)
    coords = geometry.id_to_coords(grid.key[qs], config)      # (3,Q)
    offs = jnp.asarray(_window_offsets(radius_cells), jnp.int32)
    M = offs.shape[1]
    nc = coords[:, None, :] + offs[:, :, None]                # (3,M,Q)
    valid = geometry.valid_coords(nc, config) & ok[None, :]
    ids = geometry.cell_id(nc, config)
    slot = hashing.lookup(grid.key, ids.reshape(-1), valid.reshape(-1),
                          config.max_probes, C).reshape(M, -1)
    occ = (slot >= 0) & occupied_at(grid, jnp.clip(slot, 0, C - 1)) & valid
    return jnp.sum(occ.astype(jnp.int32), axis=0)


@partial(jax.jit, static_argnames=("config", "radius_cells",
                                   "min_neighbors"))
def radius_outlier_mask(grid: GridState, *, config: FusionConfig,
                        radius_cells: int = 2,
                        min_neighbors: int = 5) -> jax.Array:
    """(C,) bool: occupied voxels with enough occupied neighbors (self
    excluded from the threshold comparison, like PCL's ROR semantics)."""
    C = config.capacity
    occ = occupied_slots(grid, C)
    slots = jnp.where(occ, jnp.arange(C, dtype=jnp.int32), -1)
    counts = occupied_neighbor_counts(grid, slots, config=config,
                                      radius_cells=radius_cells)
    return occ & ((counts - 1) >= min_neighbors)


class PointQuery(NamedTuple):
    slot: jax.Array          # (Q,) i32 voxel slot or -1
    occupied: jax.Array      # (Q,) bool
    normal_found: jax.Array  # (Q,) bool
    count: jax.Array         # (Q,) i32 cylinder hits of that voxel


@partial(jax.jit, static_argnames=("config",))
def query_points(grid: GridState, points: jax.Array,
                 *, config: FusionConfig) -> PointQuery:
    """Map (3,Q) world points to their voxel's state."""
    C = config.capacity
    coords = geometry.cell_coords(points, config)
    valid = (geometry.valid_points(points, config)
             & geometry.valid_coords(coords, config))
    ids = geometry.cell_id(coords, config)
    slot = hashing.lookup(grid.key, ids, valid, config.max_probes, C)
    safe = jnp.clip(slot, 0, C - 1)
    found = slot >= 0
    return PointQuery(
        slot=slot,
        occupied=found & occupied_at(grid, safe),
        normal_found=found & grid.normal_found[safe],
        count=jnp.where(found, count_at(grid, safe), 0),
    )
