"""Voxel-grid geometry: cell coords, centers, validity, axis projection.

Faithful restatements of the reference's coordinate semantics:

* ``getVoxelCoords``: ``floor((p - min)/res)``        (OccupancyGrid.hpp:630-637)
* ``getVoxelCenter``: ``min + res*i + res/2``          (OccupancyGrid.hpp:131-135)
* ``validPoints``:    strictly inside the bbox on *both* ends — boundary
  points are dropped (OccupancyGrid.hpp:639-645).
* ``validCoord``:     ``0 <= c < dim`` per axis        (OccupancyGrid.hpp:647-650)
* ``projectPointToVector`` (OccupancyGrid.hpp:40-49) projects onto the
  *unclamped* line through the voxel center along the normal; algebraically
  ``proj = c + ((p-c)·n) n`` — we use the simplified centered form, which is
  exact for unit normals and numerically better (all ops on |q| <= 15 mm).

LAYOUT: all vector quantities are **planar / component-major** — points are
``(3, N)``, coords ``(3, ...)``, with the *long* axis minor.  TPU memory is
tiled (8 sublanes x 128 lanes); an ``(N, 3)`` array pads its minor dim 3 up
to 128 (a 42x footprint/bandwidth blowup), while ``(3, N)`` pads only
3 sublanes up to 8.  This convention is what makes the grid state and frame
streams fit HBM at production sizes.

Deviation from the reference (deliberate fix, survey §2 bugs): the reference
never checks ``validCoord`` on insert, so points in the sliver between
``dim*res`` and the bbox max land in half-broken edge cells (allocated dim+1,
excluded from their own neighborhoods).  We require ``validCoord`` at insert;
the sliver (width < one voxel pitch) is dropped instead.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import FusionConfig


def _bcast(v, ndim: int) -> jax.Array:
    """(3,) constant -> (3, 1, 1, ...) broadcastable over planar arrays."""
    return jnp.reshape(v, (3,) + (1,) * (ndim - 1))


def cell_coords(points: jax.Array, config: FusionConfig) -> jax.Array:
    """(3, ...) world points -> (3, ...) int32 cell coords (floor)."""
    origin = _bcast(jnp.asarray(config.origin, jnp.float32), points.ndim)
    res = _bcast(jnp.asarray(config.resolution, jnp.float32), points.ndim)
    return jnp.floor((points - origin) / res).astype(jnp.int32)


def cell_center(coords: jax.Array, config: FusionConfig) -> jax.Array:
    """(3, ...) int cell coords -> (3, ...) f32 cell centers."""
    origin = _bcast(jnp.asarray(config.origin, jnp.float32), coords.ndim)
    res = _bcast(jnp.asarray(config.resolution, jnp.float32), coords.ndim)
    return origin + res * (coords.astype(jnp.float32) + 0.5)


def valid_points(points: jax.Array, config: FusionConfig) -> jax.Array:
    """(3, ...) -> (...) bool: strictly inside the bbox (exclusive ends)."""
    b = config.bbox
    lo = _bcast(jnp.asarray([b[0], b[2], b[4]], jnp.float32), points.ndim)
    hi = _bcast(jnp.asarray([b[1], b[3], b[5]], jnp.float32), points.ndim)
    return jnp.all((points > lo) & (points < hi), axis=0)


def valid_coords(coords: jax.Array, config: FusionConfig) -> jax.Array:
    """(3, ...) int coords -> (...) bool: inside [0, dim) per axis."""
    dims = _bcast(jnp.asarray(config.dims, jnp.int32), coords.ndim)
    return jnp.all((coords >= 0) & (coords < dims), axis=0)


def cell_id(coords: jax.Array, config: FusionConfig) -> jax.Array:
    """(3, ...) int coords -> (...) int32 dense id (x-major, matching the
    reference's x/y/z extraction loop order, OccupancyGrid.hpp:463-465)."""
    _, dy, dz = config.dims
    c = coords.astype(jnp.int32)
    return (c[0] * dy + c[1]) * dz + c[2]


def id_to_coords(ids: jax.Array, config: FusionConfig) -> jax.Array:
    """(...) int32 dense id -> (3, ...) int32 coords."""
    _, dy, dz = config.dims
    z = ids % dz
    xy = ids // dz
    y = xy % dy
    x = xy // dy
    return jnp.stack([x, y, z], axis=0)


def center_of_ids(ids: jax.Array, config: FusionConfig,
                  offset=None) -> jax.Array:
    """Dense cell ids -> (3, ...) f32 GLOBAL cell centers.

    ``offset`` ((3,) i32 or None): for sharded grids whose ids live in a
    shard-LOCAL coordinate space (config.shard_x_cells), the per-shard
    local->global coordinate offset.  World geometry always stays global so
    f32 arithmetic is bit-identical across shards.
    """
    c = id_to_coords(ids, config)
    if offset is not None:
        c = c + jnp.reshape(offset, (3,) + (1,) * (c.ndim - 1))
    return cell_center(c, config)


def project_to_axis(q: jax.Array, n: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Centered axis projection, planar layout.

    ``q = p - axis_center`` (3, ...); ``n`` unit normal (3, ...).
    Returns ``(q_proj, dist)`` with ``q_proj = (q·n) n`` (projection relative
    to the axis center) and ``dist = |q - q_proj|`` (distance to the axis).
    Equivalent to the reference's projectPointToVector + norm
    (OccupancyGrid.hpp:40-49, 260-262).
    """
    t = jnp.sum(q * n, axis=0, keepdims=True)
    q_proj = t * n
    r = q - q_proj
    dist = jnp.sqrt(jnp.sum(r * r, axis=0))
    return q_proj, dist


def transform_points(points: jax.Array, pose: jax.Array) -> jax.Array:
    """SE(3) transform of (3, N) points by a (4, 4) pose.

    Written as explicit multiply-adds (VPU) rather than a matmul so the f32
    arithmetic is exact and bit-reproducible against the NumPy oracle (no MXU
    passes, no layout-dependent reduction order). Equivalent to
    ``pcl::transformPointCloud`` (FUSION.cpp:289).
    """
    R = pose[:3, :3]
    t = pose[:3, 3]
    x, y, z = points[0], points[1], points[2]
    return jnp.stack([
        R[0, 0] * x + R[0, 1] * y + R[0, 2] * z + t[0],
        R[1, 0] * x + R[1, 1] * y + R[1, 2] * z + t[1],
        R[2, 0] * x + R[2, 1] * y + R[2, 2] * z + t[2],
    ], axis=0)
