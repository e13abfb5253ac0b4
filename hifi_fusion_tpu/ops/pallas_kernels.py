"""Pallas TPU kernels for the fusion frontend.

``transform_clip_cellid`` fuses the per-point frontend of the integrate step
— SE(3) transform, camera-z clip, bbox/coord validity and dense cell-id
computation (the work of the reference's decode/clip thread + transform
thread + addPoints preamble, FUSION.cpp:251-255, 289, OccupancyGrid.hpp:
199-202) — into one VMEM-resident pass: points stream HBM -> VMEM once and
every derived quantity (world coords, cell id, validity) is produced in the
same tile, with no intermediate HBM materialization.  All constants (pose
excepted) are compile-time baked from the static FusionConfig.

The kernel runs in interpret mode off-TPU, so CPU tests exercise the same
code path; ``ops.integrate`` selects it via ``FusionConfig.use_pallas``.

Layout: planar (3, N) in, (3, N) + (N,) outs; the lane dimension is the
point axis, blocked at 4096 lanes (48 KB/block in VMEM).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import FusionConfig

_BLOCK = 4096


def _frontend_kernel(pose_ref, pts_ref, mask_ref,
                     world_ref, id_ref, valid_ref, *, config: FusionConfig):
    zmin, zmax = config.z_clip
    b = config.bbox
    ox, oy, oz = config.origin
    rx, ry, rz = config.resolution
    dx, dy, dz = config.dims

    x = pts_ref[0, :]
    y = pts_ref[1, :]
    z = pts_ref[2, :]
    zclip = (z > zmin) & (z < zmax)

    R = pose_ref  # (4,4) f32 in VMEM
    wx = R[0, 0] * x + R[0, 1] * y + R[0, 2] * z + R[0, 3]
    wy = R[1, 0] * x + R[1, 1] * y + R[1, 2] * z + R[1, 3]
    wz = R[2, 0] * x + R[2, 1] * y + R[2, 2] * z + R[2, 3]

    inside = ((wx > b[0]) & (wx < b[1]) & (wy > b[2]) & (wy < b[3])
              & (wz > b[4]) & (wz < b[5]))

    cx = jnp.floor((wx - ox) / rx).astype(jnp.int32)
    cy = jnp.floor((wy - oy) / ry).astype(jnp.int32)
    cz = jnp.floor((wz - oz) / rz).astype(jnp.int32)
    cvalid = ((cx >= 0) & (cx < dx) & (cy >= 0) & (cy < dy)
              & (cz >= 0) & (cz < dz))

    world_ref[0, :] = wx
    world_ref[1, :] = wy
    world_ref[2, :] = wz
    id_ref[0, :] = (cx * dy + cy) * dz + cz
    valid_ref[0, :] = mask_ref[0, :] & zclip & inside & cvalid


@functools.partial(jax.jit, static_argnames=("config", "interpret"))
def transform_clip_cellid(points_cam: jax.Array,   # (3,N) f32
                          mask: jax.Array,         # (N,)  bool
                          pose: jax.Array,         # (4,4) f32
                          *, config: FusionConfig,
                          interpret: bool = False
                          ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (world (3,N) f32, cell_id (N,) i32, valid (N,) bool)."""
    n = points_cam.shape[1]
    n_pad = -(-n // _BLOCK) * _BLOCK
    if n_pad != n:
        points_cam = jnp.pad(points_cam, ((0, 0), (0, n_pad - n)))
        mask = jnp.pad(mask, (0, n_pad - n))
    mask2 = mask[None, :]

    grid = (n_pad // _BLOCK,)
    kernel = functools.partial(_frontend_kernel, config=config)
    world, ids, valid = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((4, 4), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),          # pose, replicated
            pl.BlockSpec((3, _BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((3, _BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((3, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.bool_),
        ],
        interpret=interpret,
    )(pose, points_cam, mask2)
    return world[:, :n], ids[0, :n], valid[0, :n]


def frontend_available() -> bool:
    """True when running on a real TPU backend (compiled Pallas path)."""
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False
