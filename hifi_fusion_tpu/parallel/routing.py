"""Owner-slab point routing: the all_to_all ingest path for sharded fusion.

The replicate ingest path (parallel/sharding.py) sends every frame to every
device and lets each discard non-window points AFTER running the full
sort/compaction pipeline — 8 chips buy 8x capacity and ~0x throughput
(round-1 verdict).  This module implements the survey §5.7 spec instead:
points are routed to their owner slab over ICI, so each device's integrate
runs on ~N/d + halo-band lanes and every downstream lane space (sorts,
scans, pair streams) shrinks with the mesh.

Per device, inside ``shard_map`` (each holds an N/d lane block of the
frame):

1. **frontend** — transform the block to world space, apply the camera
   z-clip and GLOBAL bbox/coord validity (identical arithmetic to the
   single-chip frontend, ops/integrate.py:_frontend, so routed and
   replicated ingests agree bit-for-bit on which points survive);
2. **target** — the owner slab of a point is determined by its x cell
   coordinate.  Ownership is computed with d-1 boundary compares, not an
   integer divide (non-pow2 int div costs ~23 ns/lane on v5e, PERF.md §3).
   A point within ``halo`` cells of a slab boundary is ALSO sent to that
   neighbor (its halo band) — the routed equivalent of the replicate
   path's redundant halo compute.  ``slab_w >= 2*halo`` is asserted, so a
   point has at most one secondary target;
3. **bucket** — the 2x(N/d) (point, target) lanes are payload-sorted by
   target and ranked within each target run (segment fill of the run-start
   lane index); lanes ranked past the per-destination budget ``send_lanes``
   are dropped and counted.  One unique-index scatter packs the survivors
   into a dense (n_dev, send_lanes, 7) send buffer [wx wy wz r g b
   present];
4. **exchange** — ONE ``lax.all_to_all`` over the mesh axis swaps bucket j
   of device i to device j: each device receives (n_dev, send_lanes)
   world-space points destined for its window, flattened to the
   ``n_dev * send_lanes`` receive lane space.

The receive budget per device is ``n_dev * send_lanes`` ~= beta * N / d
(``send_lanes = beta * N / d^2``): per-device work genuinely scales ~1/d,
with ``beta`` absorbing spatial imbalance.  Frames whose slab loading
exceeds the budget drop points AND count them (overflow_active), exactly
like every other static budget in the framework; sessions needing
guaranteed-lossless ingest use the replicate path (``route=False``).

Reference bar: the reference scales by allocating a 1 GB dense grid and
warning the user (OccupancyGrid.hpp:621-627, README.md:12).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import FusionConfig
from ..ops import geometry
from ..ops.scatter import segment_fill, segment_starts

_BIG = jnp.iinfo(jnp.int32).max


def owner_of_x(x: jax.Array, n_dev: int, slab_w: int) -> jax.Array:
    """(...,) global x cell coord -> owning device id, via d-1 boundary
    compares (exact; no integer division)."""
    i32 = jnp.int32
    owner = jnp.zeros(x.shape, i32)
    for j in range(1, n_dev):
        owner = owner + (x >= j * slab_w).astype(i32)
    return owner


def route_frame(points_cam: jax.Array,   # (3, Nb) camera-frame block
                rgb: jax.Array,          # (3, Nb)
                mask: jax.Array,         # (Nb,) lane validity
                pose: jax.Array,         # (4, 4) replicated
                *, config: FusionConfig,  # GLOBAL-geometry config
                axis_name: str, n_dev: int, slab_w: int, halo: int,
                send_lanes: int):
    """Route this device's frame block to owner slabs (see module doc).

    Returns ``(world_r, rgb_r, present, n_dropped)``: (3, R)/(3, R)/(R,)
    routed world-space points with R = n_dev * send_lanes, plus the TOTAL
    number of in-budget-exceeding dropped lanes across the mesh (psum'd —
    identical on every device; halo copies count individually).
    """
    assert slab_w >= 2 * halo, (
        f"routed sharding needs slab_w ({slab_w}) >= 2*halo ({2 * halo}); "
        f"use fewer devices or the replicate path")
    f32 = jnp.float32
    i32 = jnp.int32
    Nb = mask.shape[0]
    Bs = send_lanes

    # ---- frontend: identical validity arithmetic to the single-chip path
    zmin, zmax = config.z_clip
    zclip = (points_cam[2] > zmin) & (points_cam[2] < zmax)
    world = geometry.transform_points(points_cam, pose)
    coords = geometry.cell_coords(world, config)
    valid = (mask & zclip
             & geometry.valid_points(world, config)
             & geometry.valid_coords(coords, config))
    x = coords[0]

    # ---- primary + (at most one) halo secondary target ------------------
    owner = owner_of_x(x, n_dev, slab_w)
    local_off = x - owner * slab_w                       # [0, slab_w)
    sec = jnp.where(local_off < halo, owner - 1,
                    jnp.where(local_off >= slab_w - halo, owner + 1, -1))
    sec_ok = valid & (sec >= 0) & (sec < n_dev)

    tgt = jnp.concatenate([jnp.where(valid, owner, _BIG),
                           jnp.where(sec_ok, sec, _BIG)])
    two = lambda a: jnp.concatenate([a, a])
    # ---- payload sort by target, rank within each target run ------------
    tgt_s, wx, wy, wz, r0, r1, r2 = jax.lax.sort(
        (tgt, two(world[0]), two(world[1]), two(world[2]),
         two(rgb[0]), two(rgb[1]), two(rgb[2])),
        num_keys=1, is_stable=True)
    lvalid = tgt_s != _BIG
    starts = segment_starts(tgt_s, lvalid)
    lane = jnp.arange(2 * Nb, dtype=i32)
    rank = lane - segment_fill(jnp.where(starts, lane, 0), starts)
    keep = lvalid & (rank < Bs)
    n_dropped = jax.lax.psum(
        jnp.sum((lvalid & ~keep).astype(i32)), axis_name)

    # ---- pack into the dense (n_dev * Bs) send buffer (unique indices) --
    dest = jnp.where(keep, tgt_s * Bs + rank, n_dev * Bs + lane)
    send = jnp.zeros((7, n_dev * Bs + 2 * Nb), f32)
    cols = jnp.stack([wx, wy, wz, r0, r1, r2,
                      keep.astype(f32)], axis=0)         # (7, 2Nb)
    send = send.at[:, dest].set(jnp.where(keep[None, :], cols, 0.0),
                                unique_indices=True)[:, :n_dev * Bs]

    # ---- ONE all_to_all swaps bucket j of device i to device j ----------
    recv = jax.lax.all_to_all(send.reshape(7, n_dev, Bs), axis_name,
                              split_axis=1, concat_axis=1)
    recv = recv.reshape(7, n_dev * Bs)
    world_r = recv[0:3]
    rgb_r = recv[3:6]
    present = recv[6] > 0.5
    return world_r, rgb_r, present, n_dropped
