"""Owner-slab point routing: the all_to_all ingest path for sharded fusion.

The replicate ingest path (parallel/sharding.py) sends every frame to every
device and lets each discard non-window points AFTER running the full
sort/compaction pipeline — 8 chips buy 8x capacity and ~0x throughput
(round-1 verdict).  This module implements the survey §5.7 spec instead:
points are routed to their owner slab over ICI, so each device's integrate
runs on ~N/d + halo-band lanes and every downstream lane space (sorts,
scans, pair streams) shrinks with the mesh.

Per device, inside ``shard_map`` (each holds an N/d lane block of the
frame), the path splits into three stages so the sharded pipeline can pick
the smallest covering send budget ON DEVICE (see ``route_sort`` /
``pack_send`` / the tier switch in parallel/sharding.py):

1. **route_sort** — frontend (transform to world space, camera z-clip,
   GLOBAL bbox/coord validity — identical arithmetic to the single-chip
   frontend, ops/integrate.py:_frontend, so routed and replicated ingests
   agree bit-for-bit on which points survive), owner-slab targeting (d-1
   boundary compares, not an integer divide — non-pow2 int div costs
   ~23 ns/lane on v5e, PERF.md §3; O(d) compares are fine at d <= 16,
   revisit with a searchsorted over boundaries before trying d = 64), one
   halo secondary target for points within ``halo`` cells of a slab
   boundary (``slab_w >= 2*halo`` is asserted so a point has at most one),
   then ONE payload sort by target with a rank within each target run.
   Also returns ``max_bucket`` — the largest (source, destination) bucket
   load on this device — which, pmax'd over the mesh, is exactly the
   smallest send budget that loses nothing this frame.
2. **pack_send** — lanes ranked past the per-destination budget
   ``send_lanes`` are dropped and counted; one unique-index scatter packs
   survivors into a dense (n_dev, send_lanes, 7) send buffer
   [wx wy wz r g b present].
3. **exchange** — ONE ``lax.all_to_all`` over the mesh axis swaps bucket j
   of device i to device j: each device receives (n_dev, send_lanes)
   world-space points destined for its window, flattened to the
   ``n_dev * send_lanes`` receive lane space.  ``exchange_batch`` swaps a
   whole K-frame batch in ONE collective ((K, 7, n_dev, Bs) send stacks).

The receive budget per device is ``n_dev * send_lanes`` ~= beta * N / d
(``send_lanes = beta * N / d^2``): per-device lane budgets scale ~1/d in
the balanced limit, with ``beta`` absorbing spatial imbalance.  MEASURED
(tools/routing_scaling.py, 8-virtual-CPU mesh, 2026-08-21, PERF.md §14):
on the bench sweep's camera frames the live shrink (frame points /
per-device max) is **1.9x at d=4 and 2.5x at d=8**, not ~d — a single
frame's x-extent concentrates into few slabs, so the max-loaded device
bounds the tier.  The ~1/d figure is the multi-camera / wide-scan limit;
size expectations from the measured table.  The sharded pipeline runs a
``lax.switch`` over an ascending beta-tier ladder keyed on the pmax'd
``max_bucket`` (parallel/sharding.py): spatially spread frames ride the
small tier, concentrated ones escalate, and with the default top tier
``beta = n_devices`` a frame whose every point targets ONE slab still
fits — lossless by construction.  Only loads beyond the top tier drop
(counted in overflow_active, never silent).

Reference bar: the reference scales by allocating a 1 GB dense grid and
warning the user (OccupancyGrid.hpp:621-627, README.md:12).
"""

from __future__ import annotations

from typing import NamedTuple

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


class RoutedSort(NamedTuple):
    """Per-source-device routing state after the target sort (lane space
    L = 2 * block size: primary + halo-secondary lanes)."""
    tgt: jax.Array        # (L,) i32 sorted target device, _BIG = invalid
    payload: jax.Array    # (6,L) f32 [wx wy wz r g b], target-sorted
    rank: jax.Array       # (L,) i32 rank within the target run
    lvalid: jax.Array     # (L,) bool
    max_bucket: jax.Array  # () i32 largest per-destination load (local)


def route_sort(points_cam: jax.Array,   # (3, Nb) camera-frame block
               rgb: jax.Array,          # (3, Nb)
               mask: jax.Array,         # (Nb,) lane validity
               pose: jax.Array,         # (4, 4) replicated
               *, config: FusionConfig,  # GLOBAL-geometry config
               n_dev: int, slab_w: int, halo: int) -> RoutedSort:
    """Stage 1 (see module doc): frontend + targets + ONE payload sort.
    Pure per-device math — no collectives — so it vmaps over a K-frame
    batch."""
    assert slab_w >= 2 * halo, (
        f"routed sharding needs slab_w ({slab_w}) >= 2*halo ({2 * halo}); "
        f"use fewer devices or the replicate path")
    i32 = jnp.int32
    Nb = mask.shape[0]

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
    max_bucket = jnp.max(jnp.where(lvalid, rank, -1)) + 1
    return RoutedSort(tgt=tgt_s,
                      payload=jnp.stack([wx, wy, wz, r0, r1, r2], axis=0),
                      rank=rank, lvalid=lvalid, max_bucket=max_bucket)


def pack_send(rs: RoutedSort, *, n_dev: int, send_lanes: int):
    """Stage 2: pack in-budget lanes into the dense (7, n_dev * Bs) send
    buffer (unique indices).  Returns (send, n_dropped_local).  Pure
    per-device math — vmaps over a K-frame batch."""
    f32 = jnp.float32
    i32 = jnp.int32
    Bs = send_lanes
    L = rs.tgt.shape[0]
    keep = rs.lvalid & (rs.rank < Bs)
    n_dropped = jnp.sum((rs.lvalid & ~keep).astype(i32))
    lane = jnp.arange(L, dtype=i32)
    dest = jnp.where(keep, rs.tgt * Bs + rs.rank, n_dev * Bs + lane)
    send = jnp.zeros((7, n_dev * Bs + L), f32)
    cols = jnp.concatenate([rs.payload, keep.astype(f32)[None, :]],
                           axis=0)                        # (7, L)
    send = send.at[:, dest].set(jnp.where(keep[None, :], cols, 0.0),
                                unique_indices=True)[:, :n_dev * Bs]
    return send, n_dropped


def exchange(send: jax.Array, *, axis_name: str, n_dev: int,
             send_lanes: int):
    """Stage 3: ONE all_to_all swaps bucket j of device i to device j.
    ``send`` is (7, n_dev*Bs) -> routed (world (3,R), rgb (3,R),
    present (R,)) with R = n_dev * Bs."""
    Bs = send_lanes
    recv = jax.lax.all_to_all(send.reshape(7, n_dev, Bs), axis_name,
                              split_axis=1, concat_axis=1)
    recv = recv.reshape(7, n_dev * Bs)
    return recv[0:3], recv[3:6], recv[6] > 0.5


def exchange_batch(send_k: jax.Array, *, axis_name: str, n_dev: int,
                   send_lanes: int):
    """Batched stage 3: (K, 7, n_dev*Bs) send stacks -> ONE all_to_all for
    the whole K-frame batch -> (world (K,3,R), rgb (K,3,R),
    present (K,R))."""
    K = send_k.shape[0]
    Bs = send_lanes
    recv = jax.lax.all_to_all(send_k.reshape(K * 7, n_dev, Bs), axis_name,
                              split_axis=1, concat_axis=1)
    recv = recv.reshape(K, 7, n_dev * Bs)
    return recv[:, 0:3], recv[:, 3:6], recv[:, 6] > 0.5


def route_frame(points_cam: jax.Array,   # (3, Nb) camera-frame block
                rgb: jax.Array,          # (3, Nb)
                mask: jax.Array,         # (Nb,) lane validity
                pose: jax.Array,         # (4, 4) replicated
                *, config: FusionConfig,  # GLOBAL-geometry config
                axis_name: str, n_dev: int, slab_w: int, halo: int,
                send_lanes: int):
    """Single-frame, single-budget routing (sort + pack + exchange).

    Returns ``(world_r, rgb_r, present, n_dropped)``: (3, R)/(3, R)/(R,)
    routed world-space points with R = n_dev * send_lanes, plus the TOTAL
    number of budget-exceeding dropped lanes across the mesh (psum'd —
    identical on every device; halo copies count individually).
    """
    rs = route_sort(points_cam, rgb, mask, pose, config=config,
                    n_dev=n_dev, slab_w=slab_w, halo=halo)
    send, n_drop = pack_send(rs, n_dev=n_dev, send_lanes=send_lanes)
    n_dropped = jax.lax.psum(n_drop, axis_name)
    world_r, rgb_r, present = exchange(send, axis_name=axis_name,
                                       n_dev=n_dev, send_lanes=send_lanes)
    return world_r, rgb_r, present, n_dropped
