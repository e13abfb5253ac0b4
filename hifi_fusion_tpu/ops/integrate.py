"""Frame integration: fused transform + clip + sorted hash-scatter + stream.

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

All accumulators are sums, so updates commute and the result is independent
of point order — the property that makes the reference's "parallelize
addPoints" TODO (its commented-out OMP criticals, OccupancyGrid.hpp:207-244)
actually achievable.

EXECUTION SHAPE (TPU-measured; see ops/scatter.py): the frame is sorted by
cell id once; every downstream grid update is a segment reduction followed
by one sorted-unique scatter.  Dependant-stream cylinder hits are compacted
by a second sort over (point x dependant) lanes.  The only non-gather/sort
heavy ops that remain are O(#unique-cells) scatters — ~milliseconds.
Layout: planar (3, N) points; flat slot-major grid fields (grid.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..config import FusionConfig
from ..grid import GridState
from . import geometry, hashing, pallas_kernels
from .scatter import (scatter_add, scatter_set, segment_ends,
                      segment_reduce, segment_starts, segment_sums)

_BIG = jnp.iinfo(jnp.int32).max


def _frontend(points_cam, mask, pose, config, offset=None):
    """Transform + clip + cell id + validity (Pallas on TPU, XLA off-TPU).

    ``offset``: shard-local coordinate offset (see geometry.center_of_ids);
    world->coord math stays GLOBAL (bit-identical across shards), only the
    integer coords shift into the shard's local id space.
    """
    if (config.use_pallas and offset is None
            and pallas_kernels.frontend_available()):
        return pallas_kernels.transform_clip_cellid(
            points_cam, mask, pose, config=config)
    zmin, zmax = config.z_clip
    zclip = (points_cam[2] > zmin) & (points_cam[2] < zmax)
    world = geometry.transform_points(points_cam, pose)
    coords = geometry.cell_coords(world, config)
    if offset is not None:
        coords = coords - offset[:, None]
    valid = (mask & zclip
             & geometry.valid_points(world, config)
             & geometry.valid_coords(coords, config))
    return world, geometry.cell_id(coords, config), valid


def _axis_distance(q, n):
    """(q_proj, dist) exactly as the oracle computes them: project, subtract,
    norm — bit-compatible with OracleGrid._cylinder_accumulate."""
    t = jnp.sum(q * n, axis=0, keepdims=True)
    q_proj = t * n
    r = q - q_proj
    return q_proj, jnp.sqrt(jnp.sum(r * r, axis=0))


def integrate_frame_impl(grid: GridState,
                         points_cam: jax.Array,  # (3,N) f32 camera-frame pts
                         rgb: jax.Array,         # (3,N) f32 colors [0,255]
                         mask: jax.Array,        # (N,)  bool lane validity
                         pose: jax.Array,        # (4,4) f32 fusion_T_camera
                         *, config: FusionConfig,
                         offset=None) -> GridState:
    C = config.capacity
    D = config.max_dependants
    B = config.buffer_capacity
    N = mask.shape[0]
    U = min(config.max_unique_per_frame, N)
    H = min(config.max_hits_per_frame, D * N)
    f32 = jnp.float32
    i32 = jnp.int32

    world, ids, valid = _frontend(points_cam, mask, pose, config, offset)
    viewpoint = pose[:3, 3]

    # ---- sort the frame by cell id (invalid lanes last) -----------------
    skey = jnp.where(valid, ids, _BIG)
    order = jnp.argsort(skey, stable=True)
    sid = skey[order]
    svalid = sid != _BIG
    world_s = world[:, order]
    starts = segment_starts(sid, svalid)
    ends = segment_ends(sid, svalid)
    seg = jnp.cumsum(starts.astype(i32)) - 1
    n_u = jnp.sum(starts.astype(i32))
    overflow_unique = grid.overflow_unique + jnp.maximum(n_u - U, 0)

    # ---- compact unique cell ids (prefix-packed, ascending) -------------
    uorder = jnp.argsort(~starts, stable=True)[:U]
    uids = sid[uorder]
    uvalid = starts[uorder]

    # ---- find-or-insert the unique cells --------------------------------
    key_table, uslot, n_failed = hashing.lookup_or_insert(
        grid.key, uids, uvalid, config.max_probes, C)

    segc = jnp.clip(seg, 0, U - 1)
    slot_s = uslot[segc]
    placed_s = svalid & (seg < U) & (slot_s >= 0)
    slot_s = jnp.where(placed_s, slot_s, -1)

    us = jnp.clip(uslot, 0, C - 1)
    uplaced = uvalid & (uslot >= 0)
    uocc0 = uplaced & (grid.vstats[us * 7 + 6] > 0)
    unf0 = uplaced & grid.normal_found[us]
    nf0_s = unf0[segc] & placed_s

    # ---- per-unique aggregation: Σrgb + point count ---------------------
    pmask = placed_s.astype(f32)
    if config.store_color:
        rgb_rows = jnp.where(placed_s[None, :], rgb[:, order], 0.0)
    else:
        rgb_rows = jnp.zeros((3, N), f32)
    vals4 = jnp.concatenate([rgb_rows, pmask[None, :]], axis=0)   # (4,N)
    sum4 = segment_sums(vals4, starts)
    eorder = jnp.argsort(~ends, stable=True)[:U]
    esum4 = sum4[:, eorder]          # (4,U) aligned with uids/uslot

    # ---- grid writes go straight out in uids order: scatter only needs
    # UNIQUE indices (ops/scatter.py), and uslot is unique per frame ------
    g_slot = uslot
    g_valid = uplaced
    g_occ0 = uocc0
    g_sum4 = esum4

    # cell-id-keyed occupancy bitmap (read by the refine gate, grid.py).
    # uids ascend => words ascend; OR-reduce runs of equal words, then one
    # sorted-unique read-modify-write.  (Slot-keyed occupancy is derived
    # from vstats n_pts > 0 — no separate array or scatter.)
    u32 = jnp.uint32
    word = jnp.where(uplaced, uids >> 5, _BIG)
    bitv = jnp.where(uplaced,
                     u32(1) << (uids & 31).astype(u32), u32(0))
    wst = segment_starts(word, uplaced)
    wen = segment_ends(word, uplaced)
    orscan = segment_reduce(bitv, wst, jnp.bitwise_or)
    W = config.n_occ_words
    old_bits = grid.occ_bits[jnp.clip(word, 0, W - 1)]
    occ_bits = scatter_set(grid.occ_bits, word, wen,
                           [old_bits | orscan], W)
    # First-occupancy viewpoint (ghosts re-stamped like the reference's
    # else-branch overwrite, OccupancyGrid.hpp:229,238) + Σrgb + n_pts,
    # fused into ONE set-scatter over the slot-sorted lanes: adds become
    # set(old + delta), the viewpoint keeps its old value unless this is
    # the voxel's first occupancy.
    gs = jnp.clip(g_slot, 0, C - 1)
    old7 = [grid.vstats[gs * 7 + r] for r in range(7)]
    first = g_valid & ~g_occ0
    cols7 = [jnp.where(first, viewpoint[r], old7[r]) for r in range(3)]
    cols7 += [old7[3 + r] + g_sum4[r] for r in range(4)]
    vstats = scatter_set(grid.vstats, g_slot, g_valid, cols7, C)

    # ---- buffer append: one contiguous block write ----------------------
    want_s = placed_s & ~nf0_s
    n_want = jnp.sum(want_s.astype(i32))
    border = jnp.argsort(~want_s, stable=True)
    wv = world_s[:, border]
    wslot = jnp.where(jnp.arange(N, dtype=i32) < n_want,
                      slot_s[border], -1)
    fits = grid.buf_count + N <= B

    def _append(args):
        bp, bs, bc = args
        bp = jax.lax.dynamic_update_slice(bp, wv, (0, bc))
        bs = jax.lax.dynamic_update_slice(bs, wslot, (bc,))
        return bp, bs

    buf_pts, buf_slot = jax.lax.cond(
        fits, _append, lambda a: (a[0], a[1]),
        (grid.buf_pts, grid.buf_slot, grid.buf_count))
    buf_count = jnp.where(fits, grid.buf_count + n_want, grid.buf_count)
    overflow_buf = grid.overflow_buf + jnp.where(fits, 0, n_want)

    # ---- dependant streaming (OccupancyGrid.hpp:244-277) ----------------
    slot_ss = jnp.clip(slot_s, 0, C - 1)
    dj = jnp.arange(D, dtype=i32)[:, None]
    dep_g = grid.dep[slot_ss[None, :] * D + dj]            # (D,N)
    dep_cnt = grid.dep_count[slot_ss]
    oactive = placed_s[None, :] & (dj < dep_cnt[None, :]) & (dep_g >= 0)
    osafe = jnp.clip(dep_g, 0, C - 1)
    o_center = geometry.center_of_ids(key_table[osafe], config,
                                      offset)                 # (3,D,N)
    o_normal = jnp.stack(
        [grid.normal[osafe * 3 + r] for r in range(3)], axis=0)
    q = world_s[:, None, :] - o_center
    _, dist = _axis_distance(q, o_normal)
    hit = oactive & (dist < config.cylinder_radius)
    n_hits = jnp.sum(hit.astype(i32))
    overflow_hits = grid.overflow_hits + jnp.maximum(n_hits - H, 0)

    # compact hits, grouped by owner slot (flat (D*N,) lane space)
    hkey = jnp.where(hit, dep_g, _BIG).reshape(-1)
    horder = jnp.argsort(hkey, stable=True)[:H]
    howner = hkey[horder]
    hvalid = howner != _BIG
    hpt = world_s[:, horder % N]                           # (3,H)
    hosafe = jnp.clip(howner, 0, C - 1)
    h_center = geometry.center_of_ids(key_table[hosafe], config, offset)
    h_normal = jnp.stack(
        [grid.normal[hosafe * 3 + r] for r in range(3)], axis=0)
    hq = hpt - h_center
    hqp, hdist = _axis_distance(hq, h_normal)
    # Segment flags come from run membership (howner) alone; the distance
    # re-gate applies only to the accumulated VALUES.  If the recomputed
    # hdist of a run's first lane ever flipped past the gate (borderline
    # f32), the run would otherwise lose its start flag and absorb the
    # previous owner's partial sums.
    hhit = hvalid & (hdist < config.cylinder_radius)
    vals9 = jnp.where(hhit[None, :], jnp.concatenate(
        [hqp, hqp * hqp, hdist[None], (hdist * hdist)[None],
         jnp.ones((1, H), f32)], axis=0), 0.0)
    hstarts = segment_starts(howner, hvalid)
    hends = segment_ends(howner, hvalid)
    hsum9 = segment_sums(vals9, hstarts)
    # scatter straight from the run-end lanes: owners are unique across
    # ends, which is all the fast path needs (no compaction)
    cyl_stats = scatter_add(grid.cyl_stats, howner, hends,
                            [hsum9[r] for r in range(9)], C)

    return grid._replace(
        key=key_table,
        occ_bits=occ_bits,
        cyl_stats=cyl_stats,
        vstats=vstats,
        buf_pts=buf_pts,
        buf_slot=buf_slot,
        buf_count=buf_count,
        overflow_probe=grid.overflow_probe + n_failed,
        overflow_buf=overflow_buf,
        overflow_unique=overflow_unique,
        overflow_hits=overflow_hits,
        frames=grid.frames + 1,
    )


integrate_frame = partial(jax.jit, static_argnames=("config",),
                          donate_argnames=("grid",))(integrate_frame_impl)
