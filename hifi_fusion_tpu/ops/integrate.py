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

EXECUTION SHAPE (TPU v5e-measured, 2026-08-17 trace): on this hardware
sorts and scans stream at ~1-1.5 ns/element while random gathers from
HBM-resident tables are latency-bound at ~14-26 ns/element, and integer
division by a non-power-of-2 costs ~23 ns/lane.  The kernel is therefore
organized to touch memory only through sorts, scans and unique-index
scatters:

1. ONE payload-carrying sort groups the frame by cell id (coords/rgb ride
   as sort operands — no post-argsort gathers),
2. valid lanes are compacted to a static ``max_active_points`` prefix so
   every downstream lane space scales with real occupancy, not N_max,
3. the dependant stream expands to (active-point x dependant) pair lanes,
   sorts them by OWNER, fetches each owner's center/normal once per run
   START (<= max_hit_voxels random gathers) and segment-fills them across
   the run — replacing per-lane random gathers,
4. per-owner statistics are segment sums; the single 9-component scatter
   runs over run-END lanes compacted to ``max_hit_voxels``.

Layout: planar (3, N) points; flat slot-major grid fields (grid.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..config import FusionConfig
from ..grid import GridState
from . import geometry, hashing
from .scatter import (end_positions, rows, scatter_add, scatter_set,
                      segment_ends, segment_fill, segment_reduce,
                      segment_starts, segment_sums)

_BIG = jnp.iinfo(jnp.int32).max


def _frontend(points_cam, mask, pose, config, offset=None,
              pre_transformed=False):
    """Transform + clip + cell id + validity.

    Pure XLA by design: a fused Pallas frontend kernel was built, tested
    and carried for two rounds, then deleted — XLA already fuses this
    elementwise chain optimally, the kernel covered no production path
    (the batched and depth-wire ingests inline the same math), and each
    extra custom-call executable costs first-touch load time on the TPU
    service (see README "Why no Pallas kernels").

    ``offset``: shard-local coordinate offset (see geometry.center_of_ids);
    world->coord math stays GLOBAL (bit-identical across shards), only the
    integer coords shift into the shard's local id space.

    ``pre_transformed``: ``points_cam`` is already world-space and already
    clipped/validated by the routing frontend (parallel/routing.py) — skip
    the transform and the camera z-clip, keep the local coord-window test
    (the router targets exactly the windows that pass it).
    """
    if pre_transformed:
        world = points_cam
        coords = geometry.cell_coords(world, config)
        if offset is not None:
            coords = coords - offset[:, None]
        valid = mask & geometry.valid_coords(coords, config)
        return world, geometry.cell_id(coords, config), valid
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


def _unpack_rgb(rgb, ax, is565):
    """Packed u32 0xRRGGBB (is565=False) / 5:6:5 (True) -> (3,...) f32."""
    f32 = jnp.float32
    if is565:
        return jnp.stack([((rgb >> 11) & 0x1F).astype(f32) * 8.0,
                          ((rgb >> 5) & 0x3F).astype(f32) * 4.0,
                          (rgb & 0x1F).astype(f32) * 8.0], axis=ax)
    return jnp.stack([((rgb >> 16) & 0xFF).astype(f32),
                      ((rgb >> 8) & 0xFF).astype(f32),
                      (rgb & 0xFF).astype(f32)], axis=ax)


def _unpack_inputs(points_cam, rgb, mask, quant, rays=None,
                   defer_rgb=False):
    """Wire-format ingest: dequantize/unpack compact frame encodings.

    Ingest variants are keyed on dtype/rank so the f32 path's jaxpr (and
    its persistent-cache entry) is untouched:

    * ``points_cam`` u16 (N,) z-DEPTH image + ``rays`` (3,N) f32
      device-resident scaled pinhole rays — the sensor-native 4 B/pixel
      format (RealSense Z16+RGB565; see utils/synthetic.DepthFrame).
      Unprojection is ONE f32 multiply ``depth * rays``, bit-identical
      to the host-side canonical ``points_f32``.  Zero depth marks an
      invalid pixel (sensor convention).
    * ``points_cam`` u16 (3,N) + ``quant`` (2,3) f32 [scale, offset] —
      dequantized ``q * scale + offset``; the packer uses power-of-two
      scales so this reproduces the host-side f32 values bit-exactly
      (utils/synthetic.pack_frame_q16).
    * ``rgb`` u32 (N,) packed 0xRRGGBB — unpacked to (3,N) f32 channels
      with the CORRECT {16,8,0} shifts (the wire format is ours; the
      reference's blue-shift bug-compat lives in runtime/decode.py where
      its PointCloud2 unpack is reproduced, FUSION.cpp:170-180).
    * ``rgb`` u16 (N,) packed 5:6:5 — expanded to 8-bit channels by the
      usual left-shift convention (r<<3, g<<2, b<<3).
    * ``mask`` scalar int — expands to ``arange(N) < count`` (frames are
      a count-prefixed prefix, no (N,) bool transfer needed).

    4-10 B/point on the wire vs 25 B/point planar-f32 — on bandwidth-
    starved host->device links (the axon tunnel measures ~37 MB/s) the
    frame transfer drops from ~200 ms to 33-80 ms.
    """
    f32 = jnp.float32
    depth_valid = None
    if points_cam.dtype == jnp.uint16 and rays is not None:
        # z-depth image(s): (N,) single frame or (K,N) batched
        depth_valid = points_cam > 0
        if points_cam.ndim == 1:
            points_cam = points_cam.astype(f32)[None, :] * rays
        else:
            points_cam = (points_cam.astype(f32)[:, None, :]
                          * rays[None, :, :])            # (K,3,N)
    elif points_cam.dtype == jnp.uint16:
        if quant is None:
            raise ValueError("u16 points need quant=(2,3) [scale, offset]")
        points_cam = (points_cam.astype(f32) * quant[0][:, None]
                      + quant[1][:, None])
    # rgb unpack: channel axis is 0 (single frame) or 1 (batched).
    # ``defer_rgb``: packed wires stay packed — the caller rides the ONE
    # u32 channel through the frame sort (instead of 3 f32 channels) and
    # unpacks on the compacted NA prefix (_unpack_rgb).
    ax = 0 if points_cam.ndim == 2 else 1
    if rgb.dtype in (jnp.uint32, jnp.uint16):
        is565 = rgb.dtype == jnp.uint16
        if defer_rgb:
            rgb = (rgb.astype(jnp.uint32), is565)
        else:
            rgb = _unpack_rgb(rgb, ax, is565)
    n = points_cam.shape[-1]
    if mask.ndim == 0:
        mask = jnp.arange(n, dtype=jnp.int32) < mask.astype(jnp.int32)
    elif mask.dtype != jnp.bool_:
        # batched count-prefix: (K,) counts -> (K,N) lane masks
        mask = (jnp.arange(n, dtype=jnp.int32)[None, :]
                < mask.astype(jnp.int32)[:, None])
    if depth_valid is not None:
        mask = mask & depth_valid
    return points_cam, rgb, mask


def integrate_frame_impl(grid: GridState,
                         points_cam: jax.Array,  # (3,N) f32 camera-frame pts
                         rgb: jax.Array,         # (3,N) f32 colors [0,255]
                         mask: jax.Array,        # (N,)  bool lane validity
                         pose: jax.Array,        # (4,4) f32 fusion_T_camera
                         *, config: FusionConfig,
                         offset=None, pre_transformed=False,
                         extra_dropped=None, quant=None, rays=None,
                         active_lanes=None, unique_lanes=None,
                         hit_lanes=None,
                         dep_width=None, dep_width_tiers=None) -> GridState:
    """Single-frame (planar (3,N)) or BATCHED ((K,3,N) + (K,4,4) poses)
    integration — batching is keyed on input rank so the single-frame HLO
    is unchanged.

    The batched mode integrates K frames in ONE program: the per-dispatch
    fixed machinery (hash insert, unique compaction, dep-table row gather,
    the full-array cyl/vstats/occ scatter passes) runs once per BATCH
    instead of once per frame — the round-2 trace showed those fixed costs
    dominating the ~210-380 ms/frame wall (PERF.md §4-5).  Sequential
    equivalence: nothing integrate reads (normals, dependants,
    normal_found) changes during integration, sums commute, the stable
    cell-id sort keeps lanes frame-major so first-occupancy viewpoints
    resolve to the earliest frame exactly as sequential integration would;
    integer outputs (occupancy, counts) are bit-identical, f32 sums differ
    only in addition order.

    ``active_lanes / unique_lanes / hit_lanes`` (static)
    override the batch lane budgets; defaults scale the per-frame config
    budgets by K.  Overflows are counted exactly as in the per-frame path.

    ``dep_width_tiers`` (static tuple of widths, ascending) moves the
    dependant-width variant choice ON DEVICE and makes it PER-BATCH: the
    pair machinery is a ``lax.switch`` keyed on the maximum dependant
    count among THIS batch's live cells (a (U,)-gather the pair path
    needs anyway), so a handful of deep cells elsewhere in the table no
    longer force every batch onto the full-width branch — the table-wide
    max was observed at 9 (forcing D=12: 70 ms pair sort + 66 ms dep-row
    gather per batch) while typical batch maxima sit at 6-8.  Exact by
    construction: a branch narrower than the batch's own maximum is never
    selected, and the full ``max_dependants`` width remains the fallback.
    """
    if dep_width_tiers:
        assert dep_width is None, \
            "dep_width and dep_width_tiers are mutually exclusive"
        assert tuple(sorted(dep_width_tiers)) == tuple(dep_width_tiers) \
            and dep_width_tiers[-1] <= config.max_dependants, \
            f"bad dep_width_tiers {dep_width_tiers}"

    C = config.capacity
    D = config.max_dependants
    B = config.buffer_capacity
    f32 = jnp.float32
    i32 = jnp.int32
    points_cam, rgb, mask = _unpack_inputs(points_cam, rgb, mask, quant,
                                           rays, defer_rgb=True)
    # packed wires ride the frame sort as ONE u32 channel (vs 3 f32) and
    # unpack on the compacted NA prefix — 2 fewer sort operands at M lanes
    rgb_packed = isinstance(rgb, tuple)
    if rgb_packed:
        rgb, rgb_is565 = rgb
    batched = points_cam.ndim == 3

    if batched:
        K = points_cam.shape[0]
        N = mask.shape[-1]
        M = K * N
        NA = min(active_lanes if active_lanes is not None
                 else K * config.max_active_points, M)
        U = min(unique_lanes if unique_lanes is not None
                else K * config.max_unique_per_frame, NA)
        UH_req = min(hit_lanes if hit_lanes is not None
                     else K * config.max_hit_voxels, NA * D)
        if max(U, UH_req) > config.scatter_tail:
            raise ValueError(
                f"batched integrate with K={K} needs scatter-tail "
                f">= {max(U, UH_req)} slots but config.scatter_tail is "
                f"{config.scatter_tail}; raise config.max_batch_frames "
                f"(currently {config.max_batch_frames}) before building "
                f"the grid, or pass smaller unique_lanes/hit_lanes.")
        # frontend, vectorized over frames (planar (3,K,N) broadcasting)
        if pre_transformed:
            # routed ingest (parallel/routing.py): points are already
            # world-space, clipped and validated by the routing frontend —
            # keep only the local coord-window test, as in the
            # single-frame pre_transformed path (_frontend)
            wpl = points_cam.transpose(1, 0, 2)       # (3,K,N)
            coords = geometry.cell_coords(wpl, config)
            if offset is not None:
                coords = coords - offset[:, None, None]
            valid_k = mask & geometry.valid_coords(coords, config)
        else:
            zmin, zmax = config.z_clip
            zclip = (points_cam[:, 2] > zmin) & (points_cam[:, 2] < zmax)
            world_k = jax.vmap(geometry.transform_points)(points_cam, pose)
            wpl = world_k.transpose(1, 0, 2)              # (3,K,N)
            coords = geometry.cell_coords(wpl, config)
            if offset is not None:
                coords = coords - offset[:, None, None]
            valid_k = (mask & zclip
                       & geometry.valid_points(wpl, config)
                       & geometry.valid_coords(coords, config))
        ids = geometry.cell_id(coords, config).reshape(M)
        world = wpl.reshape(3, M)
        valid = valid_k.reshape(M)
        rgb = rgb.reshape(M) if rgb_packed \
            else rgb.transpose(1, 0, 2).reshape(3, M)
        fid = jnp.broadcast_to(jnp.arange(K, dtype=i32)[:, None],
                               (K, N)).reshape(M)
        vp_table = pose[:, :3, 3]                     # (K,3)
    else:
        N = mask.shape[0]
        NA = min(config.max_active_points, N)
        U = min(config.max_unique_per_frame, NA)
        world, ids, valid = _frontend(points_cam, mask, pose, config,
                                      offset, pre_transformed)
        viewpoint = pose[:3, 3]

    # ---- ONE payload sort groups the frame by cell id (invalid last); ---
    # coords (and color) ride as sort operands so no post-argsort gathers
    # are needed, then valid lanes are compacted to the NA-lane prefix.
    # Batched mode also rides the frame id: lanes are frame-major, so the
    # stable sort leaves each cell-id segment frame-ordered and the fid at
    # a segment START is the earliest frame touching that cell — exactly
    # the viewpoint sequential integration would stamp.
    skey = jnp.where(valid, ids, _BIG)
    operands = [skey, world[0], world[1], world[2]]
    if config.store_color:
        operands += [rgb] if rgb_packed else [rgb[0], rgb[1], rgb[2]]
    if batched:
        operands.append(fid)
    sorted_ops = jax.lax.sort(tuple(operands), num_keys=1, is_stable=True)
    sid_f, wx, wy, wz = sorted_ops[:4]
    if config.store_color and rgb_packed:
        rgb_s = _unpack_rgb(sorted_ops[4][:NA], 0, rgb_is565)
    elif config.store_color:
        rgb_s = jnp.stack([sorted_ops[4][:NA], sorted_ops[5][:NA],
                           sorted_ops[6][:NA]], axis=0)
    else:
        rgb_s = jnp.zeros((3, NA), f32)
    if batched:
        fid_s = sorted_ops[-1][:NA]
    n_act = jnp.sum((sid_f != _BIG).astype(i32))
    overflow_active = grid.overflow_active + jnp.maximum(n_act - NA, 0)
    if extra_dropped is not None:
        # routed ingest (parallel/routing.py): send-bucket drops, already
        # mesh-summed and gated to one device by the caller
        overflow_active = overflow_active + extra_dropped
    sid = sid_f[:NA]
    world_s = jnp.stack([wx[:NA], wy[:NA], wz[:NA]], axis=0)
    svalid = sid != _BIG
    starts = segment_starts(sid, svalid)
    seg = jnp.cumsum(starts.astype(i32)) - 1
    n_u = jnp.sum(starts.astype(i32))
    n_sv = jnp.minimum(n_act, NA)
    # end_positions cannot derive the LAST in-budget segment's end when
    # segments overflow the budget (its successor's start lies past the
    # compaction window) — drop that segment too, counted, never corrupt
    u_lim = jnp.where(n_u > U, U - 1, U)
    overflow_unique = grid.overflow_unique + jnp.maximum(n_u - u_lim, 0)

    # ---- compact unique cell ids (prefix-packed, ascending) -------------
    uorder = jnp.argsort(~starts, stable=True)[:U]
    uids = sid[uorder]
    uvalid = starts[uorder]

    # ---- find-or-insert the unique cells --------------------------------
    key_table, uslot, n_failed = hashing.lookup_or_insert(
        grid.key, uids, uvalid, config.max_probes, C, unique_ids=True)

    us = jnp.clip(uslot, 0, C - 1)
    uplaced = uvalid & (uslot >= 0)
    uocc0 = uplaced & (grid.n_pts[us] > 0)
    unf0 = uplaced & grid.normal_found[us]

    # broadcast per-unique values to point lanes by scatter-to-run-start +
    # segment fill (a per-lane gather via ``segc`` is latency-bound at
    # ~19 ns/elem on v5e; the fill streams at ~1 ns/elem).  ``uorder`` is
    # a permutation prefix, so the start positions are unique; rows past
    # the real uniques land on non-start lanes and are never read.
    def _to_points(vals_u, dtype):
        return jnp.zeros((NA,), dtype).at[uorder].set(
            vals_u.astype(dtype), unique_indices=True)

    slot_fill = segment_fill(_to_points(uslot, i32), starts)
    nf0_fill = segment_fill(_to_points(unf0, jnp.bool_), starts)
    in_budget = svalid & (seg < u_lim)
    placed_s = in_budget & (slot_fill >= 0)
    slot_s = jnp.where(placed_s, slot_fill, -1)
    nf0_s = nf0_fill & placed_s

    # ---- per-unique aggregation: Σrgb + point count ---------------------
    pmask = placed_s.astype(f32)
    if config.store_color:
        rgb_rows = jnp.where(placed_s[None, :], rgb_s, 0.0)
    else:
        rgb_rows = jnp.zeros((3, NA), f32)
    vals4 = jnp.concatenate([rgb_rows, pmask[None, :]], axis=0)   # (4,NA)
    sum4 = segment_sums(vals4, starts)
    eorder = end_positions(uorder.astype(i32), n_u, n_sv)
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
    # from n_pts > 0 — no separate bool array or scatter.)
    u32 = jnp.uint32
    word = jnp.where(uplaced, uids >> 5, _BIG)
    bitv = jnp.where(uplaced,
                     u32(1) << (uids & 31).astype(u32), u32(0))
    wst = segment_starts(word, uplaced)
    wen = segment_ends(word, uplaced)
    orscan = segment_reduce(bitv, wst, jnp.bitwise_or, kind="or")
    W = config.n_occ_words
    old_bits = grid.occ_bits[jnp.clip(word, 0, W - 1)]
    occ_bits = scatter_set(grid.occ_bits, word, wen,
                           [old_bits | orscan], W)
    # First-occupancy viewpoint (ghosts re-stamped like the reference's
    # else-branch overwrite, OccupancyGrid.hpp:229,238): a 3-channel SET
    # scatter masked to first-occupancy uniques.  Σrgb: a 3-channel ADD
    # scatter — separate arrays (grid.py) so neither needs to gather the
    # old rows first (the fused set(old+delta) form cost a ~27 ms/batch
    # latency-bound row gather, PERF.md §5).  The raw point count goes to
    # its own array (occupancy reads are full-table slices in
    # refine/extract — PERF.md §4 strided-read pathology).
    first = g_valid & ~g_occ0
    if batched:
        # per-unique viewpoint = pose translation of the EARLIEST frame
        # in the cell's segment (fid at the start lane; tiny (U,) gather
        # into the (K,3) table)
        vp_u = vp_table[fid_s[uorder]]                     # (U,3)
        vp_cols = [vp_u[:, r] for r in range(3)]
    else:
        vp_cols = [jnp.broadcast_to(viewpoint[r], first.shape)
                   for r in range(3)]
    vpoint = scatter_set(grid.viewpoint, g_slot, first, vp_cols, C)
    rgb_sum = scatter_add(grid.rgb_sum, g_slot, g_valid,
                          [g_sum4[r] for r in range(3)], C)
    n_pts = scatter_add(grid.n_pts, g_slot, g_valid, [g_sum4[3]], C)

    # ---- buffer append: one contiguous block write ----------------------
    # pack wanted lanes to the front with a payload sort (coords + slot
    # ride along; a bool key sorts False-first, so key = NOT wanted).
    # This block used to sit under a lax.cond on n_want (the idea: a
    # steady batch with no fresh cells skips the 5-channel NA-lane
    # sort) — but on a sweeping capture EVERY batch brings fresh
    # surface, the branch was always taken, and the cond boundary
    # itself copied the ~54 MB buffer arrays every batch (traced
    # 8.3 ms, %cond.17, 2026-08-21).  Unconditional costs only the
    # sort we were paying anyway and lets the buffer update alias the
    # donated arrays.
    want_s = placed_s & ~nf0_s
    n_want = jnp.sum(want_s.astype(i32))
    fits = grid.buf_count + NA <= B

    _, bwx, bwy, bwz, bwslot = jax.lax.sort(
        (~want_s, world_s[0], world_s[1], world_s[2], slot_s),
        num_keys=1, is_stable=True)
    wv = jnp.stack([bwx, bwy, bwz], axis=0)
    wslot = jnp.where(jnp.arange(NA, dtype=i32) < n_want, bwslot, -1)
    # a non-fitting batch must leave the buffer untouched: clamp the
    # write offset and mask every appended lane invalid, then restore
    # the previous count
    bc = jnp.where(fits, grid.buf_count, B - NA)
    wslot = jnp.where(fits, wslot, -1)
    buf_pts = jax.lax.dynamic_update_slice(
        grid.buf_pts, jnp.where(fits, wv, jax.lax.dynamic_slice(
            grid.buf_pts, (0, bc), (3, NA))), (0, bc))
    buf_slot = jax.lax.dynamic_update_slice(
        grid.buf_slot, jnp.where(
            fits, wslot, jax.lax.dynamic_slice(grid.buf_slot, (bc,),
                                               (NA,))), (bc,))
    buf_count = jnp.where(fits, grid.buf_count + n_want, grid.buf_count)
    overflow_buf = grid.overflow_buf + jnp.where(fits, 0, n_want)

    # ---- dependant streaming (OccupancyGrid.hpp:244-277) ----------------
    # Pair space = (active point, dependant lane).  The round-2 design
    # expanded it to (NA*DW) physical lanes and sorted them by owner —
    # an 85-117 ms 4-channel sort at the K=8 bench shape plus a second
    # full-width start-compaction argsort (~43 ms) and P-lane fills
    # (TPU trace + microbench, 2026-08-19).  This design never builds the
    # expansion: points are ALREADY grouped by cell (the frame sort
    # above), and every point of a cell streams into the SAME <= DW
    # owners, so the 5 cylinder stats are segment-summed per (cell, dep
    # lane) over the existing cell segments — (5*DW) scan channels at
    # ~0.2 ns/elem — and only the tiny (U*DW) per-cell partials are
    # sorted by owner (6-channel sort at U*DW = 2.1 M lanes: 6.3 ms) for
    # the final unique scatter.  Owner constants (center+normal) reach
    # point lanes through a dedup: one (owner, lane-index) sort over
    # (U*DW), <= UH gathers at run starts, a 6-channel fill, and a
    # sort-back by lane index (sorts beat scatters ~20x per index on
    # v5e for multi-channel payloads, microbench 2026-08-19).
    #
    # ``dep_width`` (static) bounds the per-cell fan-in this dispatch
    # handles — every lane space below scales with it.  With
    # ``dep_width_tiers`` the width is chosen per BATCH by a lax.switch
    # on max(dep_count) over the batch's own live cells (exact: a
    # too-narrow branch is never selected); with an explicit
    # ``dep_width`` a too-narrow pick counts its excess pairs in
    # overflow_hits (never silent).  Measured at the 1 mm bench config
    # the batch-live maximum is 6-9 vs the static D=12.
    scale = K if batched else 1
    udep_cnt = grid.dep_count[us]                          # (U,)
    # Every branch pads its compact per-owner outputs to ONE static width
    # so the switch carries ~5 MB, not the grid: an earlier form did the
    # cyl_stats scatter_add INSIDE each branch and returned the updated
    # array — XLA conditionals cannot alias operands through branches on
    # TPU, so the 126 MB cyl_stats was COPIED through the switch every
    # batch (traced at 153 ms/batch = 40% of steady integrate,
    # 2026-08-21 — the single largest line item).
    UH_pad = min(hit_lanes if hit_lanes is not None
                 else scale * config.max_hit_voxels, U * D)
    # Stratified residual (config.dep_resid_*): the dense scans run at
    # the FIRST tier width only; deeper cells' extra lanes ride the
    # compact side path below.  The lane audit (PERF.md §9) measured
    # >=99.9% of point lanes in cells with <= 4 dependants, so the dense
    # width drops from the batch max (6) to 4.
    resid_on = bool(config.dep_resid_pairs) and bool(dep_width_tiers)
    NR = config.dep_resid_pairs
    RC = max(config.dep_resid_cells, 1)
    # static feasibility of the packed-coordinate owner-center channel
    # (pair block): GLOBAL coords must fit 30 bits so the packed int
    # stays a nonnegative i32
    gdims = (config.global_x_cells, config.dims[1], config.dims[2])
    cbits = tuple(max(int(d - 1).bit_length(), 1) for d in gdims)
    pack_ok = sum(cbits) <= 30

    def _resid_block(DW):
        """Cylinder streaming for lanes [DW, dep) of cells deeper than
        ``DW`` — a replay-style compact path (cells compact to RC lanes,
        their (point, extra-lane) pairs expand into NR static lanes by
        scatter-at-offset + segment fill; owner constants ride the link
        records).  Returns per-owner 5-channel sums at NR lanes and the
        overflow delta; overruns (deep cells beyond RC, pairs beyond NR)
        are counted, never silent."""
        DR = D - DW
        resid = uplaced & (udep_cnt > DW)                   # (U,)
        rorder = jnp.argsort(~resid, stable=True)[:RC]
        r_ok_c = resid[rorder]
        r_slot = jnp.clip(us[rorder], 0, C - 1)
        r_pstart = uorder[rorder].astype(i32)   # segment start lane
        r_pcnt = jnp.where(r_ok_c,
                           jnp.round(esum4[3][rorder]).astype(i32), 0)
        r_dep = jnp.where(r_ok_c, jnp.minimum(udep_cnt[rorder], D), 0)
        jl = jnp.arange(DR, dtype=i32)[None, :]             # (1,DR)
        l_ok = r_ok_c[:, None] & (jl < (r_dep - DW)[:, None])
        owner_rows = rows(grid.dep, D, r_slot)[:, DW:]      # (RC,DR)
        l_owner = jnp.where(l_ok, owner_rows, _BIG).reshape(-1)
        lo = jnp.clip(jnp.where(l_ok, owner_rows, 0), 0, C - 1).reshape(-1)
        oc = geometry.center_of_ids(key_table[lo], config,
                                    offset)                 # (3,RL)
        onr = rows(grid.normal, 3, lo)                      # (RL,3)
        RL = RC * DR
        l_cnt = jnp.where(l_ok, r_pcnt[:, None], 0).reshape(-1)
        l_start = jnp.broadcast_to(r_pstart[:, None],
                                   (RC, DR)).reshape(-1)
        lpos = jnp.cumsum(l_cnt)
        lofs = lpos - l_cnt
        t_in = lpos[-1]
        # total residual pairs incl. cells beyond RC — the overflow count
        t_all = jnp.sum(jnp.where(
            resid, jnp.round(esum4[3]).astype(i32)
            * (jnp.minimum(udep_cnt, D) - DW), 0))
        lok = (l_cnt > 0) & (lofs < NR)
        zi = jnp.zeros((NR + RL,), i32)
        zf = jnp.zeros((NR + RL,), f32)
        markb = scatter_set(jnp.zeros((NR + RL,), jnp.bool_), lofs, lok,
                            [jnp.ones((RL,), jnp.bool_)], NR)[:NR]
        fil_i = segment_fill(jnp.stack(
            [scatter_set(zi, lofs, lok, [l_start], NR)[:NR],
             scatter_set(zi, lofs, lok, [lofs], NR)[:NR],
             scatter_set(zi, lofs, lok, [l_owner], NR)[:NR]]), markb)
        fil_f = segment_fill(jnp.stack(
            [scatter_set(zf, lofs, lok, [oc[0]], NR)[:NR],
             scatter_set(zf, lofs, lok, [oc[1]], NR)[:NR],
             scatter_set(zf, lofs, lok, [oc[2]], NR)[:NR],
             scatter_set(zf, lofs, lok, [onr[:, 0]], NR)[:NR],
             scatter_set(zf, lofs, lok, [onr[:, 1]], NR)[:NR],
             scatter_set(zf, lofs, lok, [onr[:, 2]], NR)[:NR]]), markb)
        lane = jnp.arange(NR, dtype=i32)
        rvalid = lane < jnp.minimum(t_in, NR)
        pidx = jnp.clip(fil_i[0] + (lane - fil_i[1]), 0, NA - 1)
        r_pt = jnp.stack([world_s[0][pidx], world_s[1][pidx],
                          world_s[2][pidx]])                # (3,NR)
        rq = r_pt - fil_f[0:3]
        rt = jnp.sum(rq * fil_f[3:6], axis=0)
        rr_ = rq - rt[None, :] * fil_f[3:6]
        rdist = jnp.sqrt(jnp.sum(rr_ * rr_, axis=0))
        rhit = rvalid & (rdist < config.cylinder_radius)
        v5 = jnp.where(rhit[None, :], jnp.stack(
            [rt, rt * rt, rdist, rdist * rdist,
             jnp.ones((NR,), f32)], axis=0), 0.0)
        # reduce by owner: NR is small, so sort + segment sums + masked
        # end-lane scatter (no compaction needed)
        srt = jax.lax.sort(
            (jnp.where(rvalid, fil_i[2], _BIG),) + tuple(
                v5[r] for r in range(5)), num_keys=1, is_stable=True)
        so = srt[0]
        s_ok = so != _BIG
        rst = segment_starts(so, s_ok)
        ren = segment_ends(so, s_ok)
        rs5 = segment_sums(jnp.stack(srt[1:], axis=0), rst)
        ovf2 = jnp.maximum(t_all - jnp.minimum(t_in, NR), 0)
        return so, ren, rs5, ovf2

    def _pair_block(DW):
        """The dependant-stream path at static width ``DW``; returns the
        compacted per-owner 5-channel sums (padded to ``UH_pad`` lanes)
        and the overflow DELTA — the caller scatters once, outside any
        switch."""
        M2 = U * DW
        UH = min(hit_lanes if hit_lanes is not None
                 else scale * config.max_hit_voxels, M2)
        dj_row = jnp.arange(DW, dtype=i32)[None, :]        # (1,DW)
        # ONE row gather (k contiguous elems/index) — U indices, not U*DW
        udep_rows = rows(grid.dep, D, us)[:, :DW]          # (U,DW)
        ujvalid = (uplaced[:, None] & (dj_row < udep_cnt[:, None])
                   & (udep_rows >= 0))                     # (U,DW)

        # -- owner constants, dedup'd over the batch's distinct owners --
        flat_own = jnp.where(ujvalid, udep_rows, _BIG).reshape(-1)  # (M2,)
        so_own, so_idx = jax.lax.sort(
            (flat_own, jnp.arange(M2, dtype=i32)), num_keys=1,
            is_stable=True)
        ostarts = segment_starts(so_own, so_own != _BIG)
        n_own = jnp.sum(ostarts.astype(i32))
        oorder = jnp.argsort(~ostarts, stable=True)[:UH]
        start_own = so_own[oorder]
        oso = jnp.clip(start_own, 0, C - 1)
        o_nrows = rows(grid.normal, 3, oso)                # (UH,3)
        uh_lim = jnp.where(n_own > UH, UH - 1, n_own)
        overflow_hits = jnp.maximum(n_own - uh_lim, 0)
        # pairs beyond the dep_width window: handled by the residual
        # side path when enabled (every (point, lane) pair computed
        # exactly once); otherwise impossible when the width came from
        # the per-batch switch (it covers the batch max), live only via
        # an explicit too-narrow ``dep_width=`` (counted, never silent).
        # Per-unique placed-point counts (esum4[3]) make the count O(U).
        if DW < D and not resid_on:
            overflow_hits = overflow_hits + jnp.sum(jnp.where(
                uplaced,
                jnp.round(esum4[3]).astype(i32)
                * jnp.maximum(udep_cnt - DW, 0), 0))
        # owners whose run start overflowed UH carry no constants — gate
        # them out (counted above).  oorder holds the UH lowest-owner
        # runs (starts ascend in owner-sorted lane order), so dropped
        # owners are exactly those at or above the first dropped run's
        # owner — one scalar threshold.  The threshold also gates
        # DIRECTLY in (u, j) space (the owner of lane (u, j) is
        # udep_rows[u, j]), so no ok channel needs to round-trip through
        # the restore sort.
        thresh = jnp.where(n_own > UH,
                           start_own[jnp.minimum(uh_lim, UH - 1)], _BIG)
        okj = ujvalid & (udep_rows < thresh)               # (U,DW)

        def _at_starts(vals):                              # (UH,) -> (M2,)
            # oorder is a permutation prefix => unique positions; rows
            # past the real starts land on non-start lanes, never read
            return jnp.zeros((M2,), vals.dtype).at[oorder].set(
                vals, unique_indices=True)

        if pack_ok:
            # Owner CENTERS travel as ONE packed-coordinate int channel
            # instead of 3 f32 channels: id -> global coords at the UH
            # run starts (cheap), packed into <= 30 bits, and decoded at
            # the point lanes with shift/mask + the exact cell_center
            # arithmetic (pow2 bit ops — the ~23 ns/lane non-pow2 div
            # that makes a per-lane id decode prohibitive, PERF.md §3,
            # does not apply).  With the ok channel folded into the
            # thresh gate above, the pair block's per-dep-lane scan
            # floor drops from 11 channels to 9 (PERF.md §9): the
            # NA-wide constants fill runs (1+3)*DW channels instead of
            # 6*DW and the M2 restore sort 5 operands instead of 8.
            bx, by, bz = cbits
            o_coords = geometry.id_to_coords(key_table[oso], config)
            if offset is not None:
                o_coords = o_coords + offset[:, None]
            kp = jnp.where(jnp.arange(UH, dtype=i32) < uh_lim,
                           o_coords[0] | (o_coords[1] << bx)
                           | (o_coords[2] << (bx + by)),
                           -1)                             # (UH,)
            conk = segment_fill(_at_starts(kp), ostarts)   # (M2,) i32
            conf = segment_fill(jnp.stack(
                [_at_starts(o_nrows[:, 0]), _at_starts(o_nrows[:, 1]),
                 _at_starts(o_nrows[:, 2])], axis=0), ostarts)  # (3,M2)
            # back to (u, j) order: so_idx is a permutation of
            # arange(M2), so a stable sort on it restores flat
            # (cell-major) order exactly
            inv = jax.lax.sort((so_idx, conk, conf[0], conf[1], conf[2]),
                               num_keys=1, is_stable=True)
            kj = jnp.where(okj, inv[1].reshape(U, DW), -1)  # (U,DW)
            nj = jnp.stack(inv[2:5], axis=0).reshape(3, U, DW)
            nstar = jnp.where(okj.T[None],
                              jnp.transpose(nj, (0, 2, 1)), 0.0)
            # -1 init: lanes before the first segment start never receive
            # a fill value and must decode as invalid, not cell (0,0,0)
            kfill0 = jnp.full((DW, NA), -1, i32).at[:, uorder].set(
                kj.T, unique_indices=True)
            nfill0 = jnp.zeros((3 * DW, NA), f32).at[:, uorder].set(
                nstar.reshape(3 * DW, U), unique_indices=True)
            kfill = segment_fill(kfill0, starts)           # (DW,NA) i32
            nfill = segment_fill(nfill0, starts).reshape(3, DW, NA)
            kvalid = kfill >= 0
            kc = jnp.maximum(kfill, 0)
            ccoords = jnp.stack(
                [kc & ((1 << bx) - 1), (kc >> bx) & ((1 << by) - 1),
                 kc >> (bx + by)], axis=0)                 # (3,DW,NA)
            # exact cell_center arithmetic (geometry.cell_center):
            # origin + res * (coord + 0.5), f32, no contraction
            org = jnp.asarray(config.origin, f32)
            resv = jnp.asarray(config.resolution, f32)
            cfill = (org[:, None, None]
                     + resv[:, None, None]
                     * (ccoords.astype(f32) + 0.5))        # (3,DW,NA)
        else:
            # coords exceed 30 packed bits (gigantic single-axis grids):
            # the centers ride as 3 f32 channels, gated by an ok channel
            # folded into a far-away center at the (u, j) stage
            o_center = geometry.center_of_ids(key_table[oso], config,
                                              offset)      # (3,UH)
            confill = segment_fill(jnp.stack(
                [_at_starts(o_center[0]), _at_starts(o_center[1]),
                 _at_starts(o_center[2]), _at_starts(o_nrows[:, 0]),
                 _at_starts(o_nrows[:, 1]), _at_starts(o_nrows[:, 2])],
                axis=0), ostarts)                          # (6,M2)
            inv = jax.lax.sort((so_idx, confill[0], confill[1],
                                confill[2], confill[3], confill[4],
                                confill[5]),
                               num_keys=1, is_stable=True)
            con = jnp.stack(inv[1:7], axis=0).reshape(6, U, DW)
            okt = okj.T[None]                              # (1,DW,U)
            # fold invalid/dropped lanes into the constants: a far-away
            # center (finite: hr^2 stays below f32 max, no NaN path)
            # makes the cylinder gate reject every point of the lane
            cstar = jnp.where(okt, jnp.transpose(con[:3], (0, 2, 1)),
                              3e18)
            nstar = jnp.where(okt, jnp.transpose(con[3:], (0, 2, 1)),
                              0.0)
            smat = jnp.concatenate([cstar, nstar], 0).reshape(6 * DW, U)
            fill0 = jnp.zeros((6 * DW, NA), f32).at[:, uorder].set(
                smat, unique_indices=True)
            filled = segment_fill(fill0, starts)           # (6DW,NA)
            cfill = filled[:3 * DW].reshape(3, DW, NA)
            nfill = filled[3 * DW:].reshape(3, DW, NA)
            kvalid = True

        # -- per-(point, lane) cylinder test; arithmetic identical to the
        # reference's projectPointToVector form (OccupancyGrid.hpp:40-49)
        hq = world_s[:, None, :] - cfill                   # (3,DW,NA)
        ht = jnp.sum(hq * nfill, axis=0)                   # scalar proj t
        hr = hq - ht[None] * nfill
        hdist = jnp.sqrt(jnp.sum(hr * hr, axis=0))         # (DW,NA)
        hhit = (placed_s[None, :] & kvalid
                & (hdist < config.cylinder_radius))
        # SCALAR sum form (grid.py cyl_stats): q_proj = t*n with the
        # owner's constant normal, so only [t, t², d, d², 1] need summing
        vals5 = jnp.where(hhit[None], jnp.stack(
            [ht, ht * ht, hdist, hdist * hdist,
             jnp.ones_like(ht)], axis=0), 0.0)             # (5,DW,NA)
        hsum = segment_sums(vals5.reshape(5 * DW, NA), starts)
        part = hsum[:, eorder]                             # (5DW,U) at ends

        # -- reduce (cell, lane) partials by owner: same key as the
        # constants sort => same permutation, so ostarts/oorder are
        # reused; end positions derive from the start positions
        flat5 = jnp.transpose(part.reshape(5, DW, U),
                              (0, 2, 1)).reshape(5, M2)
        psort = jax.lax.sort((flat_own, flat5[0], flat5[1], flat5[2],
                              flat5[3], flat5[4]), num_keys=1,
                             is_stable=True)
        rsum5 = segment_sums(jnp.stack(psort[1:], axis=0), ostarts)
        n_uj = jnp.sum(ujvalid.astype(i32))
        eorder2 = end_positions(oorder.astype(i32), n_own, n_uj)
        e_owner = so_own[eorder2]
        e_ok = jnp.arange(UH, dtype=i32) < uh_lim
        e5 = rsum5[:, eorder2]                             # (5,UH)
        pad = UH_pad - UH
        if pad:
            e_owner = jnp.pad(e_owner, (0, pad))
            e_ok = jnp.pad(e_ok, (0, pad))
            e5 = jnp.pad(e5, ((0, 0), (0, pad)))
        return e_owner, e_ok, e5, overflow_hits

    # Dense and residual per-owner sums stay SEPARATE through the switch
    # and scatter in two calls below: the same owner cell can legitimately
    # be a dep lane j < DW of one cell (dense) and lane j >= DW of a
    # deeper cell (residual), so one concatenated scatter would carry
    # duplicate indices — undefined behavior under unique_indices=True on
    # backends that honor the hint (advisor r4, high).  Two sequential
    # unique-index scatters compose exactly regardless of overlap.
    def _zeros_resid():
        return (jnp.zeros((NR,), i32), jnp.zeros((NR,), jnp.bool_),
                jnp.zeros((5, NR), f32))

    def _pair_empty():
        # pre-normal batches (no cell has dependants yet): the whole
        # pair machinery — sort, fills, sums — is a no-op; selected
        # only when bmax == 0
        dense = (jnp.zeros((UH_pad,), i32),
                 jnp.zeros((UH_pad,), jnp.bool_),
                 jnp.zeros((5, UH_pad), f32))
        return dense + (_zeros_resid() if resid_on else ()) + (jnp.int32(0),)

    def _with_resid(w):
        def run():
            eo, ek, e5m, ov = _pair_block(w)
            ro, rk, r5, ov2 = _resid_block(w)
            return (eo, ek, e5m, ro, rk, r5, ov + ov2)
        return run

    def _dense_only(w):
        # full-width tier (w == D): no residual lanes exist, but when
        # resid_on every branch must return matching shapes (advisor r4,
        # medium — a tier equal to D previously crashed at trace time)
        def run():
            eo, ek, e5m, ov = _pair_block(w)
            return (eo, ek, e5m) + (_zeros_resid() if resid_on else ()) \
                + (ov,)
        return run

    if dep_width_tiers:
        tiers_full = ((0,) if dep_width_tiers[0] > 0 else ()) \
            + tuple(dep_width_tiers)
        # with the residual path every tier width is EXACT at any depth,
        # so the full-width fallback branch is unnecessary
        widths = list(tiers_full) + (
            [] if resid_on or tiers_full[-1] >= D else [D])
        bmax = jnp.max(jnp.where(uplaced, udep_cnt, 0))
        ix = jnp.minimum(
            jnp.searchsorted(jnp.asarray(tiers_full, i32), bmax,
                             side="left").astype(i32), len(widths) - 1)
        out = jax.lax.switch(
            ix, [_pair_empty if w == 0
                 else (_with_resid(w) if resid_on and w < D
                       else _dense_only(w))
                 for w in widths])
    else:
        out = _dense_only(
            min(dep_width if dep_width is not None else D, D))()
    # TWO scatters outside the switch: cyl_stats aliases the donated grid
    # in place; only the compact per-owner outputs crossed the branch
    if resid_on:
        e_owner, e_ok, e5, r_owner, r_ok, r5, ovf_h = out
    else:
        e_owner, e_ok, e5, ovf_h = out
    cyl_stats = scatter_add(grid.cyl_stats, e_owner, e_ok,
                            [e5[r] for r in range(5)], C)
    if resid_on:
        cyl_stats = scatter_add(cyl_stats, r_owner, r_ok,
                                [r5[r] for r in range(5)], C)
    overflow_hits = grid.overflow_hits + ovf_h

    return grid._replace(
        key=key_table,
        occ_bits=occ_bits,
        cyl_stats=cyl_stats,
        viewpoint=vpoint,
        rgb_sum=rgb_sum,
        n_pts=n_pts,
        buf_pts=buf_pts,
        buf_slot=buf_slot,
        buf_count=buf_count,
        overflow_probe=grid.overflow_probe + n_failed,
        overflow_buf=overflow_buf,
        overflow_unique=overflow_unique,
        overflow_hits=overflow_hits,
        overflow_active=overflow_active,
        frames=grid.frames + (K if batched else 1),
    )


integrate_frame = partial(jax.jit,
                          static_argnames=("config", "pre_transformed",
                                           "active_lanes", "unique_lanes",
                                           "hit_lanes",
                                           "dep_width", "dep_width_tiers"),
                          donate_argnames=("grid",))(integrate_frame_impl)
