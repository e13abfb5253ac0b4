"""Normal refinement pass: the TPU rebuild of ``updateThicknessVectors``.

The reference (OccupancyGrid.hpp:311-454) walks every unprocessed voxel,
counts occupied cells in its 5x5x5 neighborhood, PCA-fits a plane normal over
the occupied neighbor centers, orients it toward the stored viewpoint, then
walks +-K voxels along the normal registering itself as a *dependant* of each
line voxel (creating "ghost" voxels where the line leaves occupancy) and
retroactively pushes each line voxel's buffered points through the cylinder
filter.

Here the whole pass is one batched device function built on the sort-centric
scatter discipline (ops/scatter.py):

* candidate compaction (occupied & !normal_found) with a static bound —
  ``jnp.nonzero(size=U)`` already yields sorted unique slots,
* neighborhood occupancy via batched hash lookups (gathers — cheap),
* covariance in *offset space* (translation-invariant, so one shared
  (9, 125) moment basis turns the PCA accumulation into one MXU matmul),
* closed-form eigen33 (component form, pure VPU),
* dependant-table append: pairs sorted by line slot; ranks within segments
  give each link its slot-major position, so the table write is a single
  ascending-unique scatter,
* retroactive buffer replay: (dependant-lane x buffer-lane) hits compacted
  by one sort over the active prefix, segment-reduced per owner, then one
  sorted-unique scatter.

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
from .eigen33 import smallest_eigenpair_sym
from .scatter import (end_positions, rows, scatter_add, scatter_set,
                      segment_ends, segment_fill, segment_starts,
                      segment_sums)

_BIG = jnp.iinfo(jnp.int32).max


def _neighbor_offsets(config: FusionConfig) -> np.ndarray:
    """(3,M) int offsets of the (2k+1)^3 window (reference setK loop order,
    OccupancyGrid.hpp:138-149)."""
    k = config.k_neighborhood
    r = np.arange(-k, k + 1)
    grid = np.stack(np.meshgrid(r, r, r, indexing="ij"), axis=-1)
    return grid.reshape(-1, 3).T.copy()


def refine_pass_impl(grid: GridState, *, config: FusionConfig,
                     offset=None, replay_lanes=None, cand_lanes=None,
                     buf_lanes=None, replay_runs=None,
                     tiers=None, replay_tiers=None,
                     _hoisted=None) -> GridState:
    """Budget overrides (all static, smaller-or-equal to the config bounds;
    ``None`` = the config value) let steady-state passes run on live-count-
    sized lane spaces instead of worst-case ones — the round-1 trace showed
    full-budget machinery dominating steady passes where live counts are
    10-100x below the budgets (PERF.md §4):

    * ``cand_lanes``   — refine candidates per pass (config U); excess
      candidates are DEFERRED to the next pass (counted overflow_refine).
    * ``buf_lanes``    — buffer prefix scanned for replay + reclamation;
      live lanes are always the [0, buf_count) prefix, so any
      ``buf_lanes >= buf_count`` is exact.  If buf_count exceeds it, the
      pass skips replay/reclamation entirely and counts overflow_replay
      (the session policy sizes it from quick_counts so this never fires).
    * ``replay_runs``  — distinct buffered-slot runs replayable (config RB).
    * ``replay_lanes`` — replay pair-point lanes (config R2), as before.

    ``tiers`` (static) moves the budget-variant choice ON DEVICE: a tuple
    of ``(cand_lanes, buf_lanes, replay_runs, replay_lanes)`` tuples,
    ascending.  The pass computes the live candidate/buffer counts and
    ``lax.switch``es into the first tier whose budgets cover them, falling
    back to the full config budgets.  This replaces the host-side policy
    (fetch ``quick_counts`` → pick a compiled variant → dispatch) that cost
    two ~34 ms device→host round-trips per cadence on the axon tunnel and
    stalled the async dispatch pipeline (PERF.md §5) — with tiers the whole
    sweep runs sync-free.  Tier selection is exact: the conditions match
    the budgets' own fit requirements, so a tiered pass never overflows
    where the equivalent host policy would not.
    """
    if tiers:
        assert (cand_lanes is None and buf_lanes is None
                and replay_runs is None and replay_lanes is None), \
            "tiers and explicit budgets are mutually exclusive"
        from ..grid import occupied_slots as _occ
        Cc = config.capacity
        # HOISTED candidate compaction: the tier choice needs n_cand
        # anyway, and every branch needs the same full-capacity stable
        # partition (only its [:U] slice width differs) — computing it
        # once here instead of per-branch saves the duplicate full-table
        # mask + 4.2M-lane argsort (~10 ms/pass at the bench config;
        # XLA cannot CSE across the switch boundary).
        cand_mask_h = _occ(grid, Cc) & ~grid.normal_found[:Cc]
        n_cand = jnp.sum(cand_mask_h.astype(jnp.int32))
        corder_h = jnp.argsort(~cand_mask_h, stable=True)
        nbuf = grid.buf_count
        # When the LAST tier already equals the full config budgets, the
        # fallback branch would instantiate a bit-identical copy of it —
        # skip it.  Every tier combination compiles its own shape family
        # (~100 s per novel sort/scatter subcomputation on the axon
        # service, PERF.md §2) and lands in the executable; the round-2/3
        # warm-start pathology (209 MB refine executable, driver bench
        # deadline) was exactly this ladder width.
        full = (config.max_refine_candidates, config.buffer_capacity,
                config.max_replay_active, config.max_replay_hits)
        branches = list(tiers) + ([] if tuple(tiers[-1]) == full else [None])
        ix = jnp.int32(len(branches) - 1)   # last branch: full budgets
        for i in reversed(range(len(branches) - 1)):
            cl, bl, rr, _rl = branches[i]
            fit = (n_cand <= cl) & (nbuf <= min(rr, bl))
            ix = jnp.where(fit, jnp.int32(i), ix)

        def _mk(budget):
            def _branch(g):
                kw = {} if budget is None else dict(
                    cand_lanes=budget[0], buf_lanes=budget[1],
                    replay_runs=budget[2], replay_lanes=budget[3])
                return refine_pass_impl(g, config=config, offset=offset,
                                        replay_tiers=replay_tiers,
                                        _hoisted=(n_cand, corder_h), **kw)
            return _branch

        return jax.lax.switch(ix, [_mk(t) for t in branches], grid)

    C = config.capacity
    D = config.max_dependants
    U = min(cand_lanes if cand_lanes is not None
            else config.max_refine_candidates, config.max_refine_candidates)
    K = config.line_k
    L = config.n_line            # 2K+1
    B = config.buffer_capacity
    BL = min(buf_lanes if buf_lanes is not None else B, B)
    f32 = jnp.float32
    i32 = jnp.int32

    # --- candidate compaction (sorted unique slots by construction) ------
    # argsort(~mask) is a stable partition: the True lanes' indices land
    # ascending in the prefix — identical to nonzero(size=U) but ~3x
    # cheaper on v5e (nonzero's lowering measured 36.6 ms at C=4.19M,
    # PERF.md §5; a 2-op sort streams at ~1.4 ns/elem/op).  A tiered
    # caller hoists this block out of its lax.switch (computed once for
    # the tier choice AND every branch).
    if _hoisted is not None:
        n_cand, corder = _hoisted
    else:
        from ..grid import occupied_slots
        cand_mask = occupied_slots(grid, C) & ~grid.normal_found[:C]
        n_cand = jnp.sum(cand_mask.astype(i32))
        corder = jnp.argsort(~cand_mask, stable=True)
    # configs may budget more candidates than table slots (nonzero's old
    # size=U padding) — pad the partition out to U lanes
    corder = corder[:U] if U <= C else jnp.pad(corder, (0, U - C))
    cand_ok = jnp.arange(U, dtype=i32) < jnp.minimum(n_cand, U)
    cand_slot = jnp.where(cand_ok, corder.astype(i32), -1)
    cslot = jnp.clip(cand_slot, 0, C - 1)
    overflow_refine = grid.overflow_refine + jnp.maximum(n_cand - U, 0)

    coords = geometry.id_to_coords(grid.key[cslot], config)       # (3,U)
    # coords are shard-LOCAL when offset is set; centers are always GLOBAL
    if offset is None:
        center = geometry.cell_center(coords, config)             # (3,U)
    else:
        center = geometry.cell_center(coords + offset[:, None], config)

    # --- neighborhood occupancy (OccupancyGrid.hpp:334-349) --------------
    # The (2k+1)^3 window is tested with TWO u32 gathers per (dx,dy)
    # COLUMN instead of one per neighbor: dense cell ids are z-fastest, so
    # a column's 2k+1 occupancy bits live in at most two adjacent bitmap
    # words.  This cuts the latency-bound random-gather count 2.5x
    # (125 -> 50 per candidate; gathers measured ~9-21 ns/elem on v5e).
    kk = config.k_neighborhood
    win = 2 * kk + 1
    rng = np.arange(-kk, kk + 1)
    cgx, cgy = np.meshgrid(rng, rng, indexing="ij")
    col = jnp.asarray(np.stack([cgx.ravel(), cgy.ravel()]), i32)  # (2,Ncol)
    Ncol = col.shape[1]
    dxd, dyd, dzd = config.dims
    u32 = jnp.uint32
    nx = coords[0][None, :] + col[0][:, None]                     # (Ncol,U)
    ny = coords[1][None, :] + col[1][:, None]
    colbase = (nx * dyd + ny) * dzd + coords[2][None, :]          # (Ncol,U)
    shpos = jnp.maximum(colbase - kk, 0)
    W = config.n_occ_words
    w0i = jnp.clip(shpos >> 5, 0, W - 1)
    # both column words as TWO flat 1-D gathers.  The earlier 2-word
    # slice-gather form (lax.gather slice_sizes=(2,)) halved the gather
    # count on paper, but its lowering materializes the whole 33 MB
    # bitmap as four staged slices per pass (traced 21 ms of the steady
    # refine, %slice-start.12-15, 2026-08-21); two flat gathers at
    # (Ncol, U) indices are latency-bound (~12 ns/index) with no
    # operand staging.  w0i+1 <= W by the clip, in-bounds by the
    # scratch tail.
    w0 = grid.occ_bits[w0i]                                # (Ncol,U)
    w1 = grid.occ_bits[w0i + 1]
    b0 = (shpos & 31).astype(u32)
    winbits = (w0 >> b0) | jnp.where(b0 > 0, w1 << (u32(32) - b0), u32(0))
    dz_off = jnp.arange(-kk, kk + 1, dtype=i32)[:, None, None]    # (win,1,1)
    bitpos = colbase[None, :, :] + dz_off - shpos[None, :, :]     # (win,Ncol,U)
    nbit = (((winbits[None, :, :]
              >> jnp.clip(bitpos, 0, 31).astype(u32)) & 1) != 0) \
        & (bitpos >= 0)
    nz = coords[2][None, None, :] + dz_off
    nvalid = ((nx >= 0) & (nx < dxd) & (ny >= 0) & (ny < dyd))[None, :, :] \
        & (nz >= 0) & (nz < dzd) & cand_ok[None, None, :]
    # reorder (dz, (dx,dy), U) -> (dx,dy,dz)-flat to match _neighbor_offsets
    nocc = jnp.transpose(nbit & nvalid, (1, 0, 2)).reshape(-1, coords.shape[1])
    M = Ncol * win
    total = jnp.sum(nocc.astype(i32), axis=0)                     # (U,)
    gated = cand_ok & (total >= config.min_neighbors)             # "total>20"
    offsets = jnp.asarray(_neighbor_offsets(config), i32)         # (3,M)

    # --- PCA normal over occupied neighbor centers -----------------------
    # Offset space (meters, relative to the candidate's center): shared
    # (9,M) moment basis -> one (9,M)x(M,U) MXU matmul accumulates all
    # first and second moments.
    res = jnp.asarray(config.resolution, f32)
    off_m = offsets.astype(f32) * res[:, None]                    # (3,M)
    ox, oy, oz = off_m[0], off_m[1], off_m[2]
    basis = jnp.stack([ox, oy, oz,
                       ox * ox, ox * oy, ox * oz,
                       oy * oy, oy * oz, oz * oz], axis=0)        # (9,M)
    moments = jnp.dot(basis, nocc.astype(f32),
                      preferred_element_type=f32)                 # (9,U)
    tot_f = jnp.maximum(total.astype(f32), 1.0)
    mx, my, mz = (moments[0] / tot_f, moments[1] / tot_f,
                  moments[2] / tot_f)
    a00 = moments[3] / tot_f - mx * mx
    a01 = moments[4] / tot_f - mx * my
    a02 = moments[5] / tot_f - mx * mz
    a11 = moments[6] / tot_f - my * my
    a12 = moments[7] / tot_f - my * mz
    a22 = moments[8] / tot_f - mz * mz
    _, nvec = smallest_eigenpair_sym(a00, a01, a02, a11, a12, a22)  # (3,U)

    # Orient toward the stored viewpoint (OccupancyGrid.hpp:393-396).
    # Three flat gathers, NOT rows(): the row form's reshape lays out the
    # whole 75 MB viewpoint table every pass (~10 ms traced) — at U
    # candidate lanes three flat gathers cost ~1 ms.
    vp = jnp.stack([grid.viewpoint[cslot * 3 + r] for r in range(3)])
    flip = jnp.sum((vp - center) * nvec, axis=0) < 0.0
    nvec = jnp.where(flip[None, :], -nvec, nvec)

    # cand_slot is unique (with a -1 suffix) -> directly scatterable
    normal = scatter_set(grid.normal, cand_slot, gated,
                         [nvec[0], nvec[1], nvec[2]], C)
    normal_found = scatter_set(grid.normal_found, cand_slot, gated,
                               [jnp.ones((U,), jnp.bool_)], C)

    # --- line voxels / ghost creation (OccupancyGrid.hpp:403-450) --------
    steps = jnp.arange(-K, K + 1, dtype=f32)
    # NB: the reference steps by xres_ only (its own TODO at GRID.hpp:391).
    line_pts = (center[:, None, :]
                + steps[None, :, None] * res[0] * nvec[:, None, :])  # (3,L,U)
    lp_valid = geometry.valid_points(line_pts, config) & gated[None, :]
    lcoords = geometry.cell_coords(line_pts, config)
    if offset is not None:
        lcoords = lcoords - offset[:, None, None]
    lp_valid = lp_valid & geometry.valid_coords(lcoords, config)  # (L,U)
    lids = geometry.cell_id(lcoords, config)
    # find-or-insert the line cells; fresh slots get only their key ->
    # ghost semantics (occupied stays False) match the reference's ghost
    # VoxelInfo (occupied=false, data set).
    #
    # DEDUPLICATED first: nearby candidates' line windows overlap heavily
    # (the same ghost cell is targeted by tens of owners in one pass), and
    # duplicate ids probe the insert claims-bitmap in lockstep, each
    # claiming the NEXT slot in its chain — the bench's first refine
    # measured a 35-round insert while_loop (3.3 s of the 4.7 s pass) from
    # exactly this.  Inserting one id per distinct cell keeps probe chains
    # at the table's natural load factor (~3 rounds); slots broadcast back
    # through the standard sort -> run-start scatter -> segment-fill ->
    # unsort-scatter discipline (all streaming ops).
    L2f = L * U
    flat_lid = jnp.where(lp_valid.reshape(-1), lids.reshape(-1), _BIG)
    sid_l, slane = jax.lax.sort(
        (flat_lid, jnp.arange(L2f, dtype=i32)), num_keys=1, is_stable=True)
    lvalid_s = sid_l != _BIG
    lustarts = segment_starts(sid_l, lvalid_s)
    luorder = jnp.argsort(~lustarts, stable=True)
    key_table, luslot, lu_failed = hashing.lookup_or_insert(
        grid.key, sid_l[luorder], lustarts[luorder],
        config.max_probes, C, unique_ids=True)
    lslot_s = segment_fill(
        jnp.zeros((L2f,), i32).at[luorder].set(
            jnp.where(lustarts[luorder], luslot, -1),
            unique_indices=True),
        lustarts)
    lslot = jnp.zeros((L2f,), i32).at[slane].set(
        jnp.where(lvalid_s, lslot_s, -1),
        unique_indices=True).reshape(L, U)
    pair_ok = lp_valid & (lslot >= 0)
    # A diagonal normal can revisit a cell on consecutive steps; the
    # reference registers each visit, so duplicates are kept for parity.

    # --- dependant append: sort pairs by line slot, rank within runs -----
    # (owner slot AND owner candidate index ride as payloads; the index
    # addresses the freshly computed center/nvec arrays during replay)
    flatL = jnp.where(pair_ok, lslot, _BIG).reshape(-1)           # (L*U,)
    flatO = jnp.broadcast_to(cand_slot[None, :], (L, U)).reshape(-1)
    flatU = jnp.broadcast_to(jnp.arange(U, dtype=i32)[None, :],
                             (L, U)).reshape(-1)
    sL, sO, sU = jax.lax.sort((flatL, flatO, flatU), num_keys=1,
                              is_stable=True)
    s_ok = sL != _BIG
    idx = jnp.arange(sL.shape[0], dtype=i32)
    pstarts = segment_starts(sL, s_ok)
    # running max == segment-fill of the start index (same scan ladder;
    # lax.associative_scan compiles pathologically on the axon service)
    seg_start_idx = segment_fill(jnp.where(pstarts, idx, 0), pstarts)
    rank = idx - seg_start_idx
    sL_safe = jnp.clip(sL, 0, C - 1)
    pos = grid.dep_count[sL_safe] + rank
    write_ok = s_ok & (pos < D)
    overflow_dep = grid.overflow_dep + jnp.sum(
        (s_ok & ~write_ok).astype(i32))
    # dep element index = slot*D + pos: unique (one pos per link within a
    # slot's run) -> scatter directly from the sorted pair lanes.
    dep_idx = jnp.where(write_ok, sL_safe * D + jnp.clip(pos, 0, D - 1),
                        D * C + jnp.arange(sL.shape[0], dtype=i32))
    dep = grid.dep.at[dep_idx].set(sO, indices_are_sorted=False,
                                   unique_indices=True)
    # per-line-slot added-link counts at segment ends (unique owners)
    pends = segment_ends(sL, s_ok)
    padded = segment_sums(write_ok.astype(f32), pstarts)
    dep_count = scatter_add(grid.dep_count, sL, pends,
                            [jnp.round(padded).astype(i32)], C)

    # --- retroactive buffer replay (OccupancyGrid.hpp:418-440) -----------
    # Link-driven: every dependant link CREATED THIS PASS (line slot s ->
    # owner candidate u) replays s's buffered points through u's cylinder.
    # The buffer is sorted by slot once; each link looks up its slot's
    # contiguous point run; links are sorted by OWNER and expanded into a
    # static pair-point lane space where owner data arrives by segment
    # fill — no per-lane random gathers (gathers measured ~21 ns/elem).
    RB = min(replay_runs if replay_runs is not None
             else config.max_replay_active,
             config.max_replay_active, BL)   # buffered-slot runs/pass
    # (<= max_replay_active keeps every RB-lane scatter batch inside the
    # shared scatter tail, config.scatter_tail)
    # pair-point replay lanes; ``replay_lanes`` overrides per CALL so a
    # session can run its first refine (which replays the whole pre-normal
    # history) with the full budget and steady-state passes — whose
    # replays are near-empty after buffer reclamation — with a 16x
    # smaller one.  Overflow stays counted either way.
    R2 = (replay_lanes if replay_lanes is not None
          else config.max_replay_hits)
    L2 = sL.shape[0]

    # live buffer lanes are always the [0, buf_count) prefix (integrate
    # block-appends; reclamation re-packs), so the BL-lane slice covers
    # everything whenever buf_count <= BL; ``fits`` gates the whole
    # replay+reclaim block otherwise (counted, never silent).
    fits = grid.buf_count <= BL
    bsl = grid.buf_slot[:BL]
    bkey = jnp.where(fits & (bsl >= 0), bsl, _BIG)
    bslot_s, bx, by, bz = jax.lax.sort(
        (bkey, grid.buf_pts[0, :BL], grid.buf_pts[1, :BL],
         grid.buf_pts[2, :BL]),
        num_keys=1, is_stable=True)
    bvalid = bslot_s != _BIG
    bstarts = segment_starts(bslot_s, bvalid)
    n_bruns = jnp.sum(bstarts.astype(i32))
    run_order = jnp.argsort(~bstarts, stable=True)[:RB]   # start positions
    # end positions derive from the starts (ops/scatter.end_positions);
    # when runs overflow RB the last in-budget run's end is undefined —
    # drop it too (it already lands in the dropped-run overflow path)
    rend_order = end_positions(run_order.astype(i32), n_bruns,
                               jnp.sum(bvalid.astype(i32)))
    rb_lim = jnp.where(n_bruns > RB, RB - 1, n_bruns)
    run_slot = bslot_s[run_order]
    run_ok = bstarts[run_order] & (jnp.arange(RB, dtype=i32) < rb_lim)
    run_cnt = jnp.where(run_ok, rend_order - run_order + 1, 0)
    zc = jnp.zeros((C + config.scatter_tail,), i32)
    bufstart_arr = scatter_set(zc, run_slot, run_ok, [run_order], C)
    bufcnt_arr = scatter_set(zc, run_slot, run_ok, [run_cnt], C)
    # runs beyond the RB budget are DROPPED for this pass's links; count
    # only drops a created link actually references (advisor, round 1) —
    # rank>=RB flags each dropped run's start lane, scattered per slot and
    # gathered at link-run starts below.
    brank = jnp.cumsum(bstarts.astype(i32)) - 1
    drop_start = bstarts & (brank >= rb_lim)
    # compact dropped-run start lanes to an RB-lane prefix so the scatter
    # batch fits the shared scatter tail (BL can exceed it at bench scale);
    # dropped runs past the compaction window — reachable only when more
    # than 2*RB distinct runs are buffered — are counted unconditionally
    # below (conservative overcount, never silent).
    drop_order = jnp.argsort(~drop_start, stable=True)[:RB]
    bufdrop_arr = scatter_set(
        jnp.zeros((C + config.scatter_tail,), jnp.bool_),
        bslot_s[drop_order], drop_start[drop_order],
        [jnp.ones((RB,), jnp.bool_)], C)
    n_drop_runs = jnp.sum(drop_start.astype(i32))
    overflow_replay = (jnp.where(
        fits, 0, jnp.maximum(grid.buf_count - BL, 0))
        + jnp.maximum(n_drop_runs - RB, 0))

    # per-link buffer ranges (sL ascending -> streaming access)
    ls = jnp.clip(sL, 0, C - 1)
    l_start0 = bufstart_arr[ls]
    l_cnt0 = jnp.where(write_ok, bufcnt_arr[ls], 0)
    # dropped runs referenced by an actually-created link (write_ok is a
    # per-run prefix — rank 0 writes iff the slot had dep room — so the
    # run-start lane witnesses "any link created for this slot")
    overflow_replay = overflow_replay + jnp.sum(
        (pstarts & write_ok & bufdrop_arr[ls]).astype(i32))
    # row-gather staging (ops/scatter.rows): pack the per-candidate owner
    # data and the sorted buffer points into k-wide rows ONCE so the
    # budget-lane gathers below cost one index latency per lane, not one
    # per channel (3 flat point gathers at R2 lanes measured 460 ms at
    # 2^23 — PERF.md §4)
    cn6 = jnp.concatenate([center, nvec], axis=0).T        # (U,6)
    bpt3 = jnp.stack([bx, by, bz], axis=1)                 # (BL,3)
    lkey = jnp.where(write_ok & (l_cnt0 > 0), sO, _BIG)
    lk, l_start, l_cnt, l_u = jax.lax.sort(
        (lkey, l_start0, l_cnt0, sU), num_keys=1, is_stable=True)
    lvalid = lk != _BIG
    l_cnt = jnp.where(lvalid, l_cnt, 0)
    lpos = jnp.cumsum(l_cnt)
    lofs = lpos - l_cnt
    t_rep = lpos[-1]
    l_first = segment_starts(lk, lvalid)

    def _replay_block(R2b):
        """Replay expansion at static pair-point width ``R2b`` — every
        lane space below (link-record scatters, fills, point gathers,
        cylinder sums, end compaction) scales with it."""
        # expand links into pair-point lanes: scatter link records at
        # each link's first lane (offsets are unique among links with
        # l_cnt > 0), then segment-fill them across the link's run
        lok = lvalid & (lofs < R2b)
        zr = jnp.zeros((R2b + L2,), i32)
        markb = scatter_set(jnp.zeros((R2b + L2,), jnp.bool_), lofs, lok,
                            [jnp.ones((L2,), jnp.bool_)], R2b)[:R2b]
        ch_start = scatter_set(zr, lofs, lok, [l_start], R2b)[:R2b]
        ch_ofs = scatter_set(zr, lofs, lok, [lofs], R2b)[:R2b]
        ch_own = scatter_set(zr, lofs, lok, [lk], R2b)[:R2b]
        fills = segment_fill(jnp.stack([ch_start, ch_ofs, ch_own]),
                             markb)                               # (3,R2b)
        lane = jnp.arange(R2b, dtype=i32)
        rvalid = lane < jnp.minimum(t_rep, R2b)
        pidx = jnp.clip(fills[0] + (lane - fills[1]), 0, BL - 1)
        rowner = jnp.where(rvalid, fills[2], _BIG)

        # owner center/normal: gathered once per OWNER (first link of
        # each owner run — every valid link has points, so its first lane
        # IS the owner's first replay lane), scattered there and
        # segment-filled.  A per-lane ``center[:, u]`` gather costs
        # ~30 ns/elem at R2 lanes (1.2 s/pass measured); this is ~30 ms.
        OB = min(U, L2)
        forder = jnp.argsort(~l_first, stable=True)[:OB]
        fl_u = jnp.clip(l_u[forder], 0, U - 1)
        fl_ok = l_first[forder] & (lofs[forder] < R2b)
        fl_ofs = lofs[forder]
        marko = scatter_set(jnp.zeros((R2b + OB,), jnp.bool_), fl_ofs,
                            fl_ok, [jnp.ones((OB,), jnp.bool_)],
                            R2b)[:R2b]
        zf = jnp.zeros((R2b + OB,), f32)
        oc_rows = cn6[fl_u]                                # (OB,6) row gather
        ofill = segment_fill(jnp.stack(
            [scatter_set(zf, fl_ofs, fl_ok, [oc_rows[:, r]], R2b)[:R2b]
             for r in range(6)]),
            marko)                                                # (6,R2b)

        r_pt = bpt3[pidx].T                                # (3,R2b) row gather
        r_center = ofill[0:3]
        r_normal = ofill[3:6]
        rq = r_pt - r_center
        rt = jnp.sum(rq * r_normal, axis=0)                # scalar proj t
        rr = rq - rt[None, :] * r_normal
        rdist = jnp.sqrt(jnp.sum(rr * rr, axis=0))
        rhit = rvalid & (rdist < config.cylinder_radius)
        # scalar sum form, matching integrate (grid.py cyl_stats)
        vals5 = jnp.where(rhit[None, :], jnp.stack(
            [rt, rt * rt, rdist, rdist * rdist,
             jnp.ones((R2b,), f32)], axis=0), 0.0)
        rstarts = segment_starts(rowner, rvalid)
        rends = segment_ends(rowner, rvalid)
        rsum5 = segment_sums(vals5, rstarts)
        # Replay owners are always THIS pass's gated candidates, so the
        # end-compaction bound is max_refine_candidates — NOT
        # max_hit_voxels (which bounds per-frame stream owners).  With the
        # smaller bound the highest-slot owner runs were silently dropped
        # whenever a pass replayed more owners than the bound (2,812
        # voxels lost their entire replay at the 1 mm bench config's
        # first refine).
        UH = min(U, R2b)
        n_rends = jnp.sum(rends.astype(i32))
        eorder2 = jnp.argsort(~rends, stable=True)[:UH]
        eo_slot = rowner[eorder2]
        emask2 = rends[eorder2]
        esum5 = rsum5[:, eorder2]
        ovf = (jnp.maximum(t_rep - R2b, 0)
               + jnp.maximum(n_rends - UH, 0))
        # compact returns — the scatter happens ONCE outside the rung
        # switch: a branch returning the scattered cyl_stats copied the
        # 126 MB array through the cond boundary every pass (traced
        # 7.8 ms, %cond.10, 2026-08-21).  Pad to the rung-independent
        # min(U, R2) so every rung's output shapes match.
        UHp = min(U, R2)
        pad = UHp - UH
        if pad:
            eo_slot = jnp.pad(eo_slot, (0, pad))
            emask2 = jnp.pad(emask2, (0, pad))
            esum5 = jnp.pad(esum5, ((0, 0), (0, pad)))
        return eo_slot, emask2, esum5, ovf

    # ``replay_tiers`` (static, ascending) switches the replay expansion
    # on the LIVE pair-point total t_rep — known only mid-pass, so the
    # outer (cand, buf) tier choice cannot size it.  Exact: a tier is
    # selected only when t_rep fits it, so tiering never adds overflow;
    # lane order inside runs is unchanged, so sums stay bit-identical.
    # Steady-state replays are near-empty while the budget R2 machinery
    # (3 random point gathers + fills + sums at R2 lanes) dominated the
    # pass (PERF.md §5) — mid-sweep refines with modest replays ran the
    # full 2^22-lane expansion for ~2^20 live points.
    eff = tuple(t for t in (replay_tiers or ()) if t < R2) + (R2,)
    if len(eff) > 1:
        ixr = jnp.minimum(
            jnp.searchsorted(jnp.asarray(eff[:-1], i32), t_rep,
                             side="left").astype(i32), len(eff) - 1)
        eo_slot, emask2, esum5, ovf_rep = jax.lax.switch(
            ixr, [partial(_replay_block, t) for t in eff])
    else:
        eo_slot, emask2, esum5, ovf_rep = _replay_block(R2)
    cyl_stats = scatter_add(grid.cyl_stats, eo_slot, emask2,
                            [esum5[r] for r in range(5)], C)
    overflow_replay = overflow_replay + ovf_rep

    # --- buffer reclamation (post-replay) ---------------------------------
    # Lanes whose voxel now has a normal are frozen (integrate stops
    # appending once normal_found, OccupancyGrid.hpp:210-211); dropping
    # them bounds the buffer.  Divergence from the reference's unbounded
    # buffers is ONLY the late-registration replay of frozen lanes (see
    # FusionConfig.reclaim_buffer) — both oracles honor the same flag.
    # Reuses the slot-sorted buffer (payloads already carried by the sort).
    # All paths operate on the [:BL] slice; the untouched [BL:] tail is
    # re-attached, and ``fits``=False keeps the original buffer verbatim
    # (replay contributed nothing in that case — bkey was all-invalid).
    reclaimed = grid.reclaimed
    tail_pts = grid.buf_pts[:, BL:]
    tail_slot = grid.buf_slot[BL:]
    if config.reclaim_buffer:
        bkeep = bvalid & ~normal_found[jnp.clip(bslot_s, 0, C - 1)]
        _, kx, ky, kz, kslot = jax.lax.sort(
            (~bkeep, bx, by, bz, jnp.where(bkeep, bslot_s, -1)),
            num_keys=1, is_stable=True)
        new_pts = jnp.stack([kx, ky, kz], axis=0)
        n_keep = jnp.sum(bkeep.astype(i32))
        new_slot = jnp.where(jnp.arange(BL, dtype=i32) < n_keep, kslot, -1)
        buf_pts = jnp.where(fits,
                            jnp.concatenate([new_pts, tail_pts], axis=1),
                            grid.buf_pts)
        buf_slot = jnp.where(fits,
                             jnp.concatenate([new_slot, tail_slot]),
                             grid.buf_slot)
        reclaimed = reclaimed + jnp.where(fits, grid.buf_count - n_keep, 0)
        buf_count = jnp.where(fits, n_keep, grid.buf_count)
    else:
        # keep the slot-sorted layout (semantically equivalent: lane order
        # within a slot is append order, preserved by the stable sort)
        new_pts = jnp.stack([bx, by, bz], axis=0)
        new_slot = jnp.where(bvalid, bslot_s, -1)
        buf_pts = jnp.where(fits,
                            jnp.concatenate([new_pts, tail_pts], axis=1),
                            grid.buf_pts)
        buf_slot = jnp.where(fits,
                             jnp.concatenate([new_slot, tail_slot]),
                             grid.buf_slot)
        buf_count = grid.buf_count

    return grid._replace(
        key=key_table,
        normal=normal,
        normal_found=normal_found,
        dep=dep,
        dep_count=dep_count,
        cyl_stats=cyl_stats,
        buf_pts=buf_pts,
        buf_slot=buf_slot,
        buf_count=buf_count,
        reclaimed=reclaimed,
        overflow_dep=overflow_dep,
        overflow_probe=grid.overflow_probe + lu_failed,
        overflow_refine=overflow_refine,
        overflow_replay=grid.overflow_replay + overflow_replay,
    )


refine_pass = partial(jax.jit,
                      static_argnames=("config", "replay_lanes",
                                       "cand_lanes", "buf_lanes",
                                       "replay_runs", "tiers",
                                       "replay_tiers"),
                      donate_argnames=("grid",))(refine_pass_impl)
