"""Open-addressing spatial hash primitives (pure XLA, deterministic).

Replaces the reference's dense 3-D ``voxels_`` array plus its 60-bit packed
hash ids (OccupancyGrid.hpp:151-165).  Keys here are *dense cell ids*
``(x*ydim + y)*zdim + z`` in int32 (the same information as the reference's
``x<<40 ^ y<<20 ^ z`` packing, but int32-friendly for TPUs; configs must keep
``n_cells < 2^31`` per shard — FusionConfig.validate enforces this).

The key table is sized ``capacity + scatter_tail``: probing happens in the
first ``capacity`` slots; the tail absorbs masked-lane writes from the
sorted-unique scatter discipline (see ops/scatter.py — random scatter on TPU
is ~1000x slower than sorted scatter, so insertion is implemented with a
per-round *sort election* instead of a scatter-min claim):

1. round candidates ``cand = (h(id) + j(j+1)/2) & (C-1)`` (quadratic
   probing); lanes whose slot already holds their id resolve;
2. lanes seeing an empty slot stable-sort by candidate; the first lane of
   each candidate run wins (deterministic: input order breaks ties);
3. winners (unique candidates by construction) are written with ONE
   unique-index scatter;
4. all contending lanes re-read the slot — winners see their own id.

With per-frame-deduplicated inputs at load factor <= 0.5 this converges in
~1-3 rounds; the loop exits early when every lane is resolved.

STAGED PROBING: a ``while_loop`` round costs full-lane-space work (carry
copies, gathers, the election argsort) no matter how few lanes remain
unresolved — the bench's early refine passes measured ~10 rounds over a
917k-lane line-cell insert where rounds 4+ served only a handful of
straggler lanes (~0.5 s/pass of while machinery).  Both phases therefore
run a fixed UNROLLED prefix of rounds at full width (no while_loop at
all on the common path), then compact the unresolved stragglers into a
small static lane space and finish the probe loop there.  Bit-identical
to the single-loop form: a resolved lane never contends again, so round
j's election among stragglers sees exactly the same contenders either
way, and the stable compaction preserves the lane-order tie-break.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .scatter import scatter_set

_BIG = jnp.iinfo(jnp.int32).max

_UNROLL = 2                 # full-width probe rounds before compaction
# Straggler budget: election losers after round 0 of an I-lane insert
# burst into a C-slot table are ~I^2/2C (the bench's first refine: ~500k
# line-cell inserts into 2^22 slots -> ~30k losers, ~8.4k still
# unresolved after round 1 — measured via overflow_probe=220 at 2^13).
# 2^15 covers that worst observed burst 4x over; overruns stay counted.
_STRAGGLERS = 1 << 15       # compacted lane budget for the tail rounds


def hash_u32(x: jax.Array) -> jax.Array:
    """murmur3 fmix32 finalizer — good avalanche for dense cell ids."""
    h = x.astype(jnp.uint32)
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return h


def _probe_off(j):
    """Quadratic probe offset j(j+1)/2 (triangular) — visits every slot of
    a power-of-2 table exactly once over C probes (standard property) and
    breaks up the primary clustering of linear probing: the bench's first
    refine measured 10 lock-step probe rounds over ~600k inserts at 14%
    load with +j stepping, every round streaming the full lane space."""
    j = j.astype(jnp.uint32)
    return (j * (j + jnp.uint32(1))) >> 1


def lookup(key_table: jax.Array, ids: jax.Array, active: jax.Array,
           max_probes: int, capacity: int) -> jax.Array:
    """Find slots holding ``ids`` (pure gathers). -1 = absent/inactive."""
    mask = jnp.uint32(capacity - 1)
    h0 = hash_u32(ids)
    slot0 = jnp.full(ids.shape, -1, jnp.int32)

    def cond(state):
        _, unresolved, j = state
        return jnp.logical_and(jnp.any(unresolved), j < max_probes)

    def body(state):
        slot, unresolved, j = state
        cand = ((h0 + _probe_off(j)) & mask).astype(jnp.int32)
        tk = key_table[cand]
        found = unresolved & (tk == ids)
        empty = unresolved & (tk == -1)          # key certainly absent
        slot = jnp.where(found, cand, slot)
        unresolved = unresolved & ~found & ~empty
        return slot, unresolved, j + 1

    slot, _, _ = jax.lax.while_loop(
        cond, body, (slot0, active, jnp.uint32(0)))
    return slot


def _staged_lookup(key_table: jax.Array, ids: jax.Array, active: jax.Array,
                   max_probes: int, capacity: int
                   ) -> Tuple[jax.Array, jax.Array]:
    """Lookup with ``_UNROLL`` fixed full-width rounds + a compacted
    straggler loop.  Returns ``(slot, gaveup)``: ``gaveup`` lanes exceeded
    the straggler budget mid-probe — they are NOT known absent, so callers
    must not insert them (a duplicate-id slot would silently split a
    voxel's statistics); ``lookup_or_insert`` counts them as failures."""
    U = ids.shape[0]
    S = _STRAGGLERS
    i32 = jnp.int32
    if U <= 2 * S or max_probes <= _UNROLL:
        return (lookup(key_table, ids, active, max_probes, capacity),
                jnp.zeros(ids.shape, jnp.bool_))
    mask = jnp.uint32(capacity - 1)
    h0 = hash_u32(ids)
    slot = jnp.full(ids.shape, -1, i32)
    unresolved = active
    for j in range(_UNROLL):
        cand = ((h0 + _probe_off(jnp.uint32(j))) & mask).astype(i32)
        tk = key_table[cand]
        found = unresolved & (tk == ids)
        empty = unresolved & (tk == -1)
        slot = jnp.where(found, cand, slot)
        unresolved = unresolved & ~found & ~empty
    rank = jnp.cumsum(unresolved.astype(i32)) - 1
    gaveup = unresolved & (rank >= S)
    sorder = jnp.argsort(~unresolved, stable=True)[:S]
    s_act = unresolved[sorder]
    s_ids = ids[sorder]
    s_h0 = hash_u32(s_ids)

    def cond(st):
        _, unres, j = st
        return jnp.logical_and(jnp.any(unres), j < max_probes)

    def body(st):
        sl, unres, j = st
        cand = ((s_h0 + _probe_off(j)) & mask).astype(i32)
        tk = key_table[cand]
        found = unres & (tk == s_ids)
        empty = unres & (tk == -1)
        sl = jnp.where(found, cand, sl)
        return sl, unres & ~found & ~empty, j + 1

    s_slot, _, _ = jax.lax.while_loop(
        cond, body, (jnp.full((S,), -1, i32), s_act,
                     jnp.uint32(_UNROLL)))
    slot = slot.at[sorder].set(jnp.where(s_act, s_slot, slot[sorder]),
                               unique_indices=True)
    return slot, gaveup


def lookup_or_insert(key_table: jax.Array, ids: jax.Array, active: jax.Array,
                     max_probes: int, capacity: int,
                     unique_ids: bool = False
                     ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Batched find-or-insert, split into a lookup phase and an insert phase.

    ``key_table``: (capacity + tail,) with tail >= len(ids).
    Returns ``(new_key_table, slot, n_failed)``; duplicate ids in one batch
    resolve to one slot (the final re-lookup redirects every inserted lane
    to the first slot in probe order holding its id — see the NB in the
    loop body).

    The round-1 implementation carried the whole key table through a probe
    ``while_loop`` — XLA copied/sliced the 25 MB table every round (~50 ms
    per integrate at the bench config, PERF.md §4).  Here:

    * **lookup phase** (most ids already exist in steady state): a
      ``while_loop`` whose carry is only (slot, unresolved, j); the table
      is a closure constant read by gathers.  A lane stops at its id or at
      the first empty slot (id certainly absent).
    * **insert phase**: absent ids probe with a per-slot bool *claims
      array* (the only mutable carry — ~4 MB at C=2^22, not the 25 MB
      table).  Per round, lanes seeing an empty-and-unclaimed slot
      stable-sort-elect a winner per candidate (deterministic: input
      order breaks ties); winners mark their claim (ONE unique-index
      scatter — winners hold distinct slots by construction) and resolve;
      losers and blocked lanes continue with the next probe offset.
    * the table is written ONCE at the end: resolved inserts scatter their
      ids to their (unique) claimed slots.
    """
    C = capacity
    assert key_table.shape[0] - C >= ids.shape[0], \
        "key table scatter tail smaller than insert batch"
    U = ids.shape[0]
    mask = jnp.uint32(C - 1)
    h0 = hash_u32(ids)
    i32 = jnp.int32

    # ---- phase 1: lookup (small carry; table closed over) ----------------
    slot1, gaveup = _staged_lookup(key_table, ids, active, max_probes, C)
    need = active & (slot1 < 0) & ~gaveup

    # ---- phase 2: claims-array insert over the absent lanes ---------------
    # Claims are one BOOL per slot (C+U with a masked-lane scratch tail,
    # ~4 MB at C=2^22) rather than a packed u32 bitmap: winners hold
    # unique slots by construction, so marking a claim is ONE unique-index
    # scatter — the bitmap form needed a word-grouping OR-ladder (a
    # segmented scan) plus a read-modify-write every round, which
    # dominated the round cost at refine's 1.8M-lane inserts.
    claims0 = jnp.zeros((C + U,), jnp.bool_)
    slotN0 = jnp.full((U,), -1, i32)

    def _round(slotN, unresolved, claims, j, lane_h0, n_lanes):
        # NB on duplicates: duplicates share h0 and probe in lockstep; the
        # stable election lets exactly one win and the rest claim LATER
        # slots in the probe chain (they see the claim as
        # occupied-by-other).  The final re-lookup below redirects them all
        # to the first slot in probe order; the extra claimed slots stay in
        # the table as duplicate-id entries (wasted capacity, never
        # incorrect — probes treat them as occupied).
        cand = ((lane_h0 + _probe_off(j)) & mask).astype(i32)
        tk = key_table[cand]
        openslot = unresolved & (tk == -1) & ~claims[cand]
        ckey = jnp.where(openslot, cand, _BIG)
        order = jnp.argsort(ckey, stable=True)
        scand = ckey[order]
        contend = scand != _BIG
        first = jnp.concatenate(
            [jnp.ones((1,), jnp.bool_), scand[1:] != scand[:-1]])
        win_s = contend & first
        winner = jnp.zeros((n_lanes,), jnp.bool_).at[order].set(
            win_s, unique_indices=True)
        slotN = jnp.where(winner, cand, slotN)
        unresolved = unresolved & ~winner
        # winners' cands are unique -> one masked unique-index scatter
        # (losers write a per-lane scratch-tail slot past C)
        widx = jnp.where(winner, cand, C + jnp.arange(n_lanes, dtype=i32))
        claims = claims.at[widx].set(True, unique_indices=True)
        return slotN, unresolved, claims

    if U <= 2 * _STRAGGLERS or max_probes <= _UNROLL:
        # small batches: the single while_loop is cheaper than staging
        def cond(state):
            _, unresolved, _, j = state
            return jnp.logical_and(jnp.any(unresolved), j < max_probes)

        def body(state):
            slotN, unresolved, claims, j = state
            slotN, unresolved, claims = _round(slotN, unresolved, claims,
                                               j, h0, U)
            return slotN, unresolved, claims, j + 1

        slotN, unresolvedN, _, _ = jax.lax.while_loop(
            cond, body, (slotN0, need, claims0, jnp.uint32(0)))
        n_failed = jnp.sum(unresolvedN.astype(jnp.int32))
    else:
        # staged: _UNROLL fixed full-width rounds, then the stragglers
        # compact into a small static lane space for the remaining rounds
        slotN, unresolved, claims = slotN0, need, claims0
        for j in range(_UNROLL):
            slotN, unresolved, claims = _round(slotN, unresolved, claims,
                                               jnp.uint32(j), h0, U)
        S = _STRAGGLERS
        rank = jnp.cumsum(unresolved.astype(i32)) - 1
        over = unresolved & (rank >= S)      # beyond the straggler budget
        iorder = jnp.argsort(~unresolved, stable=True)[:S]
        s_un = unresolved[iorder]
        s_h0 = hash_u32(ids[iorder])

        def conds(state):
            _, unres, _, j = state
            return jnp.logical_and(jnp.any(unres), j < max_probes)

        def bodys(state):
            sl, unres, claims, j = state
            sl, unres, claims = _round(sl, unres, claims, j, s_h0, S)
            return sl, unres, claims, j + 1

        s_slot, s_unres, _, _ = jax.lax.while_loop(
            conds, bodys, (jnp.full((S,), -1, i32), s_un & ~over[iorder],
                           claims, jnp.uint32(_UNROLL)))
        slotN = slotN.at[iorder].set(
            jnp.where(s_un, s_slot, slotN[iorder]), unique_indices=True)
        n_failed = (jnp.sum(s_unres.astype(i32))
                    + jnp.sum(over.astype(i32)))
    n_failed = n_failed + jnp.sum(gaveup.astype(i32))

    # ---- one table write for all inserts (claimed slots are unique) ------
    inserted = need & (slotN >= 0)
    table = scatter_set(key_table, slotN, inserted, [ids], C)
    if unique_ids:
        # caller guarantees active ids are distinct (both hot callers
        # dedup first) — every inserted lane's claimed slot IS canonical,
        # so the duplicate-redirect lookup below is a no-op; skip its
        # while_loop (one full-lane probe pass per chain round)
        return table, jnp.where(inserted, slotN, slot1), n_failed
    # redirect duplicates to the canonical (first-in-probe-order) slot
    slotR = lookup(table, ids, inserted, max_probes, C)
    slot = jnp.where(inserted, slotR, slot1)
    return table, slot, n_failed
