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

1. round candidates ``cand = (h(id)+j) & (C-1)``; lanes whose slot already
   holds their id resolve;
2. lanes seeing an empty slot stable-sort by candidate; the first lane of
   each candidate run wins (deterministic: input order breaks ties);
3. winners (unique candidates by construction) are written with ONE
   unique-index scatter;
4. all contending lanes re-read the slot — winners see their own id.

With per-frame-deduplicated inputs at load factor <= 0.5 this converges in
~1-3 rounds; the loop exits early when every lane is resolved.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .scatter import scatter_set

_BIG = jnp.iinfo(jnp.int32).max


def hash_u32(x: jax.Array) -> jax.Array:
    """murmur3 fmix32 finalizer — good avalanche for dense cell ids."""
    h = x.astype(jnp.uint32)
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return h


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
        cand = ((h0 + j.astype(jnp.uint32)) & mask).astype(jnp.int32)
        tk = key_table[cand]
        found = unresolved & (tk == ids)
        empty = unresolved & (tk == -1)          # key certainly absent
        slot = jnp.where(found, cand, slot)
        unresolved = unresolved & ~found & ~empty
        return slot, unresolved, j + 1

    slot, _, _ = jax.lax.while_loop(
        cond, body, (slot0, active, jnp.uint32(0)))
    return slot


def lookup_or_insert(key_table: jax.Array, ids: jax.Array, active: jax.Array,
                     max_probes: int, capacity: int
                     ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Batched find-or-insert via sort elections.

    ``key_table``: (capacity + tail,) with tail >= len(ids).
    Returns ``(new_key_table, slot, n_failed)``; duplicate ids in one batch
    resolve to one slot (losers of the election find the winner's write on
    the next round).
    """
    C = capacity
    assert key_table.shape[0] - C >= ids.shape[0], \
        "key table scatter tail smaller than insert batch"
    mask = jnp.uint32(C - 1)
    h0 = hash_u32(ids)
    slot0 = jnp.full(ids.shape, -1, jnp.int32)

    def cond(state):
        _, _, unresolved, j = state
        return jnp.logical_and(jnp.any(unresolved), j < max_probes)

    def body(state):
        table, slot, unresolved, j = state
        cand = ((h0 + j.astype(jnp.uint32)) & mask).astype(jnp.int32)
        tk = table[cand]
        found = unresolved & (tk == ids)
        empty = unresolved & (tk == -1)
        # ---- sort election over contending lanes ----
        ckey = jnp.where(empty, cand, _BIG)
        order = jnp.argsort(ckey, stable=True)
        scand = ckey[order]
        contend = scand != _BIG
        first = jnp.concatenate(
            [jnp.ones((1,), jnp.bool_), scand[1:] != scand[:-1]])
        winner = contend & first
        # winners have unique candidates — scatter directly, no compaction
        # (the fast path needs unique indices only, ops/scatter.py)
        table = scatter_set(table, scand, winner, [ids[order]], C)
        # ---- all contenders re-read; winners see their id ----
        tk2 = table[cand]
        won = empty & (tk2 == ids)
        newly = found | won
        slot = jnp.where(newly, cand, slot)
        unresolved = unresolved & ~newly
        return table, slot, unresolved, j + 1

    table, slot, unresolved, _ = jax.lax.while_loop(
        cond, body, (key_table, slot0, active, jnp.uint32(0)))
    n_failed = jnp.sum(unresolved.astype(jnp.int32))
    return table, slot, n_failed
