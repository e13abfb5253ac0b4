"""Open-addressing spatial hash primitives (pure XLA, deterministic).

Replaces the reference's dense 3-D ``voxels_`` array plus its 60-bit packed
hash ids (OccupancyGrid.hpp:151-165).  Keys here are *dense cell ids*
``(x*ydim + y)*zdim + z`` in int32 (the same information as the reference's
``x<<40 ^ y<<20 ^ z`` packing, but int32-friendly for TPUs; configs must keep
``n_cells < 2^31`` per shard — FusionConfig.validate enforces this).

Insertion is batched and *deterministic*: when several distinct keys race for
one empty slot, the smallest key wins the claim (a scatter-min election), the
losers re-probe.  Duplicate keys in the same batch all resolve to one slot.
The probe loop is a ``lax.while_loop`` with an early-exit condition so the
typical cost is ~1-2 rounds at load factors <= 0.5.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

_I32_MAX = jnp.iinfo(jnp.int32).max


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
           max_probes: int) -> jax.Array:
    """Find slots holding ``ids``. Returns slot index or -1 (absent/inactive).

    Absence is only certain if the table was built with the same probe bound;
    we probe until an empty slot or ``max_probes``.
    """
    C = key_table.shape[0]
    mask = jnp.uint32(C - 1)
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
                     max_probes: int) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Batched find-or-insert.

    Returns ``(new_key_table, slot, n_failed)`` where ``slot[i]`` is the slot
    now holding ``ids[i]`` (-1 if inactive or the probe bound was exhausted)
    and ``n_failed`` counts active lanes that could not be placed.
    """
    C = key_table.shape[0]
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
        # Deterministic election: smallest key claims each contested slot.
        claim_idx = jnp.where(empty, cand, C)     # out-of-range -> dropped
        claim = jnp.full((C,), _I32_MAX, jnp.int32)
        claim = claim.at[claim_idx].min(ids, mode="drop")
        won = empty & (claim[jnp.clip(cand, 0, C - 1)] == ids)
        table = table.at[jnp.where(won, cand, C)].set(ids, mode="drop")
        newly = found | won
        slot = jnp.where(newly, cand, slot)
        unresolved = unresolved & ~newly
        return table, slot, unresolved, j + 1

    table, slot, unresolved, _ = jax.lax.while_loop(
        cond, body, (key_table, slot0, active, jnp.uint32(0)))
    n_failed = jnp.sum(unresolved.astype(jnp.int32))
    return table, slot, n_failed
