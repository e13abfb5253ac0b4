"""Sorted-unique scatter primitives — the TPU fast path for grid updates.

Measured on TPU v5e (amortized over 50 in-program iterations):

=====================================  ==========
scatter-add, 307k random indices        ~4700 ms
scatter-add, 307k sorted+unique         3.9 ms
scatter-add, 3.7M random                38 ms
argsort, 3.7M int32                     6.4 ms
gather, 3.7M random                     1.7 ms
=====================================  ==========

Random scatter on TPU serializes; the sorted+unique form is three orders of
magnitude faster.  Every grid mutation in this framework therefore goes
through: sort by slot -> segment-reduce duplicates -> ONE scatter whose
indices are ascending and unique (``indices_are_sorted=True,
unique_indices=True``).

To keep indices sorted with *masked lanes present*, scatter-target arrays
carry a scratch tail (grid.py): masked lanes write to ascending fake offsets
past the live region.  This requires the (slots, valid) input to be
**prefix-packed**: valid lanes first, slots ascending and unique within the
prefix.  ``compact_by`` produces that form from any mask with one stable
sort.

Multi-component fields use slot-major flat layout (element ``slot*k + r``)
so a sorted slot run stays sorted after expanding k components.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

_BIG = jnp.iinfo(jnp.int32).max


def compact_by(mask: jax.Array, *arrays: jax.Array
               ) -> Tuple[jax.Array, ...]:
    """Stable-partition lanes with ``mask`` True to the front.

    Returns ``(packed_mask, *packed_arrays)``.  Order within each partition
    is preserved, so sorted inputs stay sorted in the prefix.
    """
    order = jnp.argsort(~mask, stable=True)
    return (mask[order],) + tuple(
        a[..., order] if a.ndim > 1 else a[order] for a in arrays)


def _lane_indices(slots: jax.Array, valid: jax.Array, k: int,
                  capacity: int) -> jax.Array:
    """Prefix-packed sorted slots -> (k*U,) slot-major element indices.

    Valid lanes map to ``slot*k + r``; invalid (suffix) lanes map to
    ascending scratch-tail offsets past ``k*capacity``.  The result is
    globally ascending and unique, satisfying the XLA fast-path contract.
    """
    U = slots.shape[0]
    ar = jnp.arange(k * U, dtype=jnp.int32)
    lane = ar // k
    s = slots[lane]
    base = s * k + (ar - lane * k)
    pad = k * capacity + ar
    return jnp.where(valid[lane], base, pad)


def scatter_add(arr: jax.Array, slots: jax.Array, valid: jax.Array,
                cols: Sequence[jax.Array], capacity: int) -> jax.Array:
    """arr: flat slot-major (k*(C+T),); slots: (U,) prefix-packed sorted
    unique; cols: k arrays of (U,) values.  Requires U <= T."""
    k = len(cols)
    U = slots.shape[0]
    assert k * U <= arr.shape[0] - k * capacity, \
        f"scatter tail too small: need {U} slots"
    idx = _lane_indices(slots, valid, k, capacity)
    vals = cols[0] if k == 1 else jnp.stack(cols, axis=-1).reshape(-1)
    return arr.at[idx].add(vals, indices_are_sorted=True,
                           unique_indices=True)


def scatter_set(arr: jax.Array, slots: jax.Array, valid: jax.Array,
                cols: Sequence[jax.Array], capacity: int) -> jax.Array:
    k = len(cols)
    U = slots.shape[0]
    assert k * U <= arr.shape[0] - k * capacity, \
        f"scatter tail too small: need {U} slots"
    idx = _lane_indices(slots, valid, k, capacity)
    vals = cols[0] if k == 1 else jnp.stack(cols, axis=-1).reshape(-1)
    return arr.at[idx].set(vals, indices_are_sorted=True,
                           unique_indices=True)


def segment_ends(sorted_keys: jax.Array, valid: jax.Array) -> jax.Array:
    """(U,) bool: lane is the last of its run of equal (valid) keys."""
    nxt = jnp.concatenate([sorted_keys[1:], jnp.full((1,), _BIG,
                                                     sorted_keys.dtype)])
    return valid & (sorted_keys != nxt)


def segment_starts(sorted_keys: jax.Array, valid: jax.Array) -> jax.Array:
    prev = jnp.concatenate([jnp.full((1,), _BIG, sorted_keys.dtype),
                            sorted_keys[:-1]])
    return valid & (sorted_keys != prev)


def segment_sums(values: jax.Array, starts: jax.Array) -> jax.Array:
    """Segmented running sums along the last axis.

    ``values``: (U,) or (k, U) — masked lanes must carry zeros.
    ``starts``: (U,) bool segment-start flags (first valid lane flagged).
    At each segment's END lane the result equals the full segment sum.
    Precision is segment-local (no global-cumsum cancellation).
    """
    return segment_reduce(values, starts, jnp.add)


def segment_reduce(values: jax.Array, starts: jax.Array, op) -> jax.Array:
    """segment_sums with an arbitrary associative combine ``op`` (e.g.
    jnp.bitwise_or for bitmap accumulation); masked lanes must carry the
    identity element of ``op``."""
    if values.ndim == 2:
        flags = jnp.broadcast_to(starts[None, :], values.shape)
    else:
        flags = starts

    def comb(a, b):
        av, af = a
        bv, bf = b
        return (jnp.where(bf, bv, op(av, bv)), af | bf)

    out, _ = jax.lax.associative_scan(comb, (values, flags), axis=-1)
    return out
