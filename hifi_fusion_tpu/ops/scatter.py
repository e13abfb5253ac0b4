"""Unique-index scatter primitives — the TPU fast path for grid updates.

Measured on TPU v5e:

=============================================  ==========
scatter-add, 307k duplicate-laden indices       ~4700 ms
scatter-add, 1M sorted+unique -> 4M slots       10.3 ms
scatter-add, 1M unique, random order            11.1 ms
scatter-add, 1M unique, masked tail jumps       11.0 ms
argsort, 3.7M int32                             6.4 ms
gather, 3.7M random                             1.7 ms
=============================================  ==========

What makes TPU scatter serialize is DUPLICATE indices, not order:
``unique_indices=True`` alone unlocks the fast path (sortedness adds only
~8%).  Every grid mutation therefore goes through: group duplicate
contributions (sort + segment-reduce where needed) -> ONE scatter with
unique per-lane indices, in whatever lane order the producer already has.

Masked lanes write to per-lane fake offsets past the live region (the
scratch tail every scatter-target array carries, grid.py), keeping indices
unique without compaction.  ``compact_by`` remains for callers that need a
*gather*-side packing (bounding a lane budget), not for scatters.

Multi-component fields use slot-major flat layout (element ``slot*k + r``).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

_BIG = jnp.iinfo(jnp.int32).max


def rows(flat: jax.Array, k: int, idx: jax.Array) -> jax.Array:
    """Gather k-wide slot rows from a flat slot-major array -> (n, k).

    TPU gathers are latency-bound PER INDEX, not per element: one row
    gather (k contiguous elements per index) costs ~one flat-gather
    latency (~12 ns), measured 7.7x cheaper than k flat gathers at k=6
    on v5e (2026-08-18 microbench; revises the earlier (131k,12)-row
    measurement taken without a device fetch barrier).  Use for every
    hot multi-channel slot read.

    The ``reshape(-1, k)`` triggers a layout copy of the table (tiled
    2-D vs flat 1-D) costing ~3% of the table size in time — measured
    STILL far cheaper than the alternatives: ``lax.gather`` with
    ``slice_sizes=(k,)`` on the flat array lowers to a scalar-slice
    path that DOUBLED integrate (49.7 -> 103.6 ms/frame, A/B
    2026-08-18); k flat gathers pay k index latencies."""
    return flat.reshape(-1, k)[idx]


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
    """Per-lane slots -> (k*U,) slot-major element indices.

    Valid lanes map to ``slot*k + r``; invalid lanes map to per-lane
    scratch-tail offsets past ``k*capacity``.  Unique as long as the valid
    slots are unique — no ordering or packing requirement.
    """
    U = slots.shape[0]
    # 2-D construction: no integer division/modulo (div-by-non-pow2 over
    # k*U lanes measured ~23 ns/elem on TPU v5e — it dominated the scatter)
    r = jnp.arange(k, dtype=jnp.int32)[None, :]           # (1,k)
    lane = jnp.arange(U, dtype=jnp.int32)[:, None]        # (U,1)
    base = slots[:, None] * k + r                         # (U,k)
    pad = k * capacity + lane * k + r
    return jnp.where(valid[:, None], base, pad).reshape(-1)


def scatter_add(arr: jax.Array, slots: jax.Array, valid: jax.Array,
                cols: Sequence[jax.Array], capacity: int,
                sorted_lanes: bool = False) -> jax.Array:
    """arr: flat slot-major (k*(C+T),); slots: (U,) unique among valid
    lanes (any order); cols: k arrays of (U,) values.  Requires U <= T.
    ``sorted_lanes=True`` when valid slots ascend with invalid lanes only
    in a suffix (minor fast-path bonus)."""
    k = len(cols)
    U = slots.shape[0]
    assert k * U <= arr.shape[0] - k * capacity, \
        f"scatter tail too small: need {U} slots"
    idx = _lane_indices(slots, valid, k, capacity)
    vals = cols[0] if k == 1 else jnp.stack(cols, axis=-1).reshape(-1)
    return arr.at[idx].add(vals, indices_are_sorted=sorted_lanes,
                           unique_indices=True)


def scatter_set(arr: jax.Array, slots: jax.Array, valid: jax.Array,
                cols: Sequence[jax.Array], capacity: int,
                sorted_lanes: bool = False) -> jax.Array:
    k = len(cols)
    U = slots.shape[0]
    assert k * U <= arr.shape[0] - k * capacity, \
        f"scatter tail too small: need {U} slots"
    idx = _lane_indices(slots, valid, k, capacity)
    vals = cols[0] if k == 1 else jnp.stack(cols, axis=-1).reshape(-1)
    return arr.at[idx].set(vals, indices_are_sorted=sorted_lanes,
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


def end_positions(start_pos: jax.Array, n_seg: jax.Array,
                  n_valid: jax.Array) -> jax.Array:
    """Segment-END lane positions derived from the ascending START
    positions — segment i ends where segment i+1 starts, minus one; the
    last segment ends at the last valid lane.  Replaces a second
    full-width ``argsort(~ends)`` partition (measured 13 ms at 8.4M pair
    lanes) with O(U) arithmetic.  Lanes >= n_seg return in-bounds garbage
    (callers mask them, exactly as with the argsort form).
    """
    lane = jnp.arange(start_pos.shape[0], dtype=jnp.int32)
    nxt = jnp.concatenate([start_pos[1:], start_pos[-1:]])
    last = jnp.maximum(n_valid - 1, 0)
    return jnp.clip(jnp.where(lane < n_seg - 1, nxt - 1, last), 0, None)


def segment_sums(values: jax.Array, starts: jax.Array) -> jax.Array:
    """Segmented running sums along the last axis.

    ``values``: (U,) or (k, U) — masked lanes must carry zeros.
    ``starts``: (U,) bool segment-start flags (first valid lane flagged).
    At each segment's END lane the result equals the full segment sum.
    Precision is segment-local (no global-cumsum cancellation).
    """
    return segment_reduce(values, starts, jnp.add, kind="add")


def segment_fill(values: jax.Array, starts: jax.Array) -> jax.Array:
    """Broadcast each segment's START-lane value across its whole run.

    ``values``: (U,) or (k, U) with the wanted value present at lanes where
    ``starts`` is True (other lanes may hold anything).  The TPU-measured
    alternative — a per-lane random gather of the segment's data — costs
    ~21 ns/element; this scan streams at ~1 ns/element.
    """
    return segment_reduce(values, starts, lambda a, b: a, kind="first")


def segment_reduce(values: jax.Array, starts: jax.Array, op,
                   kind: str = None) -> jax.Array:
    """segment_sums with an arbitrary associative combine ``op`` (e.g.
    jnp.bitwise_or for bitmap accumulation); masked lanes must carry the
    identity element of ``op``.

    The flag channel stays (U,) and broadcasts inside the combiner — a
    k-channel scan then carries k+1 arrays, not 2k (broadcasting flags to
    ``values.shape`` doubled the scan's HLO and peak memory; the bench
    integrate program has scans with up to 13 value channels)."""
    # Hand-rolled TWO-LEVEL blocked segmented scan.  ``lax.associative_scan``
    # lowers to a deeply structured graph that the axon TPU service takes
    # ~28 MINUTES to compile per multi-channel instance (measured
    # 2026-08-17; several per kernel OOM-killed the compile helper
    # outright).  A flat Hillis-Steele ladder compiles in seconds but
    # streams the full array log2(n) (~22) times; blocking at 512 lanes
    # runs 9 full-width passes + a negligible inter-block ladder + one
    # combine pass (~2.2x less traffic).  Ladder step semantics:
    #   v[i] = f[i] ? v[i] : op(v[i-s], v[i]);  f[i] |= f[i-s]
    # — flags freeze each segment at its start lane.
    one_d = values.ndim == 1
    v = values[None, :] if one_d else values
    k, n = v.shape
    BS = 512

    def shift(x, s):
        pad = jnp.zeros_like(x[..., :s])
        return jnp.concatenate([pad, x[..., :-s]], axis=-1)

    def ladder(vv, ff, width):
        s = 1
        while s < width:
            vs = shift(vv, s)
            fs = shift(ff, s)
            vv = jnp.where(ff[None] if vv.ndim > ff.ndim else ff,
                           vv, op(vs, vv))
            ff = ff | fs
            s *= 2
        return vv, ff

    if n <= 2 * BS:
        out, _ = ladder(v, starts, n)
        return out[0] if one_d else out

    nb = -(-n // BS)
    npad = nb * BS - n
    f = starts
    if npad:
        v = jnp.concatenate([v, jnp.zeros((k, npad), v.dtype)], axis=-1)
        f = jnp.concatenate([f, jnp.zeros((npad,), f.dtype)], axis=-1)
    # NB a Pallas single-pass VMEM-resident kernel for this in-block ladder
    # was built, validated bit-identical and 2.25x faster STANDALONE
    # (37 -> 16 ms at 16ch x 8.4M) — and deleted: in the full integrate
    # program it measured NEUTRAL at K=4 (75 vs 74 ms/frame) and a 2.2x
    # END-TO-END LOSS at K=8 (bench steady loop 14.6 s vs 6.5 s,
    # 2026-08-19), plus a multi-minute first-touch executable load per
    # process on the axon service.  XLA overlaps the ladder's HBM traffic
    # with surrounding work; the custom call serializes it.  See README
    # "Why no Pallas kernels".
    vb = v.reshape(k, nb, BS)
    fb = f.reshape(nb, BS)
    vv, ff = ladder(vb, fb, BS)            # intra-block inclusive scan
    sv = vv[:, :, -1]                      # (k,nb) block summaries
    sf = ff[:, -1]                         # (nb,)
    pv, _ = ladder(sv, sf, nb)             # inter-block inclusive scan
    ev = shift(pv, 1)                      # exclusive block prefixes
    out = jnp.where(ff[None], vv, op(ev[:, :, None], vv))
    out = out.reshape(k, nb * BS)[:, :n]
    return out[0] if one_d else out
