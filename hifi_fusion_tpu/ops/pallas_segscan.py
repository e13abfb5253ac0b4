"""Pallas TPU kernel for the INTRA-BLOCK phase of blocked segmented scans.

``ops/scatter.segment_reduce`` runs a two-level blocked segmented scan: a
9-step Hillis-Steele ladder inside 512-lane blocks, a tiny inter-block
ladder, and one combine pass.  In pure XLA each in-block ladder step
materializes the full (k, n) array in HBM — at the bench's 8.4M-lane
pair space that is ~14 fusions x ~9 ms ≈ 100+ ms per batched integrate
(PERF.md §5), all of it avoidable traffic: the block fits in VMEM.

This kernel runs the whole in-block ladder in ONE pass: each
(k, 8, 512) tile is read once, scanned in registers/VMEM (log2(512) = 9
shift steps via ``pltpu.roll`` + first-lane masking), and written once —
value channels and the flag channel together.  The 8 block-rows per grid
step satisfy the Mosaic (8, 128) tile constraint; rows are independent
(the scan axis is the last one).

Blocks are independent in this phase (the cross-block carry is applied
by scatter.segment_reduce's combine pass), so the Pallas grid is
embarrassingly parallel — no sequential scratch carry, no atomics.

Supported combine kinds (shared with scatter.segment_reduce):
  * ``"add"``   — segmented sums (f32/i32)
  * ``"first"`` — segment fill / broadcast-from-start (any dtype)
  * ``"or"``    — bitwise or (u32/i32)

Edge lanes (no left neighbor within the block) combine with ZERO for
every kind — bit-identical to the XLA ladder's zero-padded shift, so the
two phase-1 implementations are interchangeable lane-for-lane.

The kernel runs in interpret mode off-TPU so CPU tests exercise the same
code path bit-for-bit.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROWS = 8                      # block-rows per grid step (sublane tiling)


def _scan_kernel(vals_ref, flags_ref, out_v_ref, out_f_ref, *, kind: str,
                 bs: int):
    v = vals_ref[...]          # (k, ROWS, bs)
    # Mosaic's dynamic_rotate has no i1 support — carry flags as i32
    f = flags_ref[...].astype(jnp.int32)      # (ROWS, bs)
    lane_v = jax.lax.broadcasted_iota(jnp.int32, (1, 1, bs), 2)
    lane_f = jax.lax.broadcasted_iota(jnp.int32, (1, bs), 1)
    s = 1
    while s < bs:
        vs = pltpu.roll(v, s, axis=2)
        fs = pltpu.roll(f, s, axis=1)
        vs = jnp.where(lane_v < s, jnp.zeros_like(vs), vs)
        fs = jnp.where(lane_f < s, jnp.zeros_like(fs), fs)
        if kind == "add":
            comb = vs + v
        elif kind == "or":
            comb = vs | v
        else:                  # "first"
            comb = vs
        v = jnp.where((f != 0)[None], v, comb)
        f = f | fs
        s *= 2
    out_v_ref[...] = v
    out_f_ref[...] = f != 0


@functools.partial(jax.jit, static_argnames=("kind", "interpret"))
def block_segscan(vals: jax.Array,      # (k, nb, BS)
                  flags: jax.Array,     # (nb, BS) bool
                  *, kind: str,
                  interpret: bool = False
                  ) -> Tuple[jax.Array, jax.Array]:
    """In-block inclusive segmented scan; returns (scanned, scanned_flags)
    exactly as scatter.segment_reduce's ``ladder(vb, fb, BS)`` would.
    ``nb`` is padded up to a multiple of 8 internally."""
    k, nb, bs = vals.shape
    # Mosaic's dynamic_rotate handles 32-bit vectors only — run narrow
    # value dtypes (bool channels like normal_found fills) through i32
    vdtype = vals.dtype
    if vals.dtype.itemsize < 4:
        vals = vals.astype(jnp.int32)
    nbp = -(-nb // _ROWS) * _ROWS
    if nbp != nb:
        vals = jnp.pad(vals, ((0, 0), (0, nbp - nb), (0, 0)))
        flags = jnp.pad(flags, ((0, nbp - nb), (0, 0)))
    kernel = functools.partial(_scan_kernel, kind=kind, bs=bs)
    out_v, out_f = pl.pallas_call(
        kernel,
        grid=(nbp // _ROWS,),
        in_specs=[
            pl.BlockSpec((k, _ROWS, bs), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROWS, bs), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((k, _ROWS, bs), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROWS, bs), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((k, nbp, bs), vals.dtype),
            jax.ShapeDtypeStruct((nbp, bs), flags.dtype),
        ],
        interpret=interpret,
    )(vals, flags)
    out_v = out_v[:, :nb]
    if out_v.dtype != vdtype:
        out_v = (out_v != 0) if vdtype == jnp.bool_ \
            else out_v.astype(vdtype)
    return out_v, out_f[:nb]


def available() -> bool:
    """Compiled path only on a real TPU backend (interpret elsewhere)."""
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False
