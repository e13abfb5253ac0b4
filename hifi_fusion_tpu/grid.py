"""Functional grid state: the TPU-native replacement for ``OccupancyGrid``.

The reference (OccupancyGrid.hpp:51-136) stores a dense
``vector<vector<vector<Voxel>>>`` of {bool, void*} cells whose heap-allocated
``VoxelInfo`` holds a running Welford mean/variance, an unbounded point buffer
and a dependants vector.  That layout is pointer-chasing, mutex-guarded and
order-dependent — all wrong for a TPU.

Here the grid is a *pytree of flat SoA arrays in HBM*, addressed by an
open-addressing spatial hash (survey §7 "core representation decisions"):

* ``key``       dense cell id ``(x*ydim + y)*zdim + z``; -1 empty.  A slot
  with key != -1 corresponds to "data != nullptr" in the reference;
  ``occupied`` is tracked separately so that *ghost* voxels (line cells
  pre-created by normal refinement with ``occupied == false``,
  OccupancyGrid.hpp:443-449) fall out of the representation naturally.
* Welford stats -> **centered sum form**: per voxel we accumulate
  ``count, Σq, Σq², Σd, Σd²`` where ``q = projected_point - cell_center`` and
  ``d = distance to the normal axis``.  Sums commute, so parallel updates
  give order-independent results where the reference's sequential running
  update (OccupancyGrid.hpp:264-273) is order-dependent.  Centering keeps the
  f32 cancellation error tiny (|q| <= bball_radius).
* The pre-normal point buffer (OccupancyGrid.hpp:70,211) becomes one global
  append region written with contiguous block updates.
* Dependant links (OccupancyGrid.hpp:417,447) become a fixed-width slot-major
  table + per-slot count.

LAYOUT (performance-critical — measured on TPU):

* Scatter with DUPLICATE indices on TPU is pathologically slow (~1000x);
  with ``unique_indices=True`` it is fast in any lane order (ops/scatter.py
  measurements).  Every mutation therefore groups duplicate contributions
  (sort + segment-reduce) and issues ONE unique-index scatter.
* Multi-component per-voxel fields are stored as **flat 1-D slot-major**
  arrays: element ``slot*k + r``.  Flat 1-D arrays avoid the TPU (8,128)
  tile padding of small-minor 2-D arrays.
* Every scatter-target array carries a **scratch tail** of
  ``config.scatter_tail`` slots: masked-out lanes scatter into per-lane
  fake offsets past the live region, keeping indices unique without
  compaction.  Readers use only the first ``k*C`` elements.

Slots are append-only between ``clear()`` calls, so slot indices stored in
``dep``/``buf_slot`` stay stable.  ``clear()`` rebuilds a fresh state, fixing
the reference's ghost-voxel leak and stale hash sets by construction
(OccupancyGrid.hpp:167-183, survey §2 C17).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .config import FusionConfig


class GridState(NamedTuple):
    """SoA voxel hash table + global point buffer (one device's shard).

    ``C`` = capacity, ``T`` = scatter tail, ``B`` = buffer capacity,
    ``D`` = max dependants.  "flat k" = slot-major ``(k*C + k*T,)``.
    """

    # hash table -------------------------------------------------------
    key: jax.Array          # (C+T,)    i32  dense cell id, -1 = empty slot
    # cell-id-keyed packed occupancy bitmap (32 cells/word): the refine
    # pass tests the (2k+1)^3 neighborhood with ONE u32 gather per
    # neighbor instead of hash probing (the reference walks its dense
    # voxels_ array directly, OccupancyGrid.hpp:334-349 — this restores
    # O(1) occupancy tests on a sparse grid).  Slot-keyed occupancy is
    # derived: a voxel is occupied iff it has received a point, i.e.
    # n_pts > 0 (see occupied_slots/occupied_at).
    occ_bits: jax.Array     # (W+T,)    u32
    normal_found: jax.Array  # (C+T,)   bool VoxelInfo::normal_found
    normal: jax.Array       # flat 3    f32  unit surface normal
    # cylinder statistics (centered sum form, SCALAR projection): every
    # per-point contribution is q_proj = t*n with the OWNER's constant
    # unit normal n (t = (p-c)·n), so the vector sums Σq_proj / Σq_proj²
    # are n*Σt / n²*Σt² — only the scalars need accumulating; extract
    # reconstructs the vector forms from the stored normal.  9 -> 5
    # channels cuts the hot scatter-add and the pair scan ladders ~45%
    # (PERF.md §5).  Trailing lane = cylinder hit count as f32 (exact to
    # 2^24), merged so stats and count land in ONE scatter -------------
    cyl_stats: jax.Array    # flat 5    f32  [Σt,Σt²,Σd,Σd²,hits]
    # per-voxel first-occupancy viewpoint and color telemetry.  Separate
    # arrays (not one interleaved flat-6): the viewpoint is SET only on
    # first occupancy (a masked 3-channel scatter over the few new cells)
    # while Σrgb is a 3-channel scatter-ADD every dispatch — fusing them
    # required gathering the old rows first (~27 ms/batch of latency-bound
    # row reads at the bench config, PERF.md §5) -----------------------
    viewpoint: jax.Array    # flat 3    f32
    rgb_sum: jax.Array      # flat 3    f32
    # raw point count, OWN contiguous array: occupancy (n_pts > 0) is read
    # as a full-table slice by refine/extract every pass, and a strided
    # read of an interleaved stats row streamed the whole array at
    # 0.6 GB/s on TPU v5e (316 ms/refine — PERF.md §4); a dedicated array
    # makes it one contiguous 16 MB read -------------------------------
    n_pts: jax.Array        # (C+T,)    f32
    # dependant links -------------------------------------------------
    dep: jax.Array          # flat D    i32  owner slots, slot-major, -1
    dep_count: jax.Array    # (C+T,)    i32
    # global pre-normal point buffer (block-appended) -----------------
    buf_pts: jax.Array      # (3,B)     f32
    buf_slot: jax.Array     # (B,)      i32  destination slot, -1 = empty
    buf_count: jax.Array    # ()        i32  append cursor
    # overflow / telemetry counters -----------------------------------
    overflow_probe: jax.Array  # ()  i32  inserts dropped (probe bound hit)
    overflow_buf: jax.Array    # ()  i32  buffered points dropped
    overflow_dep: jax.Array    # ()  i32  dependant links dropped
    overflow_refine: jax.Array  # () i32  refine candidates deferred
    overflow_unique: jax.Array  # () i32  unique-cells-per-frame bound hit
    overflow_hits: jax.Array    # () i32  stream pair/owner-run drops
    overflow_replay: jax.Array  # () i32  replay run/lane/owner drops
    overflow_active: jax.Array  # () i32  valid points dropped (NA bound)
    reclaimed: jax.Array       # ()  i32  buffer lanes freed by reclamation
    frames: jax.Array          # ()  i32  frames integrated since clear


def make_grid(config: FusionConfig) -> GridState:
    C = config.capacity
    T = config.scatter_tail
    B = config.buffer_capacity
    D = config.max_dependants
    f32 = jnp.float32
    i32 = jnp.int32

    def flat(k, fill, dtype):
        return jnp.full((k * (C + T),), fill, dtype)

    return GridState(
        key=flat(1, -1, i32),
        occ_bits=jnp.zeros((config.n_occ_words + T,), jnp.uint32),
        normal_found=flat(1, False, jnp.bool_),
        normal=flat(3, 0.0, f32),
        cyl_stats=flat(5, 0.0, f32),
        viewpoint=flat(3, 0.0, f32),
        rgb_sum=flat(3, 0.0, f32),
        n_pts=flat(1, 0.0, f32),
        dep=flat(D, -1, i32),
        dep_count=flat(1, 0, i32),
        buf_pts=jnp.zeros((3, B), f32),
        buf_slot=jnp.full((B,), -1, i32),
        buf_count=jnp.zeros((), i32),
        overflow_probe=jnp.zeros((), i32),
        overflow_buf=jnp.zeros((), i32),
        overflow_dep=jnp.zeros((), i32),
        overflow_refine=jnp.zeros((), i32),
        overflow_unique=jnp.zeros((), i32),
        overflow_hits=jnp.zeros((), i32),
        overflow_replay=jnp.zeros((), i32),
        overflow_active=jnp.zeros((), i32),
        reclaimed=jnp.zeros((), i32),
        frames=jnp.zeros((), i32),
    )


def occupied_slots(grid: GridState, capacity: int) -> jax.Array:
    """(C,) bool slot-keyed occupancy: a voxel is occupied iff at least one
    point landed in it (reference semantics: occupied set on first point,
    OccupancyGrid.hpp:227-241; ghosts have data but no points)."""
    return grid.n_pts[:capacity] > 0


def occupied_at(grid: GridState, slots: jax.Array) -> jax.Array:
    """Occupancy gather for (possibly clipped) slot indices."""
    return grid.n_pts[slots] > 0


def count_at(grid: GridState, slots: jax.Array) -> jax.Array:
    """Cylinder-hit count (i32) for slot indices."""
    return jnp.round(grid.cyl_stats[slots * 5 + 4]).astype(jnp.int32)


from functools import partial as _partial


@_partial(jax.jit, static_argnames=("capacity",))
def _quick_counts(grid: GridState, capacity: int) -> jax.Array:
    """One-dispatch device reduction of the counters the budget policy and
    overflow guards need between refine cadences (grid_metrics costs ~16
    separate tiny dispatches; this is one).  Returns i32[14]:
    [occupied, normals_found, refine_candidates, buffered_points, frames,
     overflow x8 (probe,buf,dep,refine,unique,hits,replay,active),
     reclaimed, max_dependants_used]."""
    C = capacity
    occ = occupied_slots(grid, C)
    nf = grid.normal_found[:C]
    i32 = jnp.int32
    return jnp.stack([
        jnp.sum(occ.astype(i32)),
        jnp.sum(nf.astype(i32)),
        jnp.sum((occ & ~nf).astype(i32)),
        grid.buf_count,
        grid.frames,
        grid.overflow_probe, grid.overflow_buf, grid.overflow_dep,
        grid.overflow_refine, grid.overflow_unique, grid.overflow_hits,
        grid.overflow_replay, grid.overflow_active,
        grid.reclaimed,
        jnp.max(grid.dep_count[:C]),
    ])


_QUICK_FIELDS = ("occupied_voxels", "normals_found", "refine_candidates",
                 "buffered_points", "frames",
                 "overflow_probe", "overflow_buffer", "overflow_dependants",
                 "overflow_refine", "overflow_unique", "overflow_hits",
                 "overflow_replay", "overflow_active",
                 "buffer_lanes_reclaimed", "max_dependants_used")


def quick_counts(grid: GridState, config: FusionConfig) -> dict:
    """Host dict of the one-dispatch counter reduction (see _quick_counts)."""
    import numpy as np
    vals = np.asarray(_quick_counts(grid, config.capacity))
    return {k: int(v) for k, v in zip(_QUICK_FIELDS, vals)}


@_partial(jax.jit, static_argnames=("capacity",))
def _grid_metrics(grid: GridState, capacity: int) -> jax.Array:
    return jnp.concatenate([
        _quick_counts(grid, capacity),
        jnp.sum((grid.key[:capacity] != -1).astype(jnp.int32))[None],
    ])


def grid_metrics(grid: GridState, config: FusionConfig) -> dict:
    """Host-side telemetry (survey §5.5): occupancy, load factor, overflows.

    ``config`` is required: grid arrays carry scratch tails whose size
    cannot be inferred from the state alone.  ONE jitted dispatch + one
    fetch — the round-2 form issued ~16 tiny reductions, each a separate
    ~34 ms round-trip on the axon tunnel, which put half a second of
    metrics overhead inside every ``process()``.
    """
    import numpy as np
    vals = np.asarray(_grid_metrics(grid, config.capacity))
    m = {k: int(v) for k, v in zip(_QUICK_FIELDS, vals)}
    used = int(vals[len(_QUICK_FIELDS)])
    return {
        "occupied_voxels": m["occupied_voxels"],
        "slots_used": used,
        "hash_load_factor": used / config.capacity,
        "normals_found": m["normals_found"],
        "max_dependants_used": m["max_dependants_used"],
        "buffered_points": m["buffered_points"],
        "frames": m["frames"],
        "overflow_probe": m["overflow_probe"],
        "overflow_buffer": m["overflow_buffer"],
        "overflow_dependants": m["overflow_dependants"],
        "overflow_refine": m["overflow_refine"],
        "overflow_unique": m["overflow_unique"],
        "overflow_hits": m["overflow_hits"],
        "overflow_replay": m["overflow_replay"],
        "overflow_active": m["overflow_active"],
        "buffer_lanes_reclaimed": m["buffer_lanes_reclaimed"],
    }
