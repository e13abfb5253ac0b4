"""Extraction: compact the voxel hash into dense output arrays.

Replaces the reference's full-grid triple loops (``downloadData`` /
``download`` / ``downloadHQ`` / ``downloadClassified``,
OccupancyGrid.hpp:456-601) — which iterate all ~63M dense cells per export —
with one device-side compaction over the hash slots: mask
``occupied & normal_found``, sort by dense cell id (reproducing the
reference's x-major emission order), and emit finalized statistics:

* centroid  = cell_center + Σq/count   (the cylinder-filtered sub-voxel mean;
              voxels with count==0 emit (0,0,0) exactly like the reference's
              default-initialized ``VoxelInfo::centroid``)
* sd        = Σq²/count - (Σq/count)²  (population variance — what the
              reference's running Welford ``sd`` converges to)
* mean_dist, sd_dist analogously (the reference never initializes
  ``mean_dist`` — we define it as 0 for count==0)
* normal, count, mean rgb.

Reads the flat slot-major grid fields (grid.py) with per-component gathers;
vector outputs are planar (3, C).  Host code slices ``n_valid`` columns and
writes PCD/CSV (hifi_fusion_tpu.io).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import FusionConfig
from ..grid import GridState
from . import geometry
from .scatter import rows

_I32_MAX = jnp.iinfo(jnp.int32).max


class ExtractResult(NamedTuple):
    n_valid: jax.Array    # ()    i32 number of emitted voxels
    cell: jax.Array       # (C,)  i32 dense cell id (sorted ascending)
    centroid: jax.Array   # (3,C) f32
    normal: jax.Array     # (3,C) f32
    sd: jax.Array         # (3,C) f32 per-axis variance of projected points
    mean_dist: jax.Array  # (C,)  f32
    sd_dist: jax.Array    # (C,)  f32
    count: jax.Array      # (C,)  i32 points inside the 1mm cylinder
    rgb: jax.Array        # (3,C) f32 mean color of points in the voxel
    n_pts: jax.Array      # (C,)  i32 raw points that landed in the voxel
    # Export-wire duplicates (runtime/session.process): the d->h tunnel
    # charges ~45 ms/MB, so the session fetches ONE scalar variance lane
    # (sd = normal_i^2 * var_t, reconstructed bit-identically on host —
    # two f32 multiplies in the same order) and ONE packed-u32 rgb lane
    # (exactly io/pcd's clip->truncate->pack) instead of 3+3 f32 lanes.
    var_t: jax.Array      # (C,)  f32 variance of the scalar projection t
    rgb_packed: jax.Array  # (C,) u32 0x00RRGGBB (PCL packed color)
    # mean scalar projection t: the session's PCD export fetches (cell,
    # mean_t) — 2 lanes — instead of the 3-lane centroid and reconstructs
    # ``centroid = cell_center(cell) + normal * mean_t`` on host to
    # within 1 ulp (centroid_from_wire; models/pipeline.extract_fetcher)
    mean_t: jax.Array     # (C,)  f32


def extract_impl(grid: GridState, *, config: FusionConfig,
                 x_range=None, offset=None, cap=None) -> ExtractResult:
    """``x_range=(lo, hi)`` restricts emission to voxels whose x cell index
    lies in [lo, hi) — used by the sharded path so each device emits only
    its core slab (halo copies are suppressed).  ``offset``: shard-local ->
    global coordinate offset; emitted ``cell`` ids stay LOCAL (the sharded
    host assembly maps them to global int64 ids), centers are global.

    ``cap``: static bound on emitted voxels.  The round-1 extract gathered
    13 per-channel arrays over ALL ``capacity`` slots — ~1.3 s of
    latency-bound random gathers at the bench config of which ~95% of
    lanes were dead (PERF.md §4).  With ``cap`` the gathers run over the
    compacted ``cap``-lane prefix of the id-sorted slots.  ``n_valid`` is
    the TRUE emission count regardless of cap; callers must check
    ``n_valid <= cap`` (``to_host`` raises) and re-run with a bigger
    variant on truncation — the session sizes cap from quick_counts."""
    from ..grid import occupied_slots
    C = config.capacity
    E = min(cap, C) if cap else C
    key = grid.key[:C]
    mask = occupied_slots(grid, C) & grid.normal_found[:C]
    if x_range is not None:
        _, dy, dz = config.dims
        cx = key // (dy * dz)
        mask = mask & (cx >= x_range[0]) & (cx < x_range[1])
    n_valid = jnp.sum(mask.astype(jnp.int32))

    sort_key = jnp.where(mask, key, _I32_MAX)
    # one 2-operand sort yields both the sorted ids and the slot order
    cell_f, order_f = jax.lax.sort(
        (sort_key, jnp.arange(C, dtype=jnp.int32)), num_keys=1,
        is_stable=True)
    cell = cell_f[:E]
    order = order_f[:E]

    center = geometry.center_of_ids(jnp.maximum(cell, 0), config,
                                    offset)                # (3,E)

    # row gathers: one index latency per SLOT, not per channel
    # (ops/scatter.rows) — the round-1 extract's 13 flat gathers were
    # ~1.3 s at full capacity (PERF.md §4)
    normal = rows(grid.normal, 3, order).T                 # (3,E)
    # scalar sum form (grid.py cyl_stats): per-point q_proj = t*normal, so
    # Σq = normal*Σt and Σq²_i = normal_i²*Σt² — reconstruct the vector
    # stats the reference reports from the 5 stored scalars + the normal
    stats = rows(grid.cyl_stats, 5, order).T               # (5,E)
    cnt = jnp.round(stats[4]).astype(jnp.int32)
    cnt_f = jnp.maximum(stats[4], 1.0)                     # (E,)
    mean_t = stats[0] / cnt_f
    has = cnt > 0
    centroid = jnp.where(has[None, :],
                         center + normal * mean_t[None, :], 0.0)
    var_t = stats[1] / cnt_f - mean_t * mean_t
    sd = jnp.where(has[None, :], (normal * normal) * var_t[None, :], 0.0)
    mean_d = jnp.where(has, stats[2] / cnt_f, 0.0)
    sd_d = jnp.where(has, stats[3] / cnt_f - mean_d * mean_d, 0.0)

    rgbs = rows(grid.rgb_sum, 3, order).T                  # (3,E)
    npts = grid.n_pts[order]
    npts_f = jnp.maximum(npts, 1.0)
    rgb = rgbs / npts_f[None, :]
    rgb_u = jnp.clip(rgb, 0.0, 255.0).astype(jnp.uint32)   # truncate = host
    rgb_packed = (rgb_u[0] << 16) | (rgb_u[1] << 8) | rgb_u[2]

    return ExtractResult(
        n_valid=n_valid,
        cell=cell,
        centroid=centroid,
        normal=normal,
        sd=sd,
        mean_dist=mean_d,
        sd_dist=sd_d,
        count=cnt,
        rgb=rgb,
        n_pts=npts.astype(jnp.int32),
        var_t=jnp.where(has, var_t, 0.0),
        rgb_packed=rgb_packed,
        mean_t=jnp.where(has, mean_t, 0.0),
    )


extract = partial(jax.jit, static_argnames=("config", "cap"))(
    partial(extract_impl, x_range=None))

# planar (3,C) fields, transposed to host-friendly (n,3) in to_host
_PLANAR_FIELDS = ("centroid", "normal", "sd", "rgb")


# What process()'s PCD + metadata-CSV export fetches (runtime/session.py):
# 10 of the 20 result lanes, in two waves so the CSV formats on a thread
# while the PCD lanes are still crossing the d->h tunnel.  ``sd`` is
# reconstructed on host from normal + var_t (bit-identical, see
# ExtractResult), ``rgb`` travels as the packed u32 the PCD stores anyway,
# and ``centroid`` travels as (cell, mean_t) — 2 lanes instead of 3 —
# reconstructed by the fetcher (models/pipeline.extract_fetcher).
CSV_EXPORT_FIELDS = ("normal", "var_t", "mean_dist", "sd_dist", "count")
PCD_EXPORT_FIELDS = ("centroid", "rgb_packed")
# legacy single-wave set (full-precision rgb + per-axis sd)
EXPORT_FIELDS = ("centroid", "normal", "sd", "mean_dist", "sd_dist",
                 "count", "rgb")


def centroid_from_wire(cell, mean_t, normal, count, config,
                       offset=None):
    """Reconstruct the (n,3) f32 centroid from the 2-lane export wire.

    Matches the device's ``ExtractResult.centroid`` to within 1 ulp: the
    same f32 expressions — ``center = origin + res * (coords + 0.5)``
    (geometry.cell_center) then ``center + normal * mean_t`` masked to
    ``count > 0`` — except XLA may contract the mul-adds into FMAs
    (measured max |diff| 1.5e-8 m, i.e. 15 nano-meters, on the small-config
    sweep; the oracle-parity tolerance is 2e-5 m).  ``cell`` may be int64
    (sharded global ids); ``offset`` shifts local coords global (unused
    single-chip)."""
    import numpy as np
    _, dy, dz = config.dims
    ids = np.asarray(cell, np.int64)
    coords = np.stack([ids // (dy * dz), (ids // dz) % dy, ids % dz],
                      axis=1)
    if offset is not None:
        coords = coords + np.asarray(offset, np.int64)[None, :]
    origin = np.asarray(config.origin, np.float32)
    res = np.asarray(config.resolution, np.float32)
    center = origin[None, :] + res[None, :] * (
        coords.astype(np.float32) + np.float32(0.5))
    c = center + np.asarray(normal, np.float32) \
        * np.asarray(mean_t, np.float32)[:, None]
    return np.where(np.asarray(count)[:, None] > 0, c,
                    np.float32(0.0)).astype(np.float32, copy=False)


def to_host(result: ExtractResult, fields=None, prefetch=()) -> dict:
    """Device ExtractResult -> host dict of trimmed NumPy arrays (row-major
    (n,3) vectors for I/O and analysis).

    Fetches the FULL padded arrays deliberately: device-side slicing to
    the live prefix was tried twice (exact-n and 64k-bucketed) and each
    distinct slice shape compiles its own program on the axon service at
    wildly variable cost (13 s to minutes) — dead-lane transfer bytes are
    cheaper than compile roulette.  Size the transfer with
    ``config.extract_cap`` instead: the fetch is cap * 68 B (~36 MB at
    cap 2^19, ~1.8 s through the ~20 MB/s d->h tunnel).

    ``fields``: fetch only this subset of result fields (the d->h tunnel
    charges per byte — ``EXPORT_FIELDS`` is what ``process()`` needs);
    None fetches everything.

    ``prefetch``: additional fields whose device->host copies are STARTED
    (``copy_to_host_async``) behind this call's own — a later fetch of
    those fields finds the bytes already crossing (or across) the tunnel.
    All requested fields are async-started before the first blocking
    materialization, so per-fetch tunnel latencies overlap instead of
    serializing (measured ~1.28 s for the 11-lane export at the bench
    config, of which device compute was 43 ms)."""
    import numpy as np
    n = int(result.n_valid)
    if n > result.cell.shape[0]:
        raise RuntimeError(
            f"extract cap too small: {n} voxels emitted, cap "
            f"{result.cell.shape[0]} — re-extract with a larger cap")
    want = tuple(fields if fields is not None else ExtractResult._fields)
    for f in want + tuple(prefetch):
        if f == "n_valid":
            continue
        try:
            getattr(result, f).copy_to_host_async()
        except Exception:      # backend without async host copies
            break
    out = {}
    for f in want:
        if f == "n_valid":
            continue
        a = np.asarray(getattr(result, f))
        out[f] = a[:, :n].T.copy() if f in _PLANAR_FIELDS else a[:n].copy()
    return out
