"""TSDF-weighted fusion variant (BASELINE.json config 5).

A second model family sharing the framework's spatial-hash substrate: instead
of the reference's occupancy + cylinder-filter pipeline, each depth sample
carves a truncated signed-distance profile along its camera ray and voxels
accumulate *weighted averages* of signed distance — the classic
KinectFusion/TSDF formulation, restated TPU-first:

* Per point, S samples are placed along the ray through the point at signed
  offsets s in [-trunc, +trunc]; the sample's voxel accumulates
  ``(w, w * (-s))``.  Sums commute -> integration is order-independent.
* Updates follow the framework's sorted-scatter discipline (ops/scatter.py):
  all S*N ray samples are sorted by cell id once, segment-reduced, and the
  per-cell sums land in TWO sorted-unique scatters — no random scatter.
* Surface extraction masks voxels with weight >= w_min and |tsdf| < band,
  estimates the normal from the TSDF gradient via 6-neighbor hash lookups,
  and refines each centroid by projecting the cell center onto the implicit
  surface: centroid = center - tsdf * normal — the TSDF analog of the main
  pipeline's cylinder-filtered sub-voxel centroid.

Runs at sub-mm pitch within the same capacity budgeting.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..config import FusionConfig
from ..ops import geometry, hashing
from ..ops.scatter import (scatter_add, segment_ends, segment_starts,
                           segment_sums)

_BIG = jnp.iinfo(jnp.int32).max


class TsdfConfig(NamedTuple):
    base: FusionConfig
    truncation: float = 0.004      # truncation band tau (m)
    n_samples: int = 9             # samples along the ray inside +-tau
    min_weight: float = 3.0        # extraction weight gate
    surface_band: float = 1.0      # |tsdf| < surface_band * res -> surface
    batch_unique: int = 0          # distinct sample cells per K-frame
                                   # batch (the batched step's U budget
                                   # AND the grid's scatter tail); 0 =
                                   # single-step sizing only.  Consecutive
                                   # frames' truncation bands overlap
                                   # heavily, so the union is well below
                                   # K x the per-frame uniques — measured
                                   # at the 0.8 mm bench workload: 1.07M
                                   # cells/frame, K=8 union ~3.4M.


class TsdfGrid(NamedTuple):
    key: jax.Array        # (C+T,)  i32 dense cell id, -1 empty
    vstats: jax.Array     # flat 6  f32 [Σw, Σw*sdf, Σr, Σg, Σb, n_rgb]
    overflow_probe: jax.Array  # () i32
    overflow_unique: jax.Array  # () i32
    frames: jax.Array     # ()   i32


def _tail(config: TsdfConfig) -> int:
    # insert batches are per-frame-unique sample cells (or the batched
    # step's union budget when larger)
    return max(config.base.scatter_tail,
               min(config.n_samples * config.base.max_points,
                   4 * config.base.max_unique_per_frame),
               config.batch_unique)


def make_tsdf_grid(config: TsdfConfig) -> TsdfGrid:
    C = config.base.capacity
    T = _tail(config)
    return TsdfGrid(
        key=jnp.full((C + T,), -1, jnp.int32),
        vstats=jnp.zeros((6 * (C + T),), jnp.float32),
        overflow_probe=jnp.zeros((), jnp.int32),
        overflow_unique=jnp.zeros((), jnp.int32),
        frames=jnp.zeros((), jnp.int32),
    )


def _tsdf_lanes(points_cam, rgb, mask, pose, *, config: TsdfConfig):
    """One frame -> flat sample lanes: cell-id sort key (M,) and the six
    value channels (6, M), M = n_samples * N.  Pure map work — the
    batched step vmaps this over K frames and reduces the concatenation
    through the SAME sort/segment/hash/scatter tail as single-step."""
    cfg = config.base
    S = config.n_samples
    N = mask.shape[0]
    M = S * N
    f32 = jnp.float32

    zmin, zmax = cfg.z_clip
    zclip = (points_cam[2] > zmin) & (points_cam[2] < zmax)
    world = geometry.transform_points(points_cam, pose)        # (3,N)
    vp = pose[:3, 3]

    ray = world - vp[:, None]
    dist = jnp.sqrt(jnp.sum(ray * ray, axis=0))
    dirn = ray / jnp.maximum(dist, 1e-6)[None, :]

    # Centered-integer sample offsets (NOT linspace: jnp.linspace computes
    # the endpoint as start + k*step, one ulp above tau, while NumPy pins
    # it exactly — the difference flips borderline |tsdf| < tau extraction
    # gates between device and oracle).  step is host-computed f64 cast to
    # f32 so the oracle (oracle/tsdf_oracle.py) reproduces it bit-exactly.
    step = jnp.float32(2.0 * config.truncation / (S - 1))
    s = (jnp.arange(S, dtype=f32) - f32((S - 1) / 2.0)) * step  # (S,)
    pos = world[:, None, :] + s[None, :, None] * dirn[:, None, :]  # (3,S,N)
    coords = geometry.cell_coords(pos, cfg)
    valid = (mask[None, :] & zclip[None, :]
             & geometry.valid_points(pos, cfg)
             & geometry.valid_coords(coords, cfg))             # (S,N)
    ids = geometry.cell_id(coords, cfg)

    # lane values: weight 1, sdf = -s (positive in free space toward the
    # camera); color only on the surface sample (s == 0 -> row S//2)
    sdf = jnp.broadcast_to((-s)[:, None], (S, N))
    is_mid = jnp.zeros((S, N), jnp.bool_).at[S // 2].set(True)
    w = valid.astype(f32)
    cm = (valid & is_mid).astype(f32)
    vals6 = jnp.stack([
        w, w * sdf,
        cm * rgb[0][None, :], cm * rgb[1][None, :], cm * rgb[2][None, :],
        cm,
    ], axis=0).reshape(6, M)                                   # (6,M)
    skey = jnp.where(valid, ids, _BIG).reshape(-1)             # (M,)
    return skey, vals6


def _tsdf_reduce(grid: TsdfGrid, skey, vals6, U: int,
                 *, config: TsdfConfig) -> TsdfGrid:
    """Flat sample lanes -> grid update: sort by cell id, segment-reduce,
    hash-insert the <= U distinct cells, two sorted-unique scatters."""
    cfg = config.base
    C = cfg.capacity
    i32 = jnp.int32

    # ---- sort all ray samples by cell id; segment-reduce ----------------
    # ONE payload-carrying sort (the §3 design rule: payloads ride the
    # sort operands at ~1.5 ns/elem/channel; the old gather-after-argsort
    # form cost 6 x M latency-bound random gathers)
    sorted_ops = jax.lax.sort(
        (skey,) + tuple(vals6[r] for r in range(6)),
        num_keys=1, is_stable=True)
    sid = sorted_ops[0]
    svalid = sid != _BIG
    starts = segment_starts(sid, svalid)
    ends = segment_ends(sid, svalid)
    sums6 = segment_sums(jnp.stack(sorted_ops[1:], axis=0), starts)
    n_u = jnp.sum(starts.astype(i32))
    overflow_unique = grid.overflow_unique + jnp.maximum(n_u - U, 0)

    uorder = jnp.argsort(~starts, stable=True)[:U]
    uids = sid[uorder]
    uvalid = starts[uorder]
    eorder = jnp.argsort(~ends, stable=True)[:U]
    usums = sums6[:, eorder]                                   # (6,U)

    # uids are sorted-unique by construction (segment starts of a sorted
    # id stream) -> the canonical-slot redirect pass is skippable
    key_table, uslot, n_failed = hashing.lookup_or_insert(
        grid.key, uids, uvalid, cfg.max_probes, C, unique_ids=True)

    sorder = jnp.argsort(jnp.where(uvalid & (uslot >= 0), uslot, _BIG),
                         stable=True)
    g_slot = uslot[sorder]
    g_valid = (uvalid & (uslot >= 0))[sorder]
    g_sums = usums[:, sorder]
    vstats = scatter_add(grid.vstats, g_slot, g_valid,
                         [g_sums[r] for r in range(6)], C)

    return grid._replace(
        key=key_table, vstats=vstats,
        overflow_probe=grid.overflow_probe + n_failed,
        overflow_unique=overflow_unique,
        frames=grid.frames + 1,
    )


def integrate_tsdf_impl(grid: TsdfGrid, points_cam, rgb, mask, pose,
                        *, config: TsdfConfig) -> TsdfGrid:
    skey, vals6 = _tsdf_lanes(points_cam, rgb, mask, pose, config=config)
    U = min(4 * config.base.max_unique_per_frame, skey.shape[0])
    return _tsdf_reduce(grid, skey, vals6, U, config=config)


def integrate_tsdf_batch_impl(grid: TsdfGrid, points_cam, rgb, mask,
                              poses, *, config: TsdfConfig) -> TsdfGrid:
    """K-frame batched band integration ((K,3,N) points + (K,4,4) poses):
    ONE sort/segment/hash/scatter pass over the K*S*N concatenated sample
    lanes.  The full-table costs that dominate single-step at 2^24
    capacity (the 503 MB vstats rewrite, the key-table machinery —
    trace 2026-08-21: 562 ms/frame module time, ~110 ms of it the vstats
    scatter fusion alone) run ONCE per batch instead of once per frame,
    and consecutive frames' truncation bands overlap so the distinct-cell
    union (config.batch_unique) stays well under K x the per-frame
    uniques.  Bit-compat note: per-cell sums are reassociated vs K
    single steps (f32 rounding only); the surface comparison against the
    C++ oracle carries the same tolerance either way."""
    K = poses.shape[0]
    ks, kv = jax.vmap(
        lambda p, c, m, t: _tsdf_lanes(p, c, m, t, config=config)
    )(points_cam, rgb, mask, poses)
    skey = ks.reshape(-1)                                   # (K*S*N,)
    vals6 = jnp.swapaxes(kv, 0, 1).reshape(6, -1)           # (6,K*S*N)
    U = min(config.batch_unique
            or K * 4 * config.base.max_unique_per_frame,
            skey.shape[0], _tail(config))
    grid = _tsdf_reduce(grid, skey, vals6, U, config=config)
    return grid._replace(frames=grid.frames + (K - 1))


class TsdfExtract(NamedTuple):
    n_valid: jax.Array    # ()
    cell: jax.Array       # (C,)  sorted dense ids
    centroid: jax.Array   # (3,C) surface-projected position
    normal: jax.Array     # (3,C) TSDF-gradient normal
    tsdf: jax.Array       # (C,)  weighted mean signed distance
    weight: jax.Array     # (C,)
    rgb: jax.Array        # (3,C)


def extract_tsdf_impl(grid: TsdfGrid, *, config: TsdfConfig,
                      cap=None) -> TsdfExtract:
    """``cap``: static bound on emitted surface voxels.  The uncapped
    variant ran its 6-neighbor gradient lookups and stat gathers over ALL
    ``capacity`` lanes — 144 s of device time at C=2^24 (measured
    2026-08-21), ~98% of it on empty slots.  With ``cap`` everything past
    the one id sort runs on the compacted E-lane surface prefix, exactly
    like the flagship's capped extract (ops/extract.py).  ``n_valid`` is
    the true count; callers re-run uncapped on truncation."""
    cfg = config.base
    C = cfg.capacity
    E = min(cap, C) if cap else C
    res = jnp.asarray(cfg.resolution, jnp.float32)

    # channel reads over the FULL table stream the vstats array once per
    # channel (strided); everything else below reads E-lane prefixes
    v2 = jax.lax.slice(grid.vstats, (0,), (6 * C,)).reshape(C, 6)
    w_all = v2[:, 0]
    tsdf_all = v2[:, 1] / jnp.maximum(w_all, 1e-9)
    key = grid.key[:C]
    surface = ((key >= 0) & (w_all >= config.min_weight)
               & (jnp.abs(tsdf_all) < config.surface_band * res[0]))
    n_valid = jnp.sum(surface.astype(jnp.int32))

    def row(r, idx):
        return grid.vstats[idx * 6 + r]

    sort_key = jnp.where(surface, key, _BIG)
    # one 2-operand sort carries the slot order; both sliced to E lanes
    cell_f, order_f = jax.lax.sort(
        (sort_key, jnp.arange(C, dtype=jnp.int32)), num_keys=1,
        is_stable=True)
    cell = cell_f[:E]
    order = order_f[:E]
    coords = geometry.id_to_coords(jnp.maximum(cell, 0), cfg)  # (3,E)
    center = geometry.cell_center(coords, cfg)

    # TSDF gradient by 6-neighbor central differences (hash lookups);
    # falls back to one-sided where a neighbor is missing.
    t_here = tsdf_all[order]

    def axis_grad(axis):
        e = jnp.zeros((3, 1), jnp.int32).at[axis, 0].set(1)
        grads = []
        for sign in (1, -1):
            cc = coords + sign * e
            ok = geometry.valid_coords(cc, cfg)
            sl = hashing.lookup(grid.key, geometry.cell_id(cc, cfg), ok,
                                cfg.max_probes, C)
            safe = jnp.clip(sl, 0, C - 1)
            has = (sl >= 0) & (row(0, safe) > 0)
            val = jnp.where(has,
                            row(1, safe) / jnp.maximum(row(0, safe), 1e-9),
                            t_here)
            grads.append((val, has))
        (fp, okp), (fm, okm) = grads
        span = (okp.astype(jnp.float32)
                + okm.astype(jnp.float32)) * res[axis]
        return (fp - fm) / jnp.maximum(span, 1e-9)

    gx, gy, gz = axis_grad(0), axis_grad(1), axis_grad(2)
    gnorm = jnp.sqrt(gx * gx + gy * gy + gz * gz)
    ok = gnorm > 1e-9
    inv = 1.0 / jnp.where(ok, gnorm, 1.0)
    normal = jnp.stack([gx * inv, gy * inv,
                        jnp.where(ok, gz * inv, 1.0)], axis=0)  # (3,C)

    centroid = center - t_here[None, :] * normal

    nrgb = jnp.maximum(row(5, jnp.clip(order, 0, C - 1)), 1.0)
    rgb = jnp.stack([row(2 + r, order) for r in range(3)], 0) / nrgb[None]

    return TsdfExtract(
        n_valid=n_valid, cell=cell, centroid=centroid, normal=normal,
        tsdf=t_here, weight=w_all[order], rgb=rgb)


integrate_tsdf = partial(jax.jit, static_argnames=("config",),
                         donate_argnames=("grid",))(integrate_tsdf_impl)
integrate_tsdf_batch = partial(
    jax.jit, static_argnames=("config",),
    donate_argnames=("grid",))(integrate_tsdf_batch_impl)
extract_tsdf = partial(jax.jit,
                       static_argnames=("config", "cap"))(extract_tsdf_impl)


@partial(jax.jit, static_argnames=("config",), donate_argnames=("grid",))
def integrate_tsdf_depth(grid: TsdfGrid, depth_q, rgb565, count, pose, rays,
                         *, config: TsdfConfig) -> TsdfGrid:
    """Sensor-native depth ingest for the TSDF family (same u16 z-depth +
    rgb565 wire as the flagship pipeline; ops/integrate._unpack_inputs)."""
    from ..ops.integrate import _unpack_inputs
    p, c, m = _unpack_inputs(depth_q, rgb565, count, None, rays)
    return integrate_tsdf_impl(grid, p, c, m, pose, config=config)


@partial(jax.jit, static_argnames=("config",), donate_argnames=("grid",))
def integrate_tsdf_batch_depth(grid: TsdfGrid, depth_q, rgb565, counts,
                               poses, rays, *, config: TsdfConfig
                               ) -> TsdfGrid:
    """K-frame sensor-native batched band integration ((K,N) u16 depth +
    (K,N) rgb565 + (K,) counts); see integrate_tsdf_batch_impl."""
    from ..ops.integrate import _unpack_inputs
    p, c, m = jax.vmap(
        lambda d, r5, n: _unpack_inputs(d, r5, n, None, rays)
    )(depth_q, rgb565, counts)
    return integrate_tsdf_batch_impl(grid, p, c, m, poses, config=config)


class TsdfPipeline:
    """FusionPipeline-shaped bundle for the TSDF family: the host runtime
    (runtime/session.py) drives it through the identical interface, so
    ``FusionSession(cfg, model="tsdf")`` and ``cli fuse --model tsdf`` get
    start/stop/process/metrics/checkpoint for free.  ``refine`` is a no-op
    (TSDF has no deferred phase — every sample lands at integrate time)."""

    def __init__(self, config: TsdfConfig):
        config.base.validate()
        self.config = config

    def init(self) -> TsdfGrid:
        return make_tsdf_grid(self.config)

    def step(self, grid, points_cam, rgb, mask, pose) -> TsdfGrid:
        return integrate_tsdf(grid, points_cam, rgb, mask, pose,
                              config=self.config)

    def step_depth(self, grid, depth_q, rgb565, count, pose, rays
                   ) -> TsdfGrid:
        return integrate_tsdf_depth(grid, depth_q, rgb565, count, pose,
                                    rays, config=self.config)

    def step_batch(self, grid, points_cam, rgb, mask, poses) -> TsdfGrid:
        return integrate_tsdf_batch(grid, points_cam, rgb, mask, poses,
                                    config=self.config)

    def step_batch_depth(self, grid, depth_q, rgb565, counts, poses, rays
                         ) -> TsdfGrid:
        return integrate_tsdf_batch_depth(grid, depth_q, rgb565, counts,
                                          poses, rays, config=self.config)

    def refine(self, grid) -> TsdfGrid:
        return grid

    def extract(self, grid, cap=None) -> TsdfExtract:
        """``cap=None`` uses ``base.extract_cap`` (0 = uncapped); the
        fetch path retries uncapped on truncation (extract_host)."""
        if cap is None:
            cap = self.config.base.extract_cap or None
        return extract_tsdf(grid, config=self.config, cap=cap)

    # -- host-facing interface shared with FusionPipeline ----------------
    def extract_host(self, grid, fields=None) -> dict:
        """TSDF surface -> the export dict the session's process() writes.
        Field mapping for the shared PCD/CSV writers: ``count`` = integer
        TSDF weight (samples fused), ``mean_dist`` = signed distance of
        the cell center to the implicit surface (the TSDF value), ``sd`` /
        ``sd_dist`` = 0 (TSDF accumulates first moments only).
        ``fields`` is accepted for interface parity and ignored — the
        TSDF result has 8 lanes total; subsetting saves nothing."""
        import numpy as np
        from ..io.pcd import _pack_rgb_float
        r = self.extract(grid)
        cap = self.config.base.extract_cap
        if cap and int(r.n_valid) > cap:
            # pay the full-width extract rather than truncate
            r = self.extract(grid, cap=0)
        h = tsdf_to_host(r)
        n = h["cell"].shape[0]
        return {
            "cell": h["cell"],
            "centroid": h["centroid"],
            "normal": h["normal"],
            "rgb": h["rgb"],
            "count": np.round(h["weight"]).astype(np.int32),
            "mean_dist": h["tsdf"],
            "sd": np.zeros((n, 3), np.float32),
            "sd_dist": np.zeros((n,), np.float32),
            "n_pts": np.round(h["weight"]).astype(np.int32),
            # export-wire parity with ops/extract.ExtractResult
            "var_t": np.zeros((n,), np.float32),
            "rgb_packed": _pack_rgb_float(h["rgb"]).view(np.uint32),
        }

    def extract_fetcher(self, grid):
        """Interface parity with FusionPipeline.extract_fetcher: the TSDF
        result is small — one fetch, subsequent calls subset the dict."""
        h = self.extract_host(grid)

        def fetch(fields=None, prefetch=()):
            return h if fields is None else {k: h[k] for k in fields}
        return fetch

    def grid_metrics(self, grid) -> dict:
        import numpy as np
        C = self.config.base.capacity
        occ = int(np.asarray(jnp.sum(
            (grid.key[:C] >= 0).astype(jnp.int32))))
        return {
            "occupied_voxels": occ,
            "frames": int(grid.frames),
            "overflow_probe": int(grid.overflow_probe),
            "overflow_unique": int(grid.overflow_unique),
        }

    def put_state(self, state: TsdfGrid) -> TsdfGrid:
        return TsdfGrid(**{f: jnp.asarray(getattr(state, f))
                           for f in TsdfGrid._fields})


def tsdf_to_host(result: TsdfExtract) -> dict:
    import numpy as np
    n = int(result.n_valid)
    if n > result.cell.shape[0]:
        raise RuntimeError(
            f"tsdf extract cap too small: {n} surface voxels emitted, cap "
            f"{result.cell.shape[0]} — re-extract with a larger cap")
    return {
        "cell": np.asarray(result.cell[:n]),
        "centroid": np.asarray(result.centroid[:, :n]).T,
        "normal": np.asarray(result.normal[:, :n]).T,
        "tsdf": np.asarray(result.tsdf[:n]),
        "weight": np.asarray(result.weight[:n]),
        "rgb": np.asarray(result.rgb[:, :n]).T,
    }
