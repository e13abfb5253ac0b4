"""Multi-chip scaling: x-slab spatial decomposition over a device mesh.

The reference is strictly single-process (survey §2 P4: no distributed
backend); its scaling story is "allocate 1 GB and warn the user"
(README.md:12).  Here the grid scales across chips with a *spatial slab
decomposition under shard_map*:

* The x cell range is split into one contiguous core slab per device; each
  device owns an independent voxel hash shard covering its core plus a halo
  of ``k_neighborhood + line_k`` cells on each side.
* Each frame is **replicated** to all devices (a few MB over ICI — far
  cheaper than an all-to-all of routed points at this scale); every device
  masks the frame to its slab+halo and integrates locally.  Halo voxels are
  computed redundantly on both neighbors — and *identically*, because the
  integrate/refine kernels are deterministic functions of the frame stream.
* Refinement is purely local: the halo width is chosen so that every
  quantity affecting a core voxel's output — occupancy within k for its
  PCA gate, line voxels within K feeding its cylinder, and *their* gating
  occupancy within K+k — is exact inside the halo.  Corruption beyond K+k
  cells from the core (e.g. one-sided neighborhoods) can only affect halo
  voxels, which are never emitted.
* Extraction masks each shard to its core slab, so voxels are emitted
  exactly once; dense cell ids are x-major, so concatenating shard outputs
  preserves global sorted order.  The only cross-device communication in
  the whole pipeline is the implicit frame broadcast and the output gather.

This is the spatial-workload analog of context parallelism (survey §5.7):
shard the domain, exchange halos — except the halo exchange is folded into
the replicated ingest, trading a small redundant compute band for zero
steady-state collectives.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

try:                      # jax >= 0.6 stable name
    from jax import shard_map as _shard_map
except ImportError:       # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map as _shard_map


def shard_map(f=None, **kw):
    """shard_map with varying-manual-axes checking off: the hash-probe
    while_loops mix device-varying table state with replicated frame inputs
    in their carries, which the VMA checker rejects; semantics are unaffected
    (per-device blocks are fully independent here)."""
    for name in ("check_vma", "check_rep"):
        try:
            return _shard_map(f, **kw, **{name: False})
        except TypeError:
            continue
    return _shard_map(f, **kw)

from ..config import FusionConfig
from ..grid import GridState, make_grid
from ..models.pipeline import _step_impl
from ..ops import geometry
from ..ops.extract import ExtractResult, extract_impl
from ..ops.integrate import integrate_frame_impl
from ..ops.refine import refine_pass_impl

# the only remaining 2-D grid field (flat slot-major arrays are 1-D)
_PLANAR_GRID_FIELDS = ("buf_pts",)
_PLANAR_EXTRACT_FIELDS = ("centroid", "normal", "sd", "rgb")

_SCALAR_FIELDS = ("buf_count", "overflow_probe", "overflow_buf",
                  "overflow_dep", "overflow_refine", "overflow_unique",
                  "overflow_hits", "reclaimed", "frames")


def _unwrap(g: GridState) -> GridState:
    """Per-device (1,) telemetry scalars -> () for the kernel impls."""
    return g._replace(**{f: getattr(g, f)[0] for f in _SCALAR_FIELDS})


def _wrap(g: GridState) -> GridState:
    return g._replace(**{f: getattr(g, f)[None] for f in _SCALAR_FIELDS})


class ShardedFusion:
    """Slab-sharded fusion pipeline over a 1-D device mesh.

    ``config.capacity`` etc. are *per-shard* budgets.  The public methods
    mirror FusionPipeline; grid state lives sharded across the mesh.
    """

    def __init__(self, config: FusionConfig, n_devices: Optional[int] = None,
                 devices: Optional[Sequence] = None):
        self.config = config.validate()
        if devices is None:
            devices = jax.devices()[:n_devices] if n_devices \
                else jax.devices()
        self.n = len(devices)
        self.mesh = Mesh(np.asarray(devices), ("x",))
        xdim = config.dims[0]
        self.slab_w = -(-xdim // self.n)        # ceil
        # +1 guards against 1-ulp cell-assignment disagreement between the
        # slab mask's XLA arithmetic and the Pallas frontend at cell edges
        self.halo = config.k_neighborhood + config.line_k + 1
        cfg = self.config
        W, halo = self.slab_w, self.halo

        state_spec = GridState(**{
            f: (P(None, "x") if f in _PLANAR_GRID_FIELDS else P("x"))
            for f in GridState._fields})
        extract_spec = ExtractResult(**{
            f: (P(None, "x") if f in _PLANAR_EXTRACT_FIELDS else P("x"))
            for f in ExtractResult._fields})
        rep = P()

        def core_range():
            d = jax.lax.axis_index("x")
            lo = d * W
            hi = jnp.minimum(lo + W, xdim)
            return lo, hi

        @partial(shard_map, mesh=self.mesh, in_specs=(), out_specs=state_spec)
        def _init():
            return _wrap(make_grid(cfg))

        def _slab_mask(pts_cam, mask, pose):
            world = geometry.transform_points(pts_cam, pose)
            cx = geometry.cell_coords(world, cfg)[0]
            lo, hi = core_range()
            return mask & (cx >= lo - halo) & (cx < hi + halo)

        @partial(jax.jit, donate_argnames=("grid",))
        @partial(shard_map, mesh=self.mesh,
                 in_specs=(state_spec, rep, rep, rep, rep),
                 out_specs=state_spec)
        def _step(grid, pts, rgb, mask, pose):
            g = _unwrap(grid)
            g = _step_impl(g, pts, rgb, _slab_mask(pts, mask, pose), pose,
                           cfg)
            return _wrap(g)

        @partial(jax.jit, donate_argnames=("grid",))
        @partial(shard_map, mesh=self.mesh,
                 in_specs=(state_spec, rep, rep, rep, rep),
                 out_specs=state_spec)
        def _integrate(grid, pts, rgb, mask, pose):
            g = _unwrap(grid)
            g = integrate_frame_impl(g, pts, rgb,
                                     _slab_mask(pts, mask, pose), pose,
                                     config=cfg)
            return _wrap(g)

        @partial(jax.jit, donate_argnames=("grid",))
        @partial(shard_map, mesh=self.mesh, in_specs=(state_spec,),
                 out_specs=state_spec)
        def _refine(grid):
            return _wrap(refine_pass_impl(_unwrap(grid), config=cfg))

        @jax.jit
        @partial(shard_map, mesh=self.mesh, in_specs=(state_spec,),
                 out_specs=extract_spec)
        def _extract(grid):
            g = _unwrap(grid)
            lo, hi = core_range()
            r = extract_impl(g, config=cfg, x_range=(lo, hi))
            return r._replace(n_valid=r.n_valid[None])

        @partial(jax.jit, donate_argnames=("grid",))
        @partial(shard_map, mesh=self.mesh,
                 in_specs=(state_spec, rep, rep, rep, rep),
                 out_specs=state_spec)
        def _sweep(grid, pts, rgb, mask, poses):
            g = _unwrap(grid)

            def body(gg, xs):
                p, c, m, t = xs
                return _step_impl(gg, p, c, _slab_mask(p, m, t), t,
                                  cfg), None

            g, _ = jax.lax.scan(body, g, (pts, rgb, mask, poses))
            return _wrap(g)

        self._init_fn = _init
        self._step_fn = _step
        self._integrate_fn = _integrate
        self._refine_fn = _refine
        self._extract_fn = _extract
        self._sweep_fn = _sweep

    # -- public API -------------------------------------------------------
    def init(self) -> GridState:
        return self._init_fn()

    def step(self, grid, pts, rgb, mask, pose) -> GridState:
        return self._step_fn(grid, pts, rgb, mask, pose)

    def integrate(self, grid, pts, rgb, mask, pose) -> GridState:
        return self._integrate_fn(grid, pts, rgb, mask, pose)

    def refine(self, grid) -> GridState:
        return self._refine_fn(grid)

    def run_sweep(self, grid, pts, rgb, mask, poses) -> GridState:
        return self._sweep_fn(grid, pts, rgb, mask, poses)

    def extract(self, grid) -> "ShardedExtract":
        r = self._extract_fn(grid)
        return ShardedExtract(r, self.n, self.config.capacity)

    def metrics(self, grid) -> dict:
        C = self.config.capacity
        key2 = grid.key.reshape(self.n, -1)[:, :C]
        occ2 = grid.vstats.reshape(self.n, -1)[:, 6::7][:, :C] > 0
        nf2 = grid.normal_found.reshape(self.n, -1)[:, :C]
        occ = int(jnp.sum(occ2))
        used = int(jnp.sum(key2 != -1))
        return {
            "devices": self.n,
            "occupied_voxels_incl_halo": occ,
            "slots_used": used,
            "hash_load_factor_max": float(
                jnp.max(jnp.sum(key2 != -1, axis=1)) / C),
            "normals_found_incl_halo": int(jnp.sum(nf2)),
            "overflow_probe": int(jnp.sum(grid.overflow_probe)),
            "overflow_buffer": int(jnp.sum(grid.overflow_buf)),
            "overflow_dependants": int(jnp.sum(grid.overflow_dep)),
            "overflow_refine": int(jnp.sum(grid.overflow_refine)),
            "frames": int(grid.frames[0]),
        }


class ShardedExtract:
    """Device-sharded extraction result + host assembly."""

    def __init__(self, result: ExtractResult, n_shards: int, capacity: int):
        self.result = result
        self.n_shards = n_shards
        self.capacity = capacity

    @property
    def n_valid(self):
        return jnp.sum(self.result.n_valid)

    def to_host(self) -> dict:
        """Concatenate per-shard core emissions (already globally sorted:
        dense cell ids are x-major and slabs ascend in x)."""
        r = self.result
        n_per = np.asarray(r.n_valid)
        parts = {k: [] for k in ("cell", "centroid", "normal", "sd",
                                 "mean_dist", "sd_dist", "count", "rgb",
                                 "n_pts")}
        for s in range(self.n_shards):
            sl = slice(s * self.capacity, s * self.capacity + int(n_per[s]))
            parts["cell"].append(np.asarray(r.cell[sl]))
            parts["centroid"].append(np.asarray(r.centroid[:, sl]).T)
            parts["normal"].append(np.asarray(r.normal[:, sl]).T)
            parts["sd"].append(np.asarray(r.sd[:, sl]).T)
            parts["mean_dist"].append(np.asarray(r.mean_dist[sl]))
            parts["sd_dist"].append(np.asarray(r.sd_dist[sl]))
            parts["count"].append(np.asarray(r.count[sl]))
            parts["rgb"].append(np.asarray(r.rgb[:, sl]).T)
            parts["n_pts"].append(np.asarray(r.n_pts[sl]))
        return {k: np.concatenate(v) for k, v in parts.items()}
