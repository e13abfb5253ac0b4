"""FusionPipeline: the flagship device-side model of the framework.

Composes the integrate and refine kernels into a single jitted *fusion step*
— the TPU equivalent of the reference's three free-running worker threads
(addPoints / updateStates / cleanGrid, FUSION.cpp:166-168, 218-325).  Where
the reference refines on a 5-second wall-clock timer racing the integrate
thread behind a mutex (FUSION.cpp:301-325), here refinement is *fused into
the step* on a deterministic frame cadence via ``lax.cond``: same grid, one
program, no locks, reproducible output.

Two execution modes:

* ``step``      — one frame per call (used by the live ``FusionSession``;
                  JAX's async dispatch pipelines host feeding with device
                  compute, replacing the reference's producer/consumer
                  deques, FUSION.cpp:130-131).
* ``run_sweep`` — ``lax.scan`` over a stacked sweep held in HBM (benchmark
                  mode: zero host round-trips between frames).

All entry points are module-level jits with the (hashable, frozen)
``FusionConfig`` as a static argument, so compilations are shared across
pipeline/session instances with equal configs.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import FusionConfig
from ..grid import GridState, make_grid
from ..ops.extract import ExtractResult, extract
from ..ops.integrate import integrate_frame, integrate_frame_impl
from ..ops.refine import refine_pass, refine_pass_impl


def _step_impl(grid: GridState, points_cam, rgb, mask, pose,
               config: FusionConfig, offset=None, pre_transformed=False,
               extra_dropped=None) -> GridState:
    grid = integrate_frame_impl(grid, points_cam, rgb, mask, pose,
                                config=config, offset=offset,
                                pre_transformed=pre_transformed,
                                extra_dropped=extra_dropped,
                                dep_width_tiers=config.dep_width_tiers)
    if config.refine_every > 0:
        grid = jax.lax.cond(
            (grid.frames % config.refine_every) == 0,
            lambda g: refine_pass_impl(g, config=config, offset=offset,
                                       tiers=config.refine_tiers or None),
            lambda g: g,
            grid)
    return grid


@partial(jax.jit, static_argnames=("config",), donate_argnames=("grid",))
def fusion_step(grid: GridState, points_cam, rgb, mask, pose,
                *, config: FusionConfig) -> GridState:
    """Integrate one frame; refine on the configured frame cadence."""
    return _step_impl(grid, points_cam, rgb, mask, pose, config)


@partial(jax.jit, static_argnames=("config",), donate_argnames=("grid",))
def fusion_step_depth(grid: GridState, depth_q, rgb565, count, pose, rays,
                      *, config: FusionConfig) -> GridState:
    """One sensor-native depth frame (u16 z-depth + rgb565 + count prefix;
    see ops/integrate._unpack_inputs): unprojected on device against the
    resident ``rays`` table, then the same integrate+cadenced-refine step
    as ``fusion_step``."""
    grid = integrate_frame_impl(grid, depth_q, rgb565, count, pose,
                                config=config, rays=rays,
                                dep_width_tiers=config.dep_width_tiers)
    if config.refine_every > 0:
        grid = jax.lax.cond(
            (grid.frames % config.refine_every) == 0,
            lambda g: refine_pass_impl(g, config=config,
                                       tiers=config.refine_tiers or None),
            lambda g: g,
            grid)
    return grid


@partial(jax.jit, static_argnames=("config",), donate_argnames=("grid",))
def fusion_sweep(grid: GridState, points_cam, rgb, mask, poses,
                 *, config: FusionConfig) -> GridState:
    """Scan a stacked (F, ...) sweep entirely on-device."""

    def body(g, xs):
        p, c, m, t = xs
        return _step_impl(g, p, c, m, t, config), None

    grid, _ = jax.lax.scan(body, grid, (points_cam, rgb, mask, poses))
    return grid


class FusionPipeline:
    """Convenience bundle binding a config to the jitted entry points."""

    def __init__(self, config: FusionConfig):
        self.config = config.validate()

    def init(self) -> GridState:
        return make_grid(self.config)

    def step(self, grid: GridState, points_cam, rgb, mask, pose
             ) -> GridState:
        return fusion_step(grid, points_cam, rgb, mask, pose,
                           config=self.config)

    def step_depth(self, grid: GridState, depth_q, rgb565, count, pose,
                   rays) -> GridState:
        return fusion_step_depth(grid, depth_q, rgb565, count, pose, rays,
                                 config=self.config)

    def integrate(self, grid: GridState, points_cam, rgb, mask, pose
                  ) -> GridState:
        return integrate_frame(grid, points_cam, rgb, mask, pose,
                               config=self.config)

    def refine(self, grid: GridState) -> GridState:
        return refine_pass(grid, config=self.config)

    def extract(self, grid: GridState) -> ExtractResult:
        return extract(grid, config=self.config)

    def run_sweep(self, grid: GridState, points_cam, rgb, mask, poses
                  ) -> GridState:
        return fusion_sweep(grid, points_cam, rgb, mask, poses,
                            config=self.config)

    # -- host-facing interface shared with the sharded adapter
    #    (runtime/session.py drives either through these) ---------------
    def extract_host(self, grid: GridState) -> dict:
        from ..ops.extract import to_host
        return to_host(self.extract(grid))

    def grid_metrics(self, grid: GridState) -> dict:
        from ..grid import grid_metrics
        return grid_metrics(grid, self.config)

    def put_state(self, state: GridState) -> GridState:
        """Host checkpoint arrays -> device grid (single-device: trivial)."""
        import jax.numpy as _jnp
        return GridState(**{f: _jnp.asarray(getattr(state, f))
                            for f in GridState._fields})
