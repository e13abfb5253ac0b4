"""Trace the FIRST refine (the full-fallback-budget pass) at bench state.

The 100-frame bench pays one ~5 s refine at frame 4 (the whole pre-normal
history, every surface cell a candidate) — ~50 ms/frame of amortized cost.
This captures a trace of exactly that dispatch for xplane_summary.py.

Usage: PROF_TRACE=/tmp/first_refine python tools/trace_first_refine.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from bench import (BATCH, BATCH_HITS, BATCH_UNIQUE,
                       DW_TIERS, REFINE_TIERS, REPLAY_TIERS, STEADY_DW,
                       bench_config,
                       bench_rays)
    from hifi_fusion_tpu.grid import make_grid, quick_counts
    from hifi_fusion_tpu.ops.integrate import integrate_frame
    from hifi_fusion_tpu.ops.refine import refine_pass
    from hifi_fusion_tpu.utils.synthetic import make_depth_sweep

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(root, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    cfg = bench_config()
    log(f"devices: {jax.devices()}")
    dframes = make_depth_sweep(cfg, BATCH, 640, cfg.max_points // 640,
                               srays=bench_rays(), seed=0,
                               noise_sd=3e-4, camera_height=0.4)
    jrays = jnp.asarray(bench_rays())
    dkw = {} if STEADY_DW is None else dict(dep_width_tiers=DW_TIERS)
    bkw = dict(unique_lanes=min(BATCH_UNIQUE,
                                BATCH * cfg.max_unique_per_frame),
               hit_lanes=min(BATCH_HITS, BATCH * cfg.max_hit_voxels),
               **dkw)
    stack = (jnp.asarray(np.stack([f.depth_q for f in dframes])),
             jnp.asarray(np.stack([f.rgb565 for f in dframes])),
             jnp.asarray(np.asarray([f.count for f in dframes], np.int32)),
             jnp.asarray(np.stack([f.pose for f in dframes])))

    grid = make_grid(cfg)
    d, r, c, p = stack
    grid = integrate_frame(grid, d, r, c, p, config=cfg, rays=jrays, **bkw)
    np.asarray(grid.frames)
    log("integrated 4 frames (bench first-refine state)")

    # timed un-traced first (trace overhead excluded)
    import copy
    t0 = time.monotonic()
    grid2 = refine_pass(grid, config=cfg, tiers=REFINE_TIERS,
                           replay_tiers=REPLAY_TIERS)
    np.asarray(grid2.frames)
    log(f"first refine wall: {time.monotonic()-t0:.2f}s")
    log(str({k: v for k, v in quick_counts(grid2, cfg).items()
             if "overflow" in k or k in ("normals_found", "buffered_points",
                                         "refine_candidates")}))

    base = os.environ.get("PROF_TRACE", "/tmp/first_refine")
    # rebuild the pre-refine state for an identical traced dispatch
    grid = make_grid(cfg)
    grid = integrate_frame(grid, d, r, c, p, config=cfg, rays=jrays, **bkw)
    np.asarray(grid.frames)
    with jax.profiler.trace(base):
        grid = refine_pass(grid, config=cfg, tiers=REFINE_TIERS,
                           replay_tiers=REPLAY_TIERS)
        np.asarray(grid.frames)
    log(f"trace written to {base}")


if __name__ == "__main__":
    main()
