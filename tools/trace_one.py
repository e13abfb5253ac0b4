"""Trace ONE program (integrate | refine_steady | refine_full | extract)
in its own process — jax.profiler.trace only captures the first session
per process, so profile_tpu.py's three-trace block records only the first.

Usage: python tools/trace_one.py <which> <outdir> [n_warm_frames]
"""
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    which = sys.argv[1]
    out = sys.argv[2]
    n_frames = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench import bench_config, REFINE_TIERS, EXTRACT_CAP
    from hifi_fusion_tpu.grid import make_grid
    from hifi_fusion_tpu.ops.extract import extract
    from hifi_fusion_tpu.ops.integrate import integrate_frame
    from hifi_fusion_tpu.ops.refine import refine_pass
    from hifi_fusion_tpu.utils.synthetic import make_sweep, pad_frame

    cfg = bench_config()
    frames = make_sweep(cfg, n_frames, cfg.max_points, seed=0,
                        noise_sd=3e-4, camera_height=0.4)
    planar = [pad_frame(f, cfg.max_points) for f in frames]
    grid = make_grid(cfg)
    # build steady-state: integrate all, refine on cadence
    for i, f in enumerate(planar):
        grid = integrate_frame(grid, jnp.asarray(f.points_cam),
                               jnp.asarray(f.rgb), jnp.asarray(f.mask),
                               jnp.asarray(f.pose), config=cfg)
        if (i + 1) % 4 == 0:
            grid = refine_pass(grid, config=cfg)
    grid = refine_pass(grid, config=cfg, tiers=REFINE_TIERS)
    np.asarray(grid.frames)
    print(f"steady state built ({n_frames} frames)", flush=True)

    f0 = planar[0]
    t0 = time.monotonic()
    with jax.profiler.trace(out):
        if which == "integrate":
            grid = integrate_frame(grid, jnp.asarray(f0.points_cam),
                                   jnp.asarray(f0.rgb), jnp.asarray(f0.mask),
                                   jnp.asarray(f0.pose), config=cfg)
            np.asarray(grid.frames)
        elif which == "refine_tiered":
            grid = refine_pass(grid, config=cfg, tiers=REFINE_TIERS)
            np.asarray(grid.frames)
        elif which == "refine_full":
            grid = refine_pass(grid, config=cfg)
            np.asarray(grid.frames)
        elif which == "extract":
            r = extract(grid, config=cfg, cap=EXTRACT_CAP)
            np.asarray(r.n_valid)
        else:
            raise SystemExit(f"unknown: {which}")
    print(f"{which}: {time.monotonic()-t0:.3f}s wall (traced)", flush=True)


if __name__ == "__main__":
    main()
