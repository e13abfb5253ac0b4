"""Trace (lower WITHOUT compiling) every bench-config program.

Static-shape bugs — scatter-tail overflows, budget mismatches, bad lane
arithmetic — surface at TRACE time as Python asserts, long before the
multi-minute TPU compile.  This runs the full bench-config trace set on
the CPU backend in seconds; warm_cache.py and any device-path edit should
run it first (the round-2 bufdrop scatter bug cost a 250 s TPU compile
before failing exactly this way).

Usage: python tools/trace_check.py
"""

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from bench import bench_config, BATCH, REFINE_TIERS, EXTRACT_CAP
    from hifi_fusion_tpu.grid import make_grid, _quick_counts
    from hifi_fusion_tpu.ops.extract import extract
    from hifi_fusion_tpu.ops.integrate import integrate_frame
    from hifi_fusion_tpu.ops.refine import refine_pass

    cfg = bench_config()
    grid = jax.eval_shape(lambda: make_grid(cfg))
    N = cfg.max_points
    pts = jax.ShapeDtypeStruct((3, N), jnp.float32)
    rgb = jax.ShapeDtypeStruct((3, N), jnp.float32)
    mask = jax.ShapeDtypeStruct((N,), jnp.bool_)
    pose = jax.ShapeDtypeStruct((4, 4), jnp.float32)

    K = max(BATCH, 1)
    bpts = jax.ShapeDtypeStruct((K, 3, N), jnp.float32)
    brgb = jax.ShapeDtypeStruct((K, 3, N), jnp.float32)
    bmask = jax.ShapeDtypeStruct((K, N), jnp.bool_)
    bpose = jax.ShapeDtypeStruct((K, 4, 4), jnp.float32)

    checks = [
        ("integrate_frame", lambda: integrate_frame.lower(
            grid, pts, rgb, mask, pose, config=cfg)),
        (f"integrate_frame batched K={K}", lambda: integrate_frame.lower(
            grid, bpts, brgb, bmask, bpose, config=cfg)),
        ("refine_pass full", lambda: refine_pass.lower(grid, config=cfg)),
        ("refine_pass tiered", lambda: refine_pass.lower(
            grid, config=cfg, tiers=REFINE_TIERS)),
        ("extract capped", lambda: extract.lower(
            grid, config=cfg, cap=EXTRACT_CAP)),
        ("quick_counts", lambda: _quick_counts.lower(grid, cfg.capacity)),
    ]
    for name, fn in checks:
        t0 = time.monotonic()
        fn()
        print(f"trace ok: {name} ({time.monotonic()-t0:.1f}s)", flush=True)
    print("ALL TRACES OK")


if __name__ == "__main__":
    main()
