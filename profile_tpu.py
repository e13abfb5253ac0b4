"""Per-op TPU timing harness for the bench config (not part of the package).

Times integrate_frame and refine_pass separately, steady-state, using a
device->host fetch as the barrier (block_until_ready returns early through
the axon tunnel).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from bench import bench_config
    from hifi_fusion_tpu.grid import make_grid, grid_metrics
    from hifi_fusion_tpu.ops.integrate import integrate_frame
    from hifi_fusion_tpu.ops.refine import refine_pass
    from hifi_fusion_tpu.utils.synthetic import make_sweep, pad_frame

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    cfg = bench_config()
    log(f"devices: {jax.devices()}")
    n_frames = int(os.environ.get("PROF_FRAMES", 8))
    # the bench steady-state ingest: depth wire + narrow dep-width variant
    from bench import STEADY_DW, bench_rays
    from hifi_fusion_tpu.utils.synthetic import make_depth_sweep
    dframes = make_depth_sweep(cfg, n_frames, 640, cfg.max_points // 640,
                               srays=bench_rays(), seed=0,
                               noise_sd=3e-4, camera_height=0.4)
    jrays = jnp.asarray(bench_rays())
    depth = [jnp.asarray(f.depth_q) for f in dframes]
    rgb5 = [jnp.asarray(f.rgb565) for f in dframes]
    cnt = [jnp.asarray(np.int32(f.count)) for f in dframes]
    pose = [jnp.asarray(f.pose) for f in dframes]
    dkw = {} if STEADY_DW is None else dict(dep_width=STEADY_DW)

    grid = make_grid(cfg)

    def fetch(g):
        return int(np.asarray(g.frames))

    def istep(g, i, **kw):
        return integrate_frame(g, depth[i], rgb5[i], cnt[i], pose[i],
                               config=cfg, rays=jrays, **kw)

    # compile both programs
    t0 = time.monotonic()
    grid = istep(grid, 0, **dkw)
    fetch(grid)
    log(f"integrate compile+run: {time.monotonic()-t0:.1f}s")
    t0 = time.monotonic()
    grid = refine_pass(grid, config=cfg)
    fetch(grid)
    log(f"refine compile+run: {time.monotonic()-t0:.1f}s")

    # steady state: integrate all frames
    t0 = time.monotonic()
    for i in range(1, n_frames):
        grid = istep(grid, i, **dkw)
    fetch(grid)
    dt = time.monotonic() - t0
    log(f"integrate steady: {dt/(n_frames-1)*1000:.1f} ms/frame "
        f"({(n_frames-1)*cfg.max_points/dt/1e6:.1f} Mpts/s)")

    # refine steady state (full replay budget — the first pass)
    t0 = time.monotonic()
    grid = refine_pass(grid, config=cfg)
    fetch(grid)
    log(f"refine steady: {(time.monotonic()-t0)*1000:.1f} ms")

    # the bench's steady-state refine variant (full warming covers it)
    from bench import STEADY_BUDGETS as _SB
    t0 = time.monotonic()
    grid = refine_pass(grid, config=cfg, **_SB)
    fetch(grid)
    log(f"refine steady-budgets #1: {(time.monotonic()-t0)*1000:.1f} ms")
    t0 = time.monotonic()
    grid = refine_pass(grid, config=cfg, **_SB)
    fetch(grid)
    log(f"refine steady-budgets #2: {(time.monotonic()-t0)*1000:.1f} ms")

    # integrate AFTER normals exist (dependant stream now active)
    t0 = time.monotonic()
    for i in range(n_frames):
        grid = istep(grid, i, **dkw)
    fetch(grid)
    dt = time.monotonic() - t0
    log(f"integrate w/ deps (dep_width={STEADY_DW}): "
        f"{dt/n_frames*1000:.1f} ms/frame "
        f"({n_frames*cfg.max_points/dt/1e6:.1f} Mpts/s)")
    # A/B: the full-width variant on the same state
    t0 = time.monotonic()
    for i in range(n_frames):
        grid = istep(grid, i)
    fetch(grid)
    dt = time.monotonic() - t0
    log(f"integrate w/ deps (full width): {dt/n_frames*1000:.1f} ms/frame "
        f"({n_frames*cfg.max_points/dt/1e6:.1f} Mpts/s)")
    log(str(grid_metrics(grid, cfg)))

    if os.environ.get("PROF_TRACE"):
        # trace the EXACT program variants the bench steady state runs:
        # per-frame integrate, steady-budget refine, capped extract
        # (bench.py STEADY_BUDGETS / EXTRACT_CAP)
        from bench import STEADY_BUDGETS, EXTRACT_CAP
        from hifi_fusion_tpu.ops.extract import extract
        base = os.environ["PROF_TRACE"]
        with jax.profiler.trace(os.path.join(base, "integrate")):
            g2 = istep(grid, 0, **dkw)
            fetch(g2)
        with jax.profiler.trace(os.path.join(base, "refine_steady")):
            g2 = refine_pass(g2, config=cfg, **STEADY_BUDGETS)
            fetch(g2)
        with jax.profiler.trace(os.path.join(base, "refine_full")):
            g2 = refine_pass(g2, config=cfg)
            fetch(g2)
        with jax.profiler.trace(os.path.join(base, "extract")):
            r = extract(g2, config=cfg, cap=EXTRACT_CAP)
            np.asarray(r.n_valid)


if __name__ == "__main__":
    main()
