"""Warm the persistent XLA compile cache for every TPU entry point.

On the axon TPU service, cold-compiling any op with a called subcomputation
(sort, scatter, while_loop) costs ~100 s EACH regardless of size (measured
2026-08-16: argsort@1024 = 108 s, while_loop@trivial = 100 s, cumsum = 2 s),
so the fusion programs (~15 such ops each) take tens of minutes cold and
<1 s warm.  Run this once after any libtpu/backend change; bench.py,
profile_tpu.py and the driver's compile checks then start warm.

Programs warmed:
  1. integrate_frame / refine_pass / extract at the bench config
     (shared by bench.py, bench.py --verify, profile_tpu.py)
  2. the __graft_entry__.entry() flagship fusion step
"""

import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, ROOT)


def log(*a):
    print(*a, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    log(f"devices: {jax.devices()}")

    from bench import bench_config
    from hifi_fusion_tpu.grid import make_grid
    from hifi_fusion_tpu.ops.extract import extract
    from hifi_fusion_tpu.ops.integrate import integrate_frame
    from hifi_fusion_tpu.ops.refine import refine_pass

    cfg = bench_config()
    grid = make_grid(cfg)
    N = cfg.max_points
    pts = jnp.zeros((3, N), jnp.float32)
    rgb = jnp.zeros((3, N), jnp.float32)
    mask = jnp.zeros((N,), bool)
    pose = jnp.eye(4, dtype=jnp.float32)

    t0 = time.monotonic()
    grid = integrate_frame(grid, pts, rgb, mask, pose, config=cfg)
    np.asarray(grid.frames)
    log(f"integrate_frame@bench: {time.monotonic()-t0:.1f}s")
    # the packed wire-format variant (bench.py BENCH_PACKED default)
    t0 = time.monotonic()
    grid = integrate_frame(
        grid, jnp.zeros((3, N), jnp.uint16), jnp.zeros((N,), jnp.uint32),
        jnp.asarray(np.int32(0)), pose, config=cfg,
        quant=jnp.asarray(np.asarray([[1.0, 1.0, 1.0],
                                      [0.0, 0.0, 0.0]], np.float32)))
    np.asarray(grid.frames)
    log(f"integrate_frame@bench packed-u16: {time.monotonic()-t0:.1f}s")
    # the sensor-native depth wire (bench.py BENCH_WIRE default) with the
    # device-tiered dep-width dispatch bench.py issues (dep_width_tiers)
    from bench import DW_TIERS, STEADY_DW
    from hifi_fusion_tpu.utils.synthetic import camera_rays
    jrays = jnp.asarray(camera_rays(640, N // 640))
    dkw = {} if STEADY_DW is None else dict(dep_width_tiers=DW_TIERS)
    t0 = time.monotonic()
    grid = integrate_frame(grid, jnp.zeros((N,), jnp.uint16),
                           jnp.zeros((N,), jnp.uint16),
                           jnp.asarray(np.int32(0)), pose, config=cfg,
                           rays=jrays, **dkw)
    np.asarray(grid.frames)
    log(f"integrate_frame@bench depth dep_width_tiers={DW_TIERS}: "
        f"{time.monotonic()-t0:.1f}s")
    from bench import BATCH
    if BATCH > 1:
        from bench import BATCH_UNIQUE, BATCH_HITS, BATCH_PAIRS, WIRE
        bkw = dict(unique_lanes=min(BATCH_UNIQUE,
                                    BATCH * cfg.max_unique_per_frame),
                   hit_lanes=min(BATCH_HITS, BATCH * cfg.max_hit_voxels),
                   pair_lanes=min(BATCH_PAIRS,
                                  BATCH * cfg.max_stream_pairs))
        poses = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32),
                                 (BATCH, 4, 4))
        kw = dict(bkw, **dkw)
        t0 = time.monotonic()
        if WIRE == "depth":
            grid = integrate_frame(
                grid, jnp.zeros((BATCH, N), jnp.uint16),
                jnp.zeros((BATCH, N), jnp.uint16),
                jnp.zeros((BATCH,), jnp.int32), poses,
                config=cfg, rays=jrays, **kw)
        else:
            grid = integrate_frame(
                grid, jnp.zeros((BATCH, 3, N), jnp.float32),
                jnp.zeros((BATCH, 3, N), jnp.float32),
                jnp.zeros((BATCH, N), bool), poses, config=cfg, **kw)
        np.asarray(grid.frames)
        log(f"integrate_frame@bench batched K={BATCH} wire={WIRE} "
            f"dep_width_tiers={DW_TIERS}: {time.monotonic()-t0:.1f}s")
    # the device-tiered refine program bench.py dispatches every cadence
    # (steady + mid + full-fallback branches in ONE executable), plus the
    # plain full-budget program (--verify / session / library path)
    from bench import REFINE_TIERS, REPLAY_TIERS, EXTRACT_CAP
    t0 = time.monotonic()
    grid = refine_pass(grid, config=cfg, tiers=REFINE_TIERS,
                           replay_tiers=REPLAY_TIERS)
    np.asarray(grid.frames)
    log(f"refine_pass@bench tiers={REFINE_TIERS}: "
        f"{time.monotonic()-t0:.1f}s")
    t0 = time.monotonic()
    grid = refine_pass(grid, config=cfg)
    np.asarray(grid.frames)
    log(f"refine_pass@bench full: {time.monotonic()-t0:.1f}s")
    t0 = time.monotonic()
    r = extract(grid, config=cfg, cap=EXTRACT_CAP)
    np.asarray(r.n_valid)
    log(f"extract@bench cap={EXTRACT_CAP}: {time.monotonic()-t0:.1f}s")
    t0 = time.monotonic()
    from hifi_fusion_tpu.grid import quick_counts
    quick_counts(grid, cfg)
    log(f"quick_counts: {time.monotonic()-t0:.1f}s")

    t0 = time.monotonic()
    import __graft_entry__
    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    log(f"entry() flagship step: {time.monotonic()-t0:.1f}s")
    log("cache warm")


if __name__ == "__main__":
    main()
