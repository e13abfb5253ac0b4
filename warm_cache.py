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

    from bench import BATCH, bench_config
    from hifi_fusion_tpu.grid import grid_metrics, quick_counts
    from hifi_fusion_tpu.models.pipeline import FusionPipeline
    from hifi_fusion_tpu.ops.integrate import integrate_frame
    from hifi_fusion_tpu.utils.synthetic import camera_rays

    # warm exactly the jitted callables the PRODUCT session dispatches
    # (bench.py drives FusionSession since round 3, so these are also the
    # bench programs): batched + single depth step, tiered refine, capped
    # extract, metrics.
    cfg = bench_config()
    pipe = FusionPipeline(cfg)
    grid = pipe.init()
    N = cfg.max_points
    pose = jnp.eye(4, dtype=jnp.float32)
    jrays = jnp.asarray(camera_rays(640, N // 640))

    if BATCH > 1:
        poses = jnp.broadcast_to(pose, (BATCH, 4, 4))
        t0 = time.monotonic()
        grid = pipe.step_batch_depth(
            grid, jnp.zeros((BATCH, N), jnp.uint16),
            jnp.zeros((BATCH, N), jnp.uint16),
            jnp.zeros((BATCH,), jnp.int32), poses, jrays)
        np.asarray(grid.frames)
        log(f"step_batch_depth@bench K={BATCH}: {time.monotonic()-t0:.1f}s")
    t0 = time.monotonic()
    grid = pipe.step_depth(grid, jnp.zeros((N,), jnp.uint16),
                           jnp.zeros((N,), jnp.uint16),
                           jnp.asarray(np.int32(0)), pose, jrays)
    np.asarray(grid.frames)
    log(f"step_depth@bench (fused tiered refine): "
        f"{time.monotonic()-t0:.1f}s")
    t0 = time.monotonic()
    grid = pipe.refine(grid)
    np.asarray(grid.frames)
    log(f"refine@bench tiers={cfg.refine_tiers}: "
        f"{time.monotonic()-t0:.1f}s")
    t0 = time.monotonic()
    r = pipe.extract(grid)
    np.asarray(r.n_valid)
    log(f"extract@bench cap={cfg.extract_cap}: {time.monotonic()-t0:.1f}s")
    t0 = time.monotonic()
    grid_metrics(grid, cfg)
    quick_counts(grid, cfg)
    log(f"grid_metrics+quick_counts: {time.monotonic()-t0:.1f}s")
    # --verify's wire ingest variants (planar f32 + single-frame depth
    # through the raw integrate_frame entry point)
    t0 = time.monotonic()
    grid2 = pipe.init()
    grid2 = integrate_frame(grid2, jnp.zeros((3, N), jnp.float32),
                            jnp.zeros((3, N), jnp.float32),
                            jnp.zeros((N,), bool), pose, config=cfg)
    grid2 = integrate_frame(grid2, jnp.zeros((N,), jnp.uint16),
                            jnp.zeros((N,), jnp.uint16),
                            jnp.asarray(np.int32(0)), pose, config=cfg,
                            rays=jrays)
    np.asarray(grid2.frames)
    log(f"integrate_frame verify variants: {time.monotonic()-t0:.1f}s")

    t0 = time.monotonic()
    import __graft_entry__
    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    log(f"entry() flagship step: {time.monotonic()-t0:.1f}s")
    log("cache warm")


if __name__ == "__main__":
    main()
