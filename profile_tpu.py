"""Per-op TPU timing harness for the bench config (not part of the package).

Times the EXACT steady-state programs bench.py dispatches — the K-frame
batched depth-wire integrate with device-tiered dep widths, the
device-tiered refine, the capped extract — using a device->host fetch as
the barrier (block_until_ready returns early through the axon tunnel).

PROF_TRACE=<dir> additionally captures one jax.profiler trace per program
(summarize with tools/xplane_summary.py).  PROF_AB=1 also times the
single-frame and full-width variants for A/B comparison (extra programs =
extra first-touch executable loads on the axon service, so off by
default).
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
    from bench import (BATCH, BATCH_HITS, BATCH_UNIQUE,
                      DW_TIERS, EXTRACT_CAP, REFINE_TIERS, REPLAY_TIERS,
                      STEADY_DW,
                      bench_config, bench_rays)
    from hifi_fusion_tpu.grid import make_grid, quick_counts
    from hifi_fusion_tpu.models.pipeline import FusionPipeline
    from hifi_fusion_tpu.ops.integrate import integrate_frame
    from hifi_fusion_tpu.utils.synthetic import make_depth_sweep

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    cfg = bench_config()
    log(f"devices: {jax.devices()}")
    n_frames = int(os.environ.get("PROF_FRAMES", 16))
    n_frames = max((n_frames // BATCH) * BATCH, BATCH)
    dframes = make_depth_sweep(cfg, n_frames, 640, cfg.max_points // 640,
                               srays=bench_rays(), seed=0,
                               noise_sd=3e-4, camera_height=0.4)
    jrays = jnp.asarray(bench_rays())
    dkw = {} if STEADY_DW is None else dict(dep_width_tiers=DW_TIERS)
    bkw = dict(unique_lanes=min(BATCH_UNIQUE,
                                BATCH * cfg.max_unique_per_frame),
               hit_lanes=min(BATCH_HITS, BATCH * cfg.max_hit_voxels),
               **dkw)
    # K-frame stacks, device-resident (staging excluded from timings)
    stacks = []
    for b in range(n_frames // BATCH):
        fs = dframes[b * BATCH:(b + 1) * BATCH]
        stacks.append((
            jnp.asarray(np.stack([f.depth_q for f in fs])),
            jnp.asarray(np.stack([f.rgb565 for f in fs])),
            jnp.asarray(np.asarray([f.count for f in fs], np.int32)),
            jnp.asarray(np.stack([f.pose for f in fs]))))

    pipe = FusionPipeline(cfg)
    grid = pipe.init()

    def fetch(g):
        return int(np.asarray(g.frames))

    def bstep(g, b):
        # the EXACT session program (models/pipeline.integrate_batch_depth)
        d, r, c, p = stacks[b % len(stacks)]
        return pipe.step_batch_depth(g, d, r, c, p, jrays)

    # compile / first-touch-load both programs
    t0 = time.monotonic()
    grid = bstep(grid, 0)
    fetch(grid)
    log(f"batched integrate compile+run: {time.monotonic()-t0:.1f}s")
    t0 = time.monotonic()
    grid = pipe.refine(grid)
    fetch(grid)
    log(f"tiered refine compile+run: {time.monotonic()-t0:.1f}s")

    # pre-normal steady state
    t0 = time.monotonic()
    for b in range(1, n_frames // BATCH):
        grid = bstep(grid, b)
    fetch(grid)
    dt = time.monotonic() - t0
    nf = n_frames - BATCH
    log(f"integrate pre-normal: {dt/nf*1000:.1f} ms/frame "
        f"({nf*cfg.max_points/dt/1e6:.2f} Mpts/s)")

    # refine over the full pre-normal history (tier-escalates on device)
    t0 = time.monotonic()
    grid = pipe.refine(grid)
    fetch(grid)
    log(f"tiered refine (first, full history): "
        f"{(time.monotonic()-t0)*1000:.1f} ms")

    # steady state WITH dependants: the production cadence
    for r in range(int(os.environ.get("PROF_ROUNDS", 3))):
        t0 = time.monotonic()
        for b in range(n_frames // BATCH):
            grid = bstep(grid, b)
        fetch(grid)
        dt = time.monotonic() - t0
        ti = time.monotonic()
        grid = pipe.refine(grid)
        fetch(grid)
        tr = time.monotonic() - ti
        log(f"round {r}: integrate {dt/n_frames*1000:.1f} ms/frame "
            f"({n_frames*cfg.max_points/dt/1e6:.2f} Mpts/s), "
            f"tiered refine {tr*1000:.1f} ms "
            f"-> {n_frames*cfg.max_points/(dt+tr)/1e6:.2f} Mpts/s "
            f"incl. refine")

    t0 = time.monotonic()
    res = pipe.extract(grid)
    nv = int(np.asarray(res.n_valid))
    log(f"extract cap={EXTRACT_CAP}: {(time.monotonic()-t0)*1000:.1f} ms "
        f"({nv} voxels)")
    log(str(quick_counts(grid, cfg)))

    if os.environ.get("PROF_AB"):
        # A/B variants (extra executable loads): full-width batched
        t0 = time.monotonic()
        d, r, c, p = stacks[0]
        g2 = integrate_frame(grid, d, r, c, p, config=cfg, rays=jrays,
                             **{k: v for k, v in bkw.items()
                                if not k.startswith("dep")})
        fetch(g2)
        log(f"A/B full-width batched (compile+run): "
            f"{time.monotonic()-t0:.1f}s")
        t0 = time.monotonic()
        for b in range(n_frames // BATCH):
            d, r, c, p = stacks[b]
            g2 = integrate_frame(g2, d, r, c, p, config=cfg, rays=jrays,
                                 **{k: v for k, v in bkw.items()
                                    if not k.startswith("dep")})
        fetch(g2)
        dt = time.monotonic() - t0
        log(f"A/B full-width batched: {dt/n_frames*1000:.1f} ms/frame")

    if os.environ.get("PROF_TRACE"):
        # trace the EXACT programs the bench steady state runs
        base = os.environ["PROF_TRACE"]
        with jax.profiler.trace(os.path.join(base, "integrate")):
            grid = bstep(grid, 0)
            fetch(grid)
        with jax.profiler.trace(os.path.join(base, "refine_tiered")):
            grid = pipe.refine(grid)
            fetch(grid)
        with jax.profiler.trace(os.path.join(base, "extract")):
            r2 = pipe.extract(grid)
            np.asarray(r2.n_valid)


if __name__ == "__main__":
    main()
