"""First-touch executable-load experiment (PERF.md warm-start section).

In a fresh process, every program pays a first-touch load on the axon
service even with a warm persistent compile cache (measured 3.5-90 s per
program, varying run to run).  This tool measures whether issuing the
first dispatches CONCURRENTLY (one thread per program) overlaps those
loads — if yes, FusionSession can preload its program set at construction
in parallel and cut live warm-start latency.

LOAD_MODE=serial|parallel (default parallel).
"""

import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main():
    import jax
    import jax.numpy as jnp
    from bench import BATCH, bench_config, bench_rays
    from hifi_fusion_tpu.models.pipeline import FusionPipeline

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(root, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    mode = os.environ.get("LOAD_MODE", "parallel")
    cfg = bench_config()
    pipe = FusionPipeline(cfg)
    N = cfg.max_points
    jrays = jnp.asarray(bench_rays())
    pose = jnp.eye(4, dtype=jnp.float32)
    poses = jnp.broadcast_to(pose, (BATCH, 4, 4))
    print(f"devices: {jax.devices()}  mode={mode}", flush=True)

    # three throwaway grids so the three programs touch disjoint state
    grids = [pipe.init() for _ in range(3)]
    jax.block_until_ready(grids[-1].frames)

    def t_int():
        t0 = time.monotonic()
        g = pipe.step_batch_depth(
            grids[0], jnp.zeros((BATCH, N), jnp.uint16),
            jnp.zeros((BATCH, N), jnp.uint16),
            jnp.zeros((BATCH,), jnp.int32), poses, jrays)
        np.asarray(g.frames)
        print(f"  integrate first-touch: {time.monotonic()-t0:.1f}s",
              flush=True)

    def t_ref():
        t0 = time.monotonic()
        g = pipe.refine(grids[1])
        np.asarray(g.frames)
        print(f"  refine    first-touch: {time.monotonic()-t0:.1f}s",
              flush=True)

    def t_ext():
        t0 = time.monotonic()
        r = pipe.extract(grids[2])
        np.asarray(r.n_valid)
        print(f"  extract   first-touch: {time.monotonic()-t0:.1f}s",
              flush=True)

    t0 = time.monotonic()
    jobs = [t_int, t_ref, t_ext]
    if mode == "parallel":
        ts = [threading.Thread(target=f) for f in jobs]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
    else:
        for f in jobs:
            f()
    print(f"total first-touch ({mode}): {time.monotonic()-t0:.1f}s",
          flush=True)


if __name__ == "__main__":
    main()
