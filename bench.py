"""Benchmark: TPU fusion throughput vs the reference-equivalent C++ baseline.

Workload (BASELINE.md north-star): a 100-frame, 640x480 (307,200 pts/frame)
eye-in-hand sweep fused at 1 mm voxel pitch, including periodic normal
refinement and final extraction.  The baseline denominator is the
single-threaded C++ oracle (hifi_fusion_tpu/oracle/oracle_native.cpp) —
algorithmically equivalent to the reference node, whose integrate/refine
path is serial C++ (survey §6: OMP pragmas commented out).

Prints ONE JSON line:
  {"metric": "fusion_throughput", "value": <Mpoints/s on TPU>,
   "unit": "Mpoints/s", "vs_baseline": <TPU / C++-oracle speedup>}

Extra detail goes to stderr.
"""

import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


FRAMES = int(os.environ.get("BENCH_FRAMES", 100))
POINTS = int(os.environ.get("BENCH_POINTS", 640 * 480))
BASELINE_FRAMES = int(os.environ.get("BENCH_BASELINE_FRAMES", 20))
REFINE_EVERY = 8


def bench_config():
    from hifi_fusion_tpu.config import FusionConfig
    return FusionConfig(
        bbox=(-0.35, 0.35, -0.35, 0.35, 0.0, 0.4),
        resolution=(0.001, 0.001, 0.001),      # 1 mm pitch
        capacity_log2=22,
        max_points=POINTS,
        buffer_capacity_log2=23,
        max_refine_candidates=1 << 18,
        max_dependants=12,
        refine_every=REFINE_EVERY,
        z_clip=(0.28, 0.6),
        # ~90-100k distinct 1mm cells per 640x480 frame
        max_unique_per_frame=1 << 17,
        max_hits_per_frame=1 << 20,
        max_hit_voxels=1 << 17,
        max_replay_active=1 << 22,
        max_replay_hits=1 << 22,
    ).validate()


def make_frames(cfg, n_frames):
    from hifi_fusion_tpu.utils.synthetic import make_sweep
    t0 = time.monotonic()
    frames = make_sweep(cfg, n_frames, POINTS, seed=0, noise_sd=3e-4,
                        camera_height=0.4)
    log(f"synthetic sweep: {n_frames}x{POINTS} pts "
        f"({time.monotonic()-t0:.1f}s)")
    return frames


def run_tpu(cfg, frames):
    import jax
    import jax.numpy as jnp
    from hifi_fusion_tpu.models.pipeline import FusionPipeline
    from hifi_fusion_tpu.ops.extract import to_host

    from hifi_fusion_tpu.utils.synthetic import pad_frame

    # persistent compile cache: first bench run pays the (remote) XLA
    # compiles, later runs start warm
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:
        log(f"compilation cache unavailable: {e}")

    log(f"jax devices: {jax.devices()}")
    pipe = FusionPipeline(cfg)

    planar = [pad_frame(f, cfg.max_points) for f in frames]
    pts = jnp.asarray(np.stack([f.points_cam for f in planar]))   # (F,3,N)
    rgb = jnp.asarray(np.stack([f.rgb for f in planar]))
    mask = jnp.asarray(np.stack([f.mask for f in planar]))
    poses = jnp.asarray(np.stack([f.pose for f in planar]))

    # warmup/compile every program in the timed pipeline.
    # NB: a device->host FETCH is the only reliable barrier through the
    # axon tunnel (block_until_ready returns early there).
    t0 = time.monotonic()
    g = pipe.run_sweep(pipe.init(), pts, rgb, mask, poses)
    g = pipe.refine(g)
    r = pipe.extract(g)
    n_vox = int(r.n_valid)
    t_compile = time.monotonic() - t0
    log(f"tpu first run (incl. compile): {t_compile:.1f}s -> {n_vox} vox")

    # steady state
    t0 = time.monotonic()
    g = pipe.run_sweep(pipe.init(), pts, rgb, mask, poses)
    g = pipe.refine(g)
    result = pipe.extract(g)
    n_vox = int(result.n_valid)
    dt = time.monotonic() - t0
    total_pts = len(frames) * POINTS
    log(f"tpu steady run: {dt:.2f}s  {len(frames)/dt:.1f} frames/s  "
        f"{total_pts/dt/1e6:.1f} Mpts/s  -> {n_vox} voxels")
    return total_pts / dt, dt, n_vox


def run_baseline(cfg, frames):
    from hifi_fusion_tpu.oracle import native as oracle_native
    if not oracle_native.available():
        from hifi_fusion_tpu.runtime import native as rt_native
        rt_native.build()
    if not oracle_native.available():
        log("WARNING: C++ oracle unavailable; baseline from Python oracle "
            "on a reduced sweep")
        return run_baseline_python(cfg, frames)
    sub = frames[:BASELINE_FRAMES]
    cc = oracle_native.NativeOracle(cfg)
    t0 = time.monotonic()
    for i, fr in enumerate(sub):
        cc.integrate_frame(fr.points_cam, None, fr.pose)
        if (i + 1) % REFINE_EVERY == 0:
            cc.refine()
    cc.refine()
    n = cc.extract(cap=1 << 21)["cell"].shape[0]
    dt = time.monotonic() - t0
    pts_per_s = len(sub) * POINTS / dt
    log(f"c++ oracle baseline: {len(sub)} frames in {dt:.2f}s  "
        f"{len(sub)/dt:.2f} frames/s  {pts_per_s/1e6:.2f} Mpts/s  "
        f"-> {n} voxels")
    return pts_per_s


def run_baseline_python(cfg, frames):
    from hifi_fusion_tpu.oracle import OracleGrid
    g = OracleGrid(cfg)
    fr = frames[0]
    sub = 20000
    t0 = time.monotonic()
    g.integrate_frame(fr.points_cam[:sub], fr.rgb[:sub], fr.pose)
    g.refine()
    dt = time.monotonic() - t0
    return sub / dt


def main():
    cfg = bench_config()
    frames = make_frames(cfg, FRAMES)
    tpu_pts_per_s, dt, n_vox = run_tpu(cfg, frames)
    base_pts_per_s = run_baseline(cfg, frames)
    vs = tpu_pts_per_s / base_pts_per_s
    print(json.dumps({
        "metric": "fusion_throughput",
        "value": round(tpu_pts_per_s / 1e6, 3),
        "unit": "Mpoints/s",
        "vs_baseline": round(vs, 2),
    }))


if __name__ == "__main__":
    main()
