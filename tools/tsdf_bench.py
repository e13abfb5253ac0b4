"""TSDF config-5 measurement (BASELINE.json: "TSDF-weighted fusion variant
at sub-mm pitch with weighted-average integration and surface-voxel
extraction"; PERF.md §12).

Replays the bench sweep (96 x 640x480 depth frames, the sensor-native
wire) through a ``FusionSession(model="tsdf")`` at sub-mm pitch and
reports end-to-end Mpts/s including extraction + PCD/CSV export, with
zero-overflow assertion — the same protocol as bench.py's flagship
number, minus refine (TSDF has no normal-refine phase; its surface
normals come from the TSDF gradient at extraction).

Env: TSDF_RES (0.0008 m), TSDF_FRAMES (96), TSDF_CAP_LOG2 (23).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main():
    import dataclasses
    import tempfile

    import jax
    from bench import FRAMES, bench_config, bench_rays, make_frames
    from hifi_fusion_tpu.runtime.session import FusionSession

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(root, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    res = float(os.environ.get("TSDF_RES", 0.0008))
    n = int(os.environ.get("TSDF_FRAMES", 96))
    cap = int(os.environ.get("TSDF_CAP_LOG2", 24))
    # Unique TSDF sample cells per frame at 0.8 mm pitch measured ~1.07M
    # (a first run's overflow_unique counter: 52.0M over 96 frames against
    # the old 4*2^17 budget) — samples land ~one cell apart, so the budget
    # is ~0.4*S*N, nothing like the flagship's ~0.1*N surface uniques.
    uniq = int(os.environ.get("TSDF_UNIQ", 1 << 19))   # U = 4*uniq = 2^21
    # sample spacing <= pitch (11 samples across +-4 mm = 0.8 mm) so the
    # truncation band has no radial gaps at this resolution
    samples = int(os.environ.get("TSDF_SAMPLES", 11))
    # K-frame batched ingest (models/tsdf.integrate_tsdf_batch_depth):
    # the full-table costs (the 503 MB vstats rewrite, key-table
    # machinery — ~60% of the 562 ms/frame single-step module, trace
    # 2026-08-21) run once per batch, and every U-shaped op (hash insert,
    # slot sort, scatter batch) shrinks with this budget: measured end-
    # to-end 0.76 Mpts/s at U=6.29M, 1.76 at 3.1M, 2.16 at 2.1M — all
    # zero-overflow (the K=8 union of ~1.07M cells/frame band cells
    # overlaps heavily).  Guarded by overflow_unique; raise on overflow.
    batch_unique = int(os.environ.get("TSDF_BATCH_UNIQUE", 2 << 20))
    base = bench_config()
    frames = make_frames(base, max(n, 2), arc_frames=FRAMES)[:n]
    cfg = dataclasses.replace(
        base, resolution=(res, res, res), capacity_log2=cap,
        max_unique_per_frame=uniq, refine_every=0,
        # the TSDF band surface at 0.8 mm (measured 290,298 voxels)
        # outgrows the flagship's extract cap; keep its own margin
        extract_cap=9 << 15).validate()
    rays = bench_rays()
    host = [(np.asarray(f.depth_q), np.asarray(f.rgb565),
             np.asarray(f.pose, np.float32)) for f in frames]
    pts = base.max_points

    with FusionSession(cfg, output_dir=tempfile.mkdtemp(prefix="tsdf_"),
                       queue_depth=n + 1, model="tsdf",
                       batch_fill_wait=2.0,
                       model_params={"n_samples": samples,
                                     "batch_unique": batch_unique}) as sess:
        t0 = time.monotonic()
        warm_s = sess.warm(rays=rays, extract=True, planar=False)
        print(f"warm: {warm_s:.1f}s", flush=True)
        sess.start()
        t0 = time.monotonic()
        for dq, r565, pose in host:
            sess.push_depth_frame(dq, r565, pose, rays=rays)
        assert sess.drain(timeout=600), "tsdf session failed to drain"
        r = sess.process(ascii_mode=False)
        dt = time.monotonic() - t0
        m = sess.metrics()
    ovf = {k: v for k, v in r["grid_metrics"].items()
           if k.startswith("overflow") and v}
    assert not ovf, f"tsdf overflow: {ovf} — raise TSDF_CAP_LOG2"
    assert m["frames_integrated"] == n
    out = {"model": "tsdf", "pitch_mm": res * 1e3, "frames": n,
           "mpts_per_s": round(n * pts / dt / 1e6, 3),
           "seconds": round(dt, 2), "surface_voxels": r["n_points"],
           "warm_s": round(warm_s, 1)}

    # ---- denominator: the single-threaded C++ TSDF oracle over the same
    # sweep (VERDICT r4 missing #5 tail / next #6: config 5 had no
    # vs_baseline).  Same band-integration semantics, same canonical
    # dequantized points, time-boxed with conservative extrapolation
    # exactly like bench.py's flagship baseline.
    from bench import baseline_points
    from hifi_fusion_tpu.models.tsdf import TsdfConfig
    from hifi_fusion_tpu.oracle.native import (NativeTsdfOracle,
                                               tsdf_available)
    if tsdf_available():
        budget = float(os.environ.get("TSDF_BASELINE_BUDGET_S", 120))
        cc = NativeTsdfOracle(TsdfConfig(base=cfg, n_samples=samples))
        tb = time.monotonic()
        done = 0
        for f in frames:
            cc.integrate_frame(baseline_points(f), np.asarray(f.pose))
            done += 1
            if time.monotonic() - tb > budget:
                break
        orc = cc.extract()
        dtb = time.monotonic() - tb
        base_mpts = done * pts / dtb / 1e6
        out["baseline_mpts_per_s"] = round(base_mpts, 3)
        out["baseline_frames"] = done
        out["vs_baseline"] = round(out["mpts_per_s"] / base_mpts, 2)
        if done == n:
            # sanity: the two surface sets should agree closely (band
            # integration is a pure sum — no refine phase to diverge)
            dev_n = r["n_points"]
            out["baseline_surface_voxels"] = int(orc["cell"].size)
            out["surface_rel_diff"] = round(
                abs(int(orc["cell"].size) - dev_n) / max(dev_n, 1), 5)
    else:
        print("WARNING: C++ TSDF oracle unavailable "
              "(rebuild runtime/native)", file=sys.stderr)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
