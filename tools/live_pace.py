"""Paced live-session demonstration at sensor cadence (PERF.md §10).

Replays the bench sweep through ``push_depth_frame`` with REAL-TIME
arrivals (default 30 Hz = the reference's RealSense stream; the node spins
at 31 Hz, FUSION.cpp:453) against a warmed, live-batching session:

* phase 1 — a full sweep capture at the paced rate: the bounded queue
  (depth 100 — the ROS subscriber depth the reference relies on,
  FUSION.cpp:152) must absorb every refine wall with ZERO backpressure
  drops, and the drain lag after the last arrival is reported;
* phase 2 — continuous streaming (the sweep looped) for LIVE_SECONDS of
  arrivals: reports the sustained integration rate and the terminal queue
  depth, i.e. whether the session keeps up indefinitely at this cadence
  or sheds the excess through the drop-oldest queue exactly like the
  reference does at 31 Hz.

Env: LIVE_FPS (30), LIVE_SECONDS (8), LIVE_QUEUE (100), LIVE_DEPTH
(device pipeline depth, default 2 = the live default; the harvest
scalar shares the stdio tunnel with frame staging, so depth 3 gives it
a batch-time to cross — integrated counts stay device-true either way,
the bound just loosens by one step).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main():
    import jax
    from bench import BATCH, FRAMES, bench_config, bench_rays, make_frames
    from hifi_fusion_tpu.runtime.session import FusionSession

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(root, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    fps = float(os.environ.get("LIVE_FPS", 30.0))
    seconds = float(os.environ.get("LIVE_SECONDS", 8.0))
    qdepth = int(os.environ.get("LIVE_QUEUE", 100))
    pdepth = int(os.environ.get("LIVE_DEPTH", 2))
    period = 1.0 / fps
    cfg = bench_config()
    rays = bench_rays()
    frames = make_frames(cfg, FRAMES, arc_frames=FRAMES)
    host = [(np.asarray(f.depth_q), np.asarray(f.rgb565),
             np.asarray(f.pose, np.float32)) for f in frames]
    import tempfile
    out = {"fps": fps, "queue_depth": qdepth, "batch": BATCH}

    with FusionSession(cfg, output_dir=tempfile.mkdtemp(prefix="live_"),
                       queue_depth=qdepth, live_batching=True,
                       pipeline_depth=pdepth) as sess:
        t0 = time.monotonic()
        warm_s = sess.warm(rays=rays, extract=True)
        print(f"warm: {warm_s:.1f}s", flush=True)
        out["warm_s"] = round(warm_s, 1)
        sess.start()

        # ---- phase 1: one sweep capture at the paced rate ----
        n1 = (len(host) // BATCH) * BATCH
        t0 = time.monotonic()
        maxq = 0
        for i in range(n1):
            t_next = t0 + (i + 1) * period
            dq, r565, pose = host[i]
            sess.push_depth_frame(dq, r565, pose, rays=rays)
            maxq = max(maxq, len(sess._queue))
            dt = t_next - time.monotonic()
            if dt > 0:
                time.sleep(dt)
        t_arr = time.monotonic() - t0
        sess.drain(timeout=300)
        t_done = time.monotonic() - t0
        m1 = sess.metrics()
        out["capture"] = {
            "frames": n1, "arrival_s": round(t_arr, 2),
            "drain_lag_s": round(t_done - t_arr, 2),
            "max_queue": maxq,
            "dropped": m1["frames_dropped_backpressure"],
            "integrated": m1["frames_integrated"],
        }
        print(f"capture: {n1} frames arrived over {t_arr:.1f}s @ {fps:g} "
              f"fps, drained +{t_done - t_arr:.1f}s after last arrival, "
              f"max queue {maxq}, dropped "
              f"{m1['frames_dropped_backpressure']}", flush=True)
        r = sess.process(ascii_mode=False)
        ovf = {k: v for k, v in r["grid_metrics"].items()
               if k.startswith("overflow") and v}
        assert not ovf, f"overflow during paced capture: {ovf}"
        out["capture"]["voxels"] = r["n_points"]

        # ---- phase 2: continuous stream (looped sweep) ----
        base = sess.metrics()["frames_integrated"]
        base_drop = sess.metrics()["frames_dropped_backpressure"]
        n2 = int(seconds * fps)
        t0 = time.monotonic()
        for i in range(n2):
            t_next = t0 + (i + 1) * period
            dq, r565, pose = host[i % len(host)]
            sess.push_depth_frame(dq, r565, pose, rays=rays)
            dt = t_next - time.monotonic()
            if dt > 0:
                time.sleep(dt)
        t_arr = time.monotonic() - t0
        qlen = len(sess._queue)
        m2 = sess.metrics()
        integ = m2["frames_integrated"] - base
        out["continuous"] = {
            "offered": n2, "offered_s": round(t_arr, 2),
            "integrated_during": integ,
            "sustained_fps": round(integ / t_arr, 1),
            "terminal_queue": qlen,
            "dropped": m2["frames_dropped_backpressure"] - base_drop,
        }
        print(f"continuous: {n2} frames offered @ {fps:g} fps over "
              f"{t_arr:.1f}s; integrated {integ} "
              f"({integ / t_arr:.1f} f/s sustained), terminal queue "
              f"{qlen}, dropped "
              f"{m2['frames_dropped_backpressure'] - base_drop}",
              flush=True)
        sess.drain(timeout=300)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
