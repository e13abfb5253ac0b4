"""Live-session pacing: paced sensor arrivals must ride the bounded queue
through refine stalls with zero backpressure drops (VERDICT r3 #4).

The reference is a LIVE node — a 31 Hz spin pulling a RealSense stream
(FUSION.cpp:152, 453) whose only slack is the ROS queue depth 100.  Here a
paced replay pushes depth frames through ``push_depth_frame`` at a fixed
cadence (scaled to what this 1-core CPU host sustains — the TPU-rate
demonstration lives in tools/live_pace.py + PERF.md §10) and asserts the
session contract the sensor needs:

* ``warm()`` preloads every capture program, so no first-compile stall
  can land mid-capture;
* an early-cadence refine wall (the worst stall) is absorbed by the
  queue: zero ``frames_dropped_backpressure``;
* ``live_batching`` drains a backlog in K-frame dispatches at identical
  frame numbers / identical results vs single-stepping.
"""

import time

import numpy as np
import pytest

from hifi_fusion_tpu.config import small_test_config
from hifi_fusion_tpu.runtime.session import FusionSession
from hifi_fusion_tpu.utils.synthetic import camera_rays, make_depth_sweep

W, H = 64, 48


def _frames(cfg, n, rays):
    return make_depth_sweep(cfg, n, width=W, height=H, srays=rays, seed=3,
                            camera_height=0.3)


def _cfg(**kw):
    base = dict(max_points=W * H, z_clip=(0.05, 3.0), refine_every=4,
                max_batch_frames=4)
    base.update(kw)
    return small_test_config(**base)


def test_paced_live_session_zero_drops(tmp_path):
    cfg = _cfg()
    rays = camera_rays(W, H, fx=60.0, fy=60.0)
    frames = _frames(cfg, 16, rays)
    with FusionSession(cfg, output_dir=str(tmp_path),
                       queue_depth=100) as sess:
        warm_s = sess.warm(rays=rays)
        # pace at 4x the measured steady step so host jitter cannot flake
        # the test; the CONTRACT under test is queue absorption + zero
        # drops through the refine marks, not an absolute rate
        t0 = time.monotonic()
        sess.start()
        for f in frames[:4]:
            sess.push_depth_frame(f.depth_q, f.rgb565, f.pose, rays=rays)
        assert sess.drain()
        probe_dt = (time.monotonic() - t0) / 4
        period = max(probe_dt * 4, 0.005)
        for f in frames[4:]:
            t_next = time.monotonic() + period
            sess.push_depth_frame(f.depth_q, f.rgb565, f.pose, rays=rays)
            time.sleep(max(t_next - time.monotonic(), 0.0))
        assert sess.drain()
        m = sess.metrics()
    assert m["frames_integrated"] == 16
    assert m["frames_dropped_backpressure"] == 0
    assert m["pose_failures"] == 0
    assert warm_s > 0.0


def test_live_batching_matches_single_step(tmp_path):
    """A bursty producer (whole sweep pushed at once — the worst backlog)
    drained with opportunistic K-batching must produce the identical
    voxel set/counts as the single-stepped session: batches never span a
    refine mark, sums commute."""
    from hifi_fusion_tpu.io.pcd import read_metadata_csv
    cfg = _cfg()
    rays = camera_rays(W, H, fx=60.0, fy=60.0)
    frames = _frames(cfg, 12, rays)
    outs = {}
    for tag, kw in (("single", {}), ("batched", {"live_batching": True})):
        d = tmp_path / tag
        with FusionSession(cfg, output_dir=str(d), **kw) as sess:
            sess.warm(rays=rays)
            sess.start()
            for f in frames:
                sess.push_depth_frame(f.depth_q, f.rgb565, f.pose,
                                      rays=rays)
            assert sess.drain()
            m = sess.metrics()
            assert m["frames_integrated"] == 12
            assert m["frames_dropped_backpressure"] == 0
            outs[tag] = sess.process()
    assert outs["single"]["n_points"] == outs["batched"]["n_points"] > 0
    ma = read_metadata_csv(outs["single"]["metadata"])
    mb = read_metadata_csv(outs["batched"]["metadata"])
    np.testing.assert_array_equal(ma["count"], mb["count"])


def test_live_batching_single_frame_latency_unchanged(tmp_path):
    """With an idle queue a live_batching session must still single-step
    (a frame is never delayed waiting for a batch)."""
    cfg = _cfg()
    rays = camera_rays(W, H, fx=60.0, fy=60.0)
    frames = _frames(cfg, 2, rays)
    with FusionSession(cfg, output_dir=str(tmp_path),
                       live_batching=True) as sess:
        sess.warm(rays=rays)
        sess.start()
        sess.push_depth_frame(frames[0].depth_q, frames[0].rgb565,
                              frames[0].pose, rays=rays)
        assert sess.drain(timeout=30)
        assert sess.metrics()["frames_integrated"] == 1  # no batch wait
