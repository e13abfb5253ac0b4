"""State-machine + end-to-end tests for FusionSession (survey §4: the
start/stop/process/reset contract of the reference control plane)."""

import os
import time

import numpy as np
import pytest

from hifi_fusion_tpu.config import small_test_config
from hifi_fusion_tpu.io import pcd
from hifi_fusion_tpu.runtime.decode import make_cloud_frame
from hifi_fusion_tpu.runtime.session import FusionSession
from hifi_fusion_tpu.runtime.sources import SyntheticSource

CFG = small_test_config(refine_every=2)


def test_frames_gated_until_start(tmp_path):
    with FusionSession(CFG, output_dir=str(tmp_path)) as sess:
        src = list(SyntheticSource(CFG, 2, 300, seed=0))
        # not started: frames rejected (FUSION.cpp:331 gating)
        assert sess.push_frame(*src[0]) is False
        sess.start()
        assert sess.push_frame(*src[0]) is True
        sess.drain()
        m = sess.metrics()
        assert m["frames_integrated"] == 1
        assert m["frames_received"] == 2


def test_stop_drains_inflight(tmp_path):
    with FusionSession(CFG, output_dir=str(tmp_path)) as sess:
        sess.start()
        for frame, pose in SyntheticSource(CFG, 3, 300, seed=1):
            sess.push_frame(frame, pose)
        sess.stop()
        assert sess.drain()
        # queued frames still integrated after stop (FUSION.cpp:369-375)
        assert sess.metrics()["frames_integrated"] == 3


def test_process_exports_and_clears(tmp_path):
    with FusionSession(CFG, output_dir=str(tmp_path)) as sess:
        sess.run_source(SyntheticSource(CFG, 5, 600, seed=2))
        result = sess.process()
        assert result["n_points"] > 100
        assert os.path.exists(result["cloud"])
        assert os.path.exists(result["metadata"])
        fields, n = pcd.read_pcd(result["cloud"])
        assert n == result["n_points"]
        meta = pcd.read_metadata_csv(result["metadata"])
        assert meta["id"].shape[0] == n
        # grid cleared: a second immediate process exports nothing
        result2 = sess.process(cloud_name="again.pcd", meta_name="again.csv")
        assert result2["n_points"] == 0


def test_reset_parity_and_full(tmp_path):
    with FusionSession(CFG, output_dir=str(tmp_path)) as sess:
        sess.run_source(SyntheticSource(CFG, 3, 500, seed=3))
        occ = sess.metrics()["occupied_voxels"]
        assert occ > 0
        # parity reset: grid survives (FUSION.cpp:351-359)
        sess.reset()
        assert sess.metrics()["occupied_voxels"] == occ
        assert sess._started is False
        # full reset: grid cleared (fixed semantics)
        sess.reset(full=True)
        assert sess.metrics()["occupied_voxels"] == 0


def test_pose_provider_failure_drops_frame(tmp_path):
    calls = {"n": 0}

    def flaky_pose(frame):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("tf lookup failed")
        return np.eye(4)

    with FusionSession(CFG, output_dir=str(tmp_path),
                       pose_provider=flaky_pose) as sess:
        sess.start()
        xyz = np.zeros((10, 3), np.float32)
        frame = make_cloud_frame(xyz)
        assert sess.push_frame(frame) is False     # dropped, not raised
        assert sess.push_frame(frame) is True
        sess.drain()
        m = sess.metrics()
        assert m["pose_failures"] == 1
        assert m["frames_integrated"] == 1


def test_backpressure_drops_oldest(tmp_path):
    with FusionSession(small_test_config(refine_every=0),
                       output_dir=str(tmp_path), queue_depth=2) as sess:
        # worker can't keep up instantaneously; overflow must be counted,
        # never raised
        sess.start()
        src = list(SyntheticSource(CFG, 6, 100, seed=4))
        for frame, pose in src:
            sess.push_frame(frame, pose)
        sess.drain()
        m = sess.metrics()
        assert (m["frames_integrated"]
                + m["frames_dropped_backpressure"]) == 6


def test_process_gates_ingestion(tmp_path):
    """Frames pushed while process() drains must not enter the snapshot
    (the reference self-quiesces: its drain blocks the spinner,
    FUSION.cpp:379-394)."""
    with FusionSession(CFG, output_dir=str(tmp_path)) as sess:
        sess.run_source(SyntheticSource(CFG, 2, 400, seed=7))
        src = list(SyntheticSource(CFG, 1, 400, seed=8))

        orig_drain = sess.drain
        pushed = {}

        def drain_and_push(timeout=300.0):
            ok = orig_drain(timeout=timeout)
            # a pusher racing the drain: must be gated (started was
            # snapshotted off), so the frame cannot leak into the export
            pushed["accepted"] = sess.push_frame(*src[0])
            return ok

        sess.drain = drain_and_push
        sess.process()
        assert pushed["accepted"] is False
        sess.drain = orig_drain
        # started flag restored after process
        assert sess._started is True
        assert sess.push_frame(*src[0]) is True


def test_process_drain_timeout_raises(tmp_path):
    with FusionSession(CFG, output_dir=str(tmp_path)) as sess:
        sess.run_source(SyntheticSource(CFG, 1, 300, seed=9))
        occ = sess.metrics()["occupied_voxels"]
        sess.drain = lambda timeout=300.0: False   # simulate stuck queue
        with pytest.raises(TimeoutError):
            sess.process(drain_timeout=0.01)
        del sess.drain
        # the grid survived the refused export
        assert sess.metrics()["occupied_voxels"] == occ


def test_save_load_state(tmp_path):
    with FusionSession(CFG, output_dir=str(tmp_path)) as sess:
        sess.run_source(SyntheticSource(CFG, 4, 500, seed=5))
        p = str(tmp_path / "ckpt.npz")
        sess.save_state(p)
        r1 = sess.process()
        # restore and re-process: identical export
        sess.load_state(p)
        r2 = sess.process(cloud_name="restored.pcd",
                          meta_name="restored.csv")
        assert r1["n_points"] == r2["n_points"]
        f1, _ = pcd.read_pcd(r1["cloud"])
        f2, _ = pcd.read_pcd(r2["cloud"])
        np.testing.assert_array_equal(f1["x"], f2["x"])
        np.testing.assert_array_equal(f1["normal_z"], f2["normal_z"])


def test_oversized_frame_truncation_is_counted(tmp_path):
    """A frame larger than max_points is clamped — and the drop is surfaced
    in metrics like every other drop path (VERDICT r1 #6)."""
    cfg = small_test_config(refine_every=0, max_points=256)
    with FusionSession(cfg, output_dir=str(tmp_path)) as sess:
        sess.start()
        rng = np.random.default_rng(0)
        xyz = rng.uniform(-0.25, 0.25, (1000, 3)).astype(np.float32)
        sess.push_frame(make_cloud_frame(xyz), np.eye(4))
        sess.drain()
        m = sess.metrics()
        assert m["frames_integrated"] == 1
        assert m["frames_truncated"] == 1
        assert m["points_truncated"] == 1000 - 256


def test_session_depth_ingest(tmp_path):
    """Sensor-native session path: push_depth_frame -> process exports a
    cloud equal to what the planar path would produce (the device
    unprojection is bit-reproducible; see tests/test_depth_ingest.py)."""
    import jax.numpy as jnp
    from hifi_fusion_tpu.config import small_test_config
    from hifi_fusion_tpu.runtime.session import FusionSession
    from hifi_fusion_tpu.utils.synthetic import camera_rays, make_depth_sweep

    cfg = small_test_config(z_clip=(0.05, 0.99), capacity_log2=16,
                            max_probes=64, refine_every=2)
    rays = camera_rays(64, 48, fx=50.0)
    frames = make_depth_sweep(cfg, 4, width=64, height=48, seed=31,
                              srays=rays)
    with FusionSession(cfg, output_dir=str(tmp_path)) as sess:
        sess.start()
        for fr in frames:
            assert sess.push_depth_frame(fr.depth_q, fr.rgb565, fr.pose,
                                         rays=rays)
        assert sess.drain()
        m = sess.metrics()
        assert m["frames_integrated"] == 4
        result = sess.process()
    assert result["n_points"] > 50
    import os
    assert os.path.exists(result["cloud"])
    assert os.path.exists(result["metadata"])
