"""Recorded-capture ingestion: PCD/PLY frame directory + TUM/CSV poses.

The reference consumes a live sensor stream via ROS (FUSION.cpp:327-349);
this is the offline equivalent — a standard recorded layout importable
without ROS.  Fixture in tests/fixtures/capture/ (2 ASCII PCDs + 1 ASCII
PLY + a TUM trajectory).
"""

import json
import os

import numpy as np
import pytest

from hifi_fusion_tpu.config import small_test_config
from hifi_fusion_tpu.runtime.capture import (load_capture, quat_to_matrix,
                                             read_pose_csv,
                                             read_tum_trajectory)
from hifi_fusion_tpu.runtime.decode import decode_frame

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "capture")


def test_quat_to_matrix_identity_and_flip():
    np.testing.assert_allclose(quat_to_matrix([0, 0, 0, 1]), np.eye(3),
                               atol=1e-12)
    # 180 deg about x: the synthetic look-down pose
    R = quat_to_matrix([1, 0, 0, 0])
    np.testing.assert_allclose(R, np.diag([1.0, -1.0, -1.0]), atol=1e-12)


def test_load_capture_roundtrip():
    src = load_capture(FIXTURE)
    assert len(src) == 3
    for frame, pose in src:
        xyz, rgb = decode_frame(frame)
        assert xyz.shape[0] == 300
        assert np.isfinite(xyz).all()
        assert (rgb >= 0).all() and (rgb <= 255).all()
        assert pose.shape == (4, 4)
        np.testing.assert_allclose(pose[:3, :3],
                                   np.diag([1.0, -1.0, -1.0]), atol=1e-7)


def test_capture_fuses_end_to_end(tmp_path):
    from hifi_fusion_tpu.runtime.session import FusionSession
    cfg = small_test_config(refine_every=1)
    src = load_capture(FIXTURE)
    with FusionSession(cfg, output_dir=str(tmp_path)) as sess:
        sess.run_source(src)
        m = sess.metrics()
        assert m["frames_integrated"] == 3
        assert m["occupied_voxels"] > 20
        result = sess.process()
    assert os.path.exists(result["cloud"])


def test_cli_fuse_capture_dir_with_variants(tmp_path):
    """The VERDICT-8/9 CLI round trip: fuse a capture directory, export
    the hq + classified variants."""
    from hifi_fusion_tpu.io import pcd as pcd_io
    from hifi_fusion_tpu.runtime.cli import main
    import contextlib, io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(["fuse", "--sweep", FIXTURE, "--output", str(tmp_path),
                   "--bbox", "-0.32", "0.32", "-0.32", "0.32",
                   "-0.32", "0.32",
                   "--resolution", "0.01", "--refine-every", "1",
                   "--capacity-log2", "14", "--max-points", "4096"])
    assert rc == 0
    out = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert out["n_points"] > 0
    fields, n = pcd_io.read_pcd(out["cloud"])
    assert n == out["n_points"]

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(["fuse", "--sweep", FIXTURE, "--output", str(tmp_path),
                   "--bbox", "-0.32", "0.32", "-0.32", "0.32",
                   "-0.32", "0.32",
                   "--resolution", "0.01", "--refine-every", "1",
                   "--capacity-log2", "14", "--max-points", "4096",
                   "--export-variants", "hq,classified"])
    assert rc == 0
    out = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert set(out["variants"]) == {"hq", "classified"}
    for path in out["variants"].values():
        assert os.path.exists(path)
    cf, ncl = pcd_io.read_pcd(out["variants"]["classified"])
    assert ncl == out["n_points"]          # classified keeps all voxels
    _, nhq = pcd_io.read_pcd(out["variants"]["hq"])
    assert nhq <= ncl                      # hq filters by count


def test_pose_csv_variants(tmp_path):
    p = tmp_path / "poses.csv"
    p.write_text(
        "frame,tx,ty,tz,qx,qy,qz,qw\n"
        "f0,0.1,0.2,0.3,0,0,0,1\n"
        "f1,0.2,0.2,0.3,1,0,0,0\n")
    poses = read_pose_csv(str(p))
    assert len(poses) == 2
    np.testing.assert_allclose(poses[0][:3, 3], [0.1, 0.2, 0.3])
    np.testing.assert_allclose(poses[1][:3, :3],
                               np.diag([1.0, -1.0, -1.0]), atol=1e-12)
    # 16-entry matrix rows
    m = np.eye(4); m[0, 3] = 0.5
    p2 = tmp_path / "mat.csv"
    p2.write_text(",".join(f"{v:g}" for v in m.reshape(-1)) + "\n")
    poses2 = read_pose_csv(str(p2))
    np.testing.assert_allclose(poses2[0], m)


def test_capture_errors(tmp_path):
    with pytest.raises(FileNotFoundError):
        load_capture(str(tmp_path))        # no frames
    (tmp_path / "a.pcd").write_text("bogus")
    with pytest.raises(FileNotFoundError):
        load_capture(str(tmp_path))        # frames but no poses
