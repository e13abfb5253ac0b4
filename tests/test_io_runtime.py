"""Tests for decode, PCD/CSV I/O, download variants, native library."""

import os

import numpy as np
import pytest

from hifi_fusion_tpu.io import pcd, downloads
from hifi_fusion_tpu.config import small_test_config
from hifi_fusion_tpu.runtime import decode, native
from hifi_fusion_tpu.runtime.sources import (SyntheticSource, save_sweep,
                                             load_sweep)


def _host_result(n=10, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "centroid": rng.normal(size=(n, 3)).astype(np.float32),
        "normal": rng.normal(size=(n, 3)).astype(np.float32),
        "rgb": rng.uniform(0, 255, (n, 3)).astype(np.float32),
        "sd": rng.uniform(0, 1e-6, (n, 3)),
        "mean_dist": rng.uniform(0, 1e-3, n),
        "sd_dist": rng.uniform(0, 1e-6, n),
        "count": rng.integers(0, 300, n),
        "n_pts": rng.integers(1, 500, n),
    }


def test_decode_roundtrip():
    rng = np.random.default_rng(1)
    xyz = rng.normal(size=(257, 3)).astype(np.float32)
    rgb = rng.integers(0, 256, (257, 3)).astype(np.float32)
    frame = decode.make_cloud_frame(xyz, rgb)
    out_xyz, out_rgb = decode.decode_frame(frame)
    np.testing.assert_array_equal(out_xyz, xyz)
    np.testing.assert_array_equal(out_rgb, rgb)


def test_decode_blue_shift_bug_compat():
    # Reference splitRGBData uses shifts {16,8,1}: blue decodes as
    # (packed >> 1) & 0xff = (green LSB << 7) | (blue >> 1).
    xyz = np.zeros((2, 3), np.float32)
    rgb = np.asarray([[0x12, 0x34, 0xEF],      # green even -> 0x77
                      [0x12, 0x35, 0xEF]],     # green odd  -> 0xF7
                     np.float32)
    frame = decode.make_cloud_frame(xyz, rgb)
    _, out = decode.decode_frame(frame, blue_shift_bug=True)
    assert int(out[0, 2]) == 0x77
    assert int(out[1, 2]) == 0xF7
    _, fixed = decode.decode_frame(frame, blue_shift_bug=False)
    assert int(fixed[0, 2]) == 0xEF
    assert int(fixed[1, 2]) == 0xEF


def test_decode_numpy_vs_native_agree():
    if not native.available():
        pytest.skip("native library not built")
    rng = np.random.default_rng(2)
    xyz = rng.normal(size=(1000, 3)).astype(np.float32)
    rgb = rng.integers(0, 256, (1000, 3)).astype(np.float32)
    frame = decode.make_cloud_frame(xyz, rgb)
    nx, nr = decode.decode_frame(frame)
    px, pr = decode._decode_numpy(frame, 0, 4, 8, 12, False)
    np.testing.assert_array_equal(nx, px)
    np.testing.assert_array_equal(nr, pr)


def test_pcd_ascii_roundtrip(tmp_path):
    host = _host_result()
    p = str(tmp_path / "cloud.pcd")
    pcd.write_pcd_xyzrgbnormal(p, host["centroid"], host["rgb"],
                               host["normal"])
    fields, n = pcd.read_pcd(p)
    assert n == 10
    np.testing.assert_allclose(
        np.stack([fields["x"], fields["y"], fields["z"]], -1),
        host["centroid"], rtol=1e-6)
    np.testing.assert_allclose(
        np.stack([fields["normal_x"], fields["normal_y"],
                  fields["normal_z"]], -1),
        host["normal"], rtol=1e-6)
    with open(p) as f:
        head = f.read().splitlines()
    assert head[2] == ("FIELDS x y z rgb normal_x normal_y normal_z "
                       "curvature")
    assert head[9] == "POINTS 10"


def test_pcd_binary_roundtrip(tmp_path):
    host = _host_result()
    p = str(tmp_path / "cloud_bin.pcd")
    pcd.write_pcd_xyzrgb(p, host["centroid"], host["rgb"], ascii_mode=False)
    fields, n = pcd.read_pcd(p)
    assert n == 10
    np.testing.assert_array_equal(
        np.stack([fields["x"], fields["y"], fields["z"]], -1),
        host["centroid"])


def test_metadata_csv_format(tmp_path):
    host = _host_result()
    p = str(tmp_path / "meta.csv")
    pcd.write_metadata_csv(p, host["sd"], host["mean_dist"],
                           host["sd_dist"], host["count"])
    with open(p) as f:
        lines = f.read().splitlines()
    # byte-exact reference header (OccupancyGrid.hpp:462)
    assert lines[0] == ("Id,sdx,sdy,sdz,mean distance from normal,"
                        " distance from normal sd, points in cylinder")
    assert len(lines) == 11
    meta = pcd.read_metadata_csv(p)
    np.testing.assert_array_equal(meta["id"], np.arange(10))
    np.testing.assert_array_equal(meta["count"], host["count"])
    np.testing.assert_allclose(meta["sd"], host["sd"], rtol=1e-4)


def test_download_variants():
    cfg = small_test_config()
    host = _host_result(50)
    hq = downloads.download_hq(host, cfg, threshold=100)
    assert (hq["count"] >= 100).all()
    assert hq["xyz"].shape[0] == int((host["count"] >= 100).sum())
    cl = downloads.download_classified(host, cfg)
    good = host["count"] > cfg.good_points_threshold
    assert (cl["rgb"][good] == [255, 0, 0]).all()
    assert (cl["rgb"][~good] == [255, 255, 255]).all()
    dn = downloads.download_with_normals(host)
    assert set(dn) == {"xyz", "rgb", "normal"}


def test_sweep_save_load_roundtrip(tmp_path):
    cfg = small_test_config()
    src = SyntheticSource(cfg, 3, 200, seed=4)
    p = str(tmp_path / "sweep.npz")
    n = save_sweep(p, src)
    assert n == 3
    loaded = load_sweep(p)
    orig = list(src)
    back = list(loaded)
    assert len(back) == 3
    for (f0, p0), (f1, p1) in zip(orig, back):
        np.testing.assert_array_equal(p0, p1)
        x0, r0 = decode.decode_frame(f0)
        x1, r1 = decode.decode_frame(f1)
        np.testing.assert_array_equal(x0, x1)
        np.testing.assert_array_equal(r0, r1)


def test_ply_roundtrip_binary_and_ascii(tmp_path):
    from hifi_fusion_tpu.io import ply
    host = _host_result(17)
    for mode in (False, True):
        p = str(tmp_path / f"c_{mode}.ply")
        ply.write_ply(p, host["centroid"], host["rgb"], host["normal"],
                      ascii_mode=mode)
        back = ply.read_ply(p)
        np.testing.assert_allclose(back["xyz"], host["centroid"],
                                   rtol=1e-6)
        np.testing.assert_allclose(back["normal"], host["normal"],
                                   rtol=1e-6)
        np.testing.assert_array_equal(
            back["rgb"], np.clip(host["rgb"], 0, 255).astype(np.uint8))


def test_ply_xyz_only(tmp_path):
    from hifi_fusion_tpu.io import ply
    host = _host_result(5)
    p = str(tmp_path / "bare.ply")
    ply.write_ply(p, host["centroid"])
    back = ply.read_ply(p)
    np.testing.assert_allclose(back["xyz"], host["centroid"], rtol=1e-6)
    assert "rgb" not in back and "normal" not in back
