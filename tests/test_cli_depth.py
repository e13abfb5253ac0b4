"""CLI round trip for the sensor-native depth sweep format: synth --wire
depth -> fuse auto-detects and replays through push_depth_frame (the
production wire, 4 B/px on disk and on the host->device link)."""

import json
import os

import numpy as np

from hifi_fusion_tpu.runtime.cli import main

CFG_FLAGS = ["--bbox", "-0.32", "0.32", "-0.32", "0.32", "-0.32", "0.32",
             "--resolution", "0.01", "--capacity-log2", "14",
             "--max-points", "4096"]


def test_depth_sweep_synth_fuse_roundtrip(tmp_path, capsys):
    sweep = str(tmp_path / "sweep_depth.npz")
    rc = main(["synth", "--frames", "4", "--points", "4096",
               "--wire", "depth", "--width", "64",
               "--output", sweep] + CFG_FLAGS)
    assert rc == 0
    z = np.load(sweep)
    assert z["depth_q"].dtype == np.uint16
    assert z["depth_q"].shape == (4, 4096)
    assert z["rays"].shape == (3, 4096)

    out = str(tmp_path / "out")
    rc = main(["fuse", "--sweep", sweep, "--output", out,
               "--refine-every", "2"] + CFG_FLAGS
              + ["--config", _zclip_cfg(tmp_path)])
    assert rc == 0
    line = capsys.readouterr().out.strip().splitlines()[-1]
    r = json.loads(line)
    assert r["frames_integrated"] == 4
    assert r["n_points"] > 0
    assert os.path.exists(os.path.join(out, "test_cloud.pcd"))


def _zclip_cfg(tmp_path) -> str:
    p = str(tmp_path / "cfg.json")
    with open(p, "w") as f:
        json.dump({"z_clip": [0.05, 10.0]}, f)
    return p
