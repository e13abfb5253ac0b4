"""TSDF variant vs the pure-NumPy oracle (oracle/tsdf_oracle.py) — the same
golden-path discipline the flagship pipeline has against oracle.py (survey
§4), replacing the plausibility-only checks VERDICT r2 weak #6 flagged.
Integer outputs (cells, weights) must agree except where an f32 FMA flips a
sample across a cell boundary (the device transform fuses multiply-adds);
accumulated stats agree to f32 reduction-order noise.
"""

import dataclasses
import os

import jax.numpy as jnp
import numpy as np

from hifi_fusion_tpu.config import small_test_config
from hifi_fusion_tpu.models.tsdf import (TsdfConfig, TsdfPipeline,
                                         tsdf_to_host)
from hifi_fusion_tpu.oracle.tsdf_oracle import TsdfOracle
from hifi_fusion_tpu.utils.synthetic import make_sweep, pad_frame

CFG = TsdfConfig(base=small_test_config(refine_every=0),
                 truncation=0.01, n_samples=5, min_weight=2.0)


def test_tsdf_matches_numpy_oracle():
    frames = make_sweep(CFG.base, 3, 700, seed=4)
    pipe = TsdfPipeline(CFG)
    grid = pipe.init()
    orc = TsdfOracle(CFG)
    for f in frames:
        pf = pad_frame(f, CFG.base.max_points)
        grid = pipe.step(grid, jnp.asarray(pf.points_cam),
                         jnp.asarray(pf.rgb), jnp.asarray(pf.mask),
                         jnp.asarray(pf.pose))
        n = f.points_cam.shape[1] if f.points_cam.shape[0] == 3 \
            else f.points_cam.shape[0]
        orc.integrate_frame(np.asarray(pf.points_cam[:, :n].T),
                            np.asarray(pf.rgb[:, :n].T), pf.pose)
    dev = tsdf_to_host(pipe.extract(grid))
    ref = orc.extract()
    assert dev["cell"].size > 50
    assert int(jnp.sum(grid.overflow_probe)) == 0
    assert int(jnp.sum(grid.overflow_unique)) == 0

    # Cell sets: exact except the knife-edge class — cells whose every
    # sample sits AT the truncation endpoint, so |mean sdf| == the
    # surface gate exactly and f32 summation order decides inclusion
    # (measured: segment-sum rounds to 0.070000000298, sequential to
    # 0.069999992933, gate = f32(0.01) between them).  Any differing cell
    # must be of that class; a non-boundary difference is a real bug.
    dc, rc = set(dev["cell"].tolist()), set(ref["cell"].tolist())
    gate = np.float32(CFG.surface_band) * np.float32(
        CFG.base.resolution[0])
    for cid in dc ^ rc:
        acc = orc.cells[int(cid)]
        t = abs(np.float32(acc[1] / max(acc[0], 1e-9)))
        assert abs(t - gate) < 1e-8, (
            f"cell {cid} differs with |t|={t!r} not at the gate {gate!r}")
    assert len(dc ^ rc) <= 0.02 * len(rc)
    common = sorted(dc & rc)
    di = {int(c): i for i, c in enumerate(dev["cell"])}
    ri = {int(c): i for i, c in enumerate(ref["cell"])}
    dsel = np.asarray([di[c] for c in common])
    rsel = np.asarray([ri[c] for c in common])
    np.testing.assert_allclose(dev["weight"][dsel], ref["weight"][rsel],
                               atol=1.01)   # one boundary sample may flip
    np.testing.assert_allclose(dev["tsdf"][dsel], ref["tsdf"][rsel],
                               atol=2e-4)
    np.testing.assert_allclose(dev["centroid"][dsel], ref["centroid"][rsel],
                               atol=5e-3)
    dots = np.sum(dev["normal"][dsel] * ref["normal"][rsel], axis=1)
    assert np.mean(dots > 0.99) > 0.98


def test_tsdf_session_end_to_end(tmp_path):
    """The TSDF family behind the full session contract: replay ->
    process() -> PCD + CSV on disk (VERDICT r2 weak #6: no session/CLI
    integration)."""
    from hifi_fusion_tpu.io.pcd import read_pcd
    from hifi_fusion_tpu.runtime.session import FusionSession
    from hifi_fusion_tpu.utils.synthetic import camera_rays, make_depth_sweep

    base = small_test_config(refine_every=0, z_clip=(0.05, 10.0))
    rays = camera_rays(64, 64, fx=80.0, fy=80.0)
    frames = make_depth_sweep(base, 4, width=64, height=64, srays=rays,
                              seed=2, noise_sd=1e-4, camera_height=0.4)
    with FusionSession(base, output_dir=str(tmp_path), model="tsdf",
                       model_params={"truncation": 0.01, "n_samples": 5,
                                     "min_weight": 2.0}) as s:
        s.start()
        for f in frames:
            s.push_depth_frame(f.depth_q, f.rgb565, f.pose, rays=rays)
        assert s.drain(600)
        r = s.process(ascii_mode=False)
        m = s.metrics()
    assert m["frames_integrated"] == len(frames)
    assert r["n_points"] > 20
    assert os.path.exists(r["cloud"]) and os.path.exists(r["metadata"])
    data, n = read_pcd(r["cloud"])
    assert n == r["n_points"]
    nn = np.sqrt(data["normal_x"] ** 2 + data["normal_y"] ** 2
                 + data["normal_z"] ** 2)
    assert (np.abs(nn - 1.0) < 1e-3).mean() > 0.99


def test_tsdf_batched_matches_single_step():
    """integrate_tsdf_batch == K single steps: identical cell set and
    weights; per-cell f32 sums reassociate, so value channels compare
    with a tolerance.  Extraction sorts by cell id, so hash slot
    placement differences cannot leak into the output."""
    from hifi_fusion_tpu.models.tsdf import tsdf_to_host

    base = small_test_config(refine_every=0, z_clip=(0.05, 10.0))
    cfg = TsdfConfig(base=base, truncation=3 * base.resolution[0],
                     n_samples=5, min_weight=1.0,
                     batch_unique=4 * base.max_unique_per_frame)
    pipe = TsdfPipeline(cfg)
    frames = [pad_frame(f, base.max_points)
              for f in make_sweep(base, 4, 700, seed=11)]

    g1 = pipe.init()
    for pf in frames:
        g1 = pipe.step(g1, jnp.asarray(pf.points_cam), jnp.asarray(pf.rgb),
                       jnp.asarray(pf.mask), jnp.asarray(pf.pose))
    gk = pipe.init()
    gk = pipe.step_batch(
        gk,
        jnp.asarray(np.stack([pf.points_cam for pf in frames])),
        jnp.asarray(np.stack([pf.rgb for pf in frames])),
        jnp.asarray(np.stack([pf.mask for pf in frames])),
        jnp.asarray(np.stack([pf.pose for pf in frames])))
    assert int(g1.frames) == int(gk.frames) == 4
    assert int(gk.overflow_unique) == 0 and int(gk.overflow_probe) == 0

    h1 = tsdf_to_host(pipe.extract(g1, cap=0))
    hk = tsdf_to_host(pipe.extract(gk, cap=0))
    np.testing.assert_array_equal(h1["cell"], hk["cell"])
    np.testing.assert_allclose(h1["weight"], hk["weight"],
                               rtol=1e-6, atol=0)
    np.testing.assert_allclose(h1["centroid"], hk["centroid"],
                               rtol=1e-5, atol=1e-6)
