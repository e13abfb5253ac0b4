"""Integration parity: TPU pipeline vs the sequential NumPy oracle.

This is the survey §4 "golden-path oracle" check: synthetic sweeps are run
through both the jitted device pipeline (integrate -> refine -> integrate ->
... -> extract) and the pure-NumPy sequential restatement of the reference
semantics; the extracted voxel sets and per-voxel statistics must agree.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from hifi_fusion_tpu.config import small_test_config
from hifi_fusion_tpu.grid import make_grid, grid_metrics
from hifi_fusion_tpu.ops import integrate_frame, refine_pass, extract, to_host
from hifi_fusion_tpu.oracle import OracleGrid
from hifi_fusion_tpu.utils.synthetic import make_sweep, pad_frame

CFG = small_test_config()


def run_device(cfg, frames, refine_every=2, final_refine=True):
    grid = make_grid(cfg)
    for i, fr in enumerate(frames):
        pf = pad_frame(fr, cfg.max_points)
        grid = integrate_frame(
            grid, jnp.asarray(pf.points_cam), jnp.asarray(pf.rgb),
            jnp.asarray(pf.mask), jnp.asarray(pf.pose), config=cfg)
        if (i + 1) % refine_every == 0:
            grid = refine_pass(grid, config=cfg)
    if final_refine:
        grid = refine_pass(grid, config=cfg)
    return grid, to_host(extract(grid, config=cfg))


def run_oracle(cfg, frames, refine_every=2, final_refine=True):
    g = OracleGrid(cfg)
    for i, fr in enumerate(frames):
        g.integrate_frame(fr.points_cam, fr.rgb, fr.pose)
        if (i + 1) % refine_every == 0:
            g.refine()
    if final_refine:
        g.refine()
    return g, g.extract()


def assert_parity(dev, orc, stats_rtol=5e-3, dist_atol=1e-6):
    dev_cells = dev["cell"].astype(np.int64)
    orc_cells = orc["cell"]
    # identical extracted voxel sets, identical (sorted) order
    np.testing.assert_array_equal(dev_cells, orc_cells)
    n = len(orc_cells)
    assert n > 0
    # normals agree (same orientation after viewpoint flip)
    dots = np.sum(dev["normal"].astype(np.float64) * orc["normal"], axis=1)
    assert (dots > 0.999).all(), dots.min()
    # cylinder counts identical (integer semantics)
    mism = np.flatnonzero(dev["count"].astype(np.int64) != orc["count"])
    assert mism.size == 0, (mism.size, n)
    # statistics match within float tolerance
    np.testing.assert_allclose(dev["centroid"], orc["centroid"], atol=2e-5)
    np.testing.assert_allclose(dev["sd"], orc["sd"], atol=1e-9)
    # the Cardano vs numpy.linalg.eigh normal difference (~1e-4 in the
    # vector) perturbs projected distances by up to ~|q|*1e-4 ~ 2e-6
    np.testing.assert_allclose(dev["mean_dist"], orc["mean_dist"],
                               atol=dist_atol)
    np.testing.assert_allclose(dev["sd_dist"], orc["sd_dist"], atol=1e-8)
    np.testing.assert_allclose(dev["n_pts"].astype(np.int64), orc["n_pts"])
    np.testing.assert_allclose(dev["rgb"], orc["rgb"], rtol=1e-4, atol=1e-3)


def test_single_frame_occupancy_only():
    """One frame, no refine: grid occupies voxels, nothing extracted yet."""
    frames = make_sweep(CFG, 1, 800, seed=10)
    grid, dev = run_device(CFG, frames, refine_every=100, final_refine=False)
    m = grid_metrics(grid, CFG)
    assert m["occupied_voxels"] > 50
    assert m["normals_found"] == 0
    assert m["buffered_points"] > 0
    assert dev["cell"].size == 0


def test_sweep_parity_small():
    frames = make_sweep(CFG, 4, 700, seed=0)
    _, dev = run_device(CFG, frames)
    _, orc = run_oracle(CFG, frames)
    assert_parity(dev, orc)


def test_sweep_parity_multi_refine():
    """Longer sweep, interleaved refines: exercises retro replay + streaming
    + ghost voxels + dependant fan-in."""
    frames = make_sweep(CFG, 8, 500, seed=7, noise_sd=4e-4)
    _, dev = run_device(CFG, frames, refine_every=3)
    _, orc = run_oracle(CFG, frames, refine_every=3)
    assert_parity(dev, orc)


def test_counts_nonzero_and_plausible():
    frames = make_sweep(CFG, 6, 800, seed=3)
    _, dev = run_device(CFG, frames, refine_every=2)
    # cylinder-filtered counts must be populated (retro + streaming paths)
    assert dev["count"].sum() > 0
    assert (dev["count"] <= dev["n_pts"].sum()).all()
    # sd is a variance: non-negative, and tiny (points within 1mm cylinder)
    assert (dev["sd"] >= -1e-12).all()
    assert (dev["mean_dist"] >= 0).all()
    assert (dev["mean_dist"] < CFG.cylinder_radius + 1e-9).all()


def test_order_invariance_of_stats():
    """Sum-form accumulators: permuting points within a frame must not
    change extracted statistics (the property the reference's sequential
    Welford update lacks)."""
    frames = make_sweep(CFG, 3, 600, seed=5)
    _, dev1 = run_device(CFG, frames)
    rng = np.random.default_rng(0)
    for fr in frames:
        p = rng.permutation(fr.points_cam.shape[0])
        fr.points_cam = fr.points_cam[p]
        fr.rgb = fr.rgb[p]
    _, dev2 = run_device(CFG, frames)
    np.testing.assert_array_equal(dev1["cell"], dev2["cell"])
    np.testing.assert_array_equal(dev1["count"], dev2["count"])
    np.testing.assert_allclose(dev1["centroid"], dev2["centroid"], atol=1e-6)
    np.testing.assert_allclose(dev1["sd"], dev2["sd"], atol=1e-10)


def test_no_overflows_in_nominal_run():
    frames = make_sweep(CFG, 4, 700, seed=0)
    grid, _ = run_device(CFG, frames)
    m = grid_metrics(grid, CFG)
    assert m["overflow_probe"] == 0
    assert m["overflow_buffer"] == 0
    assert m["overflow_refine"] == 0
