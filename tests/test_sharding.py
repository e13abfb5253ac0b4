"""Sharded (8 virtual devices) vs single-device equivalence (survey §5.7)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hifi_fusion_tpu.config import small_test_config
from hifi_fusion_tpu.models.pipeline import FusionPipeline
from hifi_fusion_tpu.ops.extract import to_host
from hifi_fusion_tpu.parallel.sharding import ShardedFusion
from hifi_fusion_tpu.utils.synthetic import make_sweep, pad_frame

CFG = small_test_config(refine_every=0)


def _frames(n_frames=5, points=600, seed=0):
    return [pad_frame(f, CFG.max_points)
            for f in make_sweep(CFG, n_frames, points, seed=seed)]


def _run_single(frames, refine_every=2):
    pipe = FusionPipeline(CFG)
    grid = pipe.init()
    for i, f in enumerate(frames):
        grid = pipe.integrate(grid, jnp.asarray(f.points_cam),
                              jnp.asarray(f.rgb), jnp.asarray(f.mask),
                              jnp.asarray(f.pose))
        if (i + 1) % refine_every == 0:
            grid = pipe.refine(grid)
    grid = pipe.refine(grid)
    return to_host(pipe.extract(grid))


def _run_sharded(frames, n_dev, refine_every=2):
    sf = ShardedFusion(CFG, n_devices=n_dev)
    grid = sf.init()
    for i, f in enumerate(frames):
        grid = sf.integrate(grid, jnp.asarray(f.points_cam),
                            jnp.asarray(f.rgb), jnp.asarray(f.mask),
                            jnp.asarray(f.pose))
        if (i + 1) % refine_every == 0:
            grid = sf.refine(grid)
    grid = sf.refine(grid)
    return sf, grid, sf.extract(grid).to_host()


@pytest.mark.parametrize("n_dev", [2, 8])
def test_sharded_matches_single(n_dev):
    assert len(jax.devices()) >= n_dev, "conftest must set 8 cpu devices"
    frames = _frames()
    single = _run_single(frames)
    sf, grid, sharded = _run_sharded(frames, n_dev)
    # identical voxel sets in identical (globally sorted) order
    np.testing.assert_array_equal(sharded["cell"], single["cell"])
    np.testing.assert_array_equal(sharded["count"], single["count"])
    np.testing.assert_array_equal(sharded["n_pts"], single["n_pts"])
    dots = np.sum(sharded["normal"].astype(np.float64)
                  * single["normal"].astype(np.float64), axis=1)
    assert (dots > 0.9999).all()
    np.testing.assert_allclose(sharded["centroid"], single["centroid"],
                               atol=2e-6)
    np.testing.assert_allclose(sharded["sd"], single["sd"], atol=1e-10)
    np.testing.assert_allclose(sharded["mean_dist"], single["mean_dist"],
                               atol=1e-7)
    m = sf.metrics(grid)
    assert m["overflow_probe"] == 0
    assert m["devices"] == n_dev


def test_sharded_sweep_scan():
    frames = _frames(4, 400, seed=9)
    pts = jnp.asarray(np.stack([f.points_cam for f in frames]))
    rgb = jnp.asarray(np.stack([f.rgb for f in frames]))
    mask = jnp.asarray(np.stack([f.mask for f in frames]))
    poses = jnp.asarray(np.stack([f.pose for f in frames]))

    cfg = small_test_config(refine_every=2)
    sf = ShardedFusion(cfg, n_devices=4)
    grid = sf.run_sweep(sf.init(), pts, rgb, mask, poses)
    grid = sf.refine(grid)
    out = sf.extract(grid).to_host()

    pipe = FusionPipeline(cfg)
    g1 = pipe.run_sweep(pipe.init(), pts, rgb, mask, poses)
    g1 = pipe.refine(g1)
    ref = to_host(pipe.extract(g1))
    np.testing.assert_array_equal(out["cell"], ref["cell"])
    np.testing.assert_array_equal(out["count"], ref["count"])
