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


@pytest.mark.parametrize(
    "n_dev", [2, pytest.param(8, marks=pytest.mark.heavy)])
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


def test_flagship_bbox_1mm_shards_within_int32():
    """The launch-file bbox at 1 mm pitch (7.8 G logical cells — impossible
    both for the reference's dense storage, ~125 GB, and for a single
    int32-id grid) must be addressable via shard-LOCAL id spaces on an
    8-device mesh."""
    from hifi_fusion_tpu.config import FusionConfig
    flagship = FusionConfig(bbox=(-0.80, 1.80, -1.5, 1.5, 0.0, 1.0),
                            resolution=(0.001, 0.001, 0.001))
    n_cells_global = (flagship.global_x_cells
                      * flagship.dims[1] * flagship.dims[2])
    assert n_cells_global >= 2 ** 31          # single grid cannot hold it
    with pytest.raises(ValueError):
        flagship.validate()
    # per-shard local windows stay under the int32 cap on 8 devices
    sf = ShardedFusion(flagship, n_devices=8)
    assert sf.config.shard_x_cells == sf.slab_w + 2 * sf.halo
    assert sf.config.n_cells < 2 ** 31
    # local ids are globally unique after the host-side offset mapping:
    # shards tile the x axis in slab_w strides
    assert sf.slab_w * 8 >= flagship.global_x_cells


@pytest.mark.heavy
def test_sharded_ghosts_cross_slab_boundary():
    """A surface spanning slab boundaries: dependant lines and ghost voxels
    must behave identically sharded vs single-device (covered by the
    equality test, but this pins a refine-heavy cadence)."""
    frames = _frames(6, 700, seed=13)
    single = _run_single(frames, refine_every=1)
    _, _, sharded = _run_sharded(frames, 8, refine_every=1)
    np.testing.assert_array_equal(sharded["cell"], single["cell"])
    np.testing.assert_array_equal(sharded["count"], single["count"])


@pytest.mark.heavy
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
