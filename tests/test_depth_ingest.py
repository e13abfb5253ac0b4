"""Sensor-native depth-image ingest (u16 z-depth + rgb565 + rays).

The 4 B/pixel wire format (utils/synthetic.DepthFrame — what a
RealSense-class camera actually emits as Z16+RGB565) must fuse to a grid
BIT-IDENTICAL to feeding the canonical dequantized f32 points through the
planar path: unprojection is one f32 multiply ``depth * (ray*scale)``
reproduced exactly on host (numpy) and device (XLA), so oracles and the
device consume identical inputs (bench.py --verify relies on it).
"""
import jax.numpy as jnp
import numpy as np

from hifi_fusion_tpu.config import small_test_config
from hifi_fusion_tpu.grid import make_grid, grid_metrics
from hifi_fusion_tpu.ops.extract import extract, to_host
from hifi_fusion_tpu.ops.integrate import integrate_frame
from hifi_fusion_tpu.ops.refine import refine_pass
from hifi_fusion_tpu.utils.synthetic import camera_rays, make_depth_sweep

# organized frames occupy more cells than the random sweeps (contiguous
# footprint + ghost lines) — give the probe chains headroom so overflow
# counters stay zero at the default load
CFG = small_test_config(z_clip=(0.05, 0.99), capacity_log2=16,
                        max_probes=64)
W, H = 64, 48
RAYS = camera_rays(W, H, fx=50.0, fy=50.0)


def _sweep(n=3, seed=21):
    return make_depth_sweep(CFG, n, width=W, height=H, seed=seed,
                            srays=RAYS, camera_height=0.4)


def test_depth_dequantization_matches_host_bitwise():
    for fr in _sweep(2):
        dev = np.asarray(jnp.asarray(fr.depth_q).astype(jnp.float32)[None, :]
                         * jnp.asarray(RAYS))
        np.testing.assert_array_equal(dev, fr.points_f32)
        # depth quantization error is below one u16 step along the ray
        assert np.abs(fr.points_f32[2] - 0.4).max() < 0.2


def test_depth_ingest_bit_identical_to_f32_path():
    frames = _sweep(4, seed=22)
    jrays = jnp.asarray(RAYS)

    def fuse(depth):
        grid = make_grid(CFG)
        for i, fr in enumerate(frames):
            if depth:
                grid = integrate_frame(
                    grid, jnp.asarray(fr.depth_q), jnp.asarray(fr.rgb565),
                    jnp.asarray(np.int32(fr.count)), jnp.asarray(fr.pose),
                    config=CFG, rays=jrays)
            else:
                n = fr.count
                mask = (np.arange(CFG.max_points) < n) & np.pad(
                    fr.depth_q > 0, (0, CFG.max_points - n))
                pts = np.zeros((3, CFG.max_points), np.float32)
                pts[:, :n] = fr.points_f32
                r = fr.rgb565.astype(np.uint32)
                rgbp = np.zeros((3, CFG.max_points), np.float32)
                rgbp[0, :n] = ((r >> 11) & 0x1F) * 8.0
                rgbp[1, :n] = ((r >> 5) & 0x3F) * 4.0
                rgbp[2, :n] = (r & 0x1F) * 8.0
                grid = integrate_frame(
                    grid, jnp.asarray(pts), jnp.asarray(rgbp),
                    jnp.asarray(mask), jnp.asarray(fr.pose), config=CFG)
            if (i + 1) % 2 == 0:
                grid = refine_pass(grid, config=CFG)
        return refine_pass(grid, config=CFG)

    a, b = fuse(False), fuse(True)
    ma, mb = grid_metrics(a, CFG), grid_metrics(b, CFG)
    assert ma == mb, (ma, mb)
    assert all(v == 0 for k, v in ma.items() if k.startswith("overflow"))
    ea, eb = to_host(extract(a, config=CFG)), to_host(extract(b, config=CFG))
    assert ea["cell"].size > 50
    for k in ea:
        np.testing.assert_array_equal(ea[k], eb[k], err_msg=k)


def test_zero_depth_pixels_are_invalid():
    fr = _sweep(1, seed=23)[0]
    dq = np.array(fr.depth_q)
    dq[::3] = 0                      # sensor dropouts
    g = integrate_frame(make_grid(CFG), jnp.asarray(dq),
                        jnp.asarray(fr.rgb565),
                        jnp.asarray(np.int32(fr.count)),
                        jnp.asarray(fr.pose), config=CFG,
                        rays=jnp.asarray(RAYS))
    C = CFG.capacity                 # arrays carry a masked-scatter tail
    kept = int(np.sum(np.asarray(g.n_pts)[:C]))
    alive = int(np.sum(dq > 0))
    assert kept <= alive
    # dropping pixels must never ADD occupancy vs the full frame
    g_full = integrate_frame(make_grid(CFG), jnp.asarray(fr.depth_q),
                             jnp.asarray(fr.rgb565),
                             jnp.asarray(np.int32(fr.count)),
                             jnp.asarray(fr.pose), config=CFG,
                             rays=jnp.asarray(RAYS))
    assert kept < int(np.sum(np.asarray(g_full.n_pts)[:C]))
