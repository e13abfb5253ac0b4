"""Packed wire-format ingest (u16 points + u32 rgb + count scalar).

The compact ingest path (ops/integrate._unpack_inputs) must produce a grid
BIT-IDENTICAL to feeding the dequantized f32 points through the planar
path — the dequantization is the contract: the packer's power-of-two
scales make ``q * scale + offset`` reproduce the same f32 values on host
(numpy) and device (XLA, with or without FMA contraction), so the oracle
and the device consume identical inputs (bench.py --verify relies on it).
"""
import jax.numpy as jnp
import numpy as np

from hifi_fusion_tpu.config import small_test_config
from hifi_fusion_tpu.grid import make_grid, grid_metrics
from hifi_fusion_tpu.ops.extract import extract, to_host
from hifi_fusion_tpu.ops.integrate import integrate_frame
from hifi_fusion_tpu.ops.refine import refine_pass
from hifi_fusion_tpu.utils.synthetic import (make_sweep, pack_frame_q16,
                                             pad_frame)

CFG = small_test_config()


def test_dequantization_matches_host_bitwise():
    frames = make_sweep(CFG, 2, 1500, seed=11, surface_frac=0.7)
    for fr in frames:
        pk = pack_frame_q16(fr, CFG.max_points)
        dev = np.asarray(
            jnp.asarray(pk.points_q).astype(jnp.float32)
            * jnp.asarray(pk.quant)[0][:, None]
            + jnp.asarray(pk.quant)[1][:, None])
        np.testing.assert_array_equal(dev, pk.points_f32)
        # quantization error bounded by one step (scale <= 2*range/65535)
        n = pk.count
        err = np.abs(pk.points_f32[:, :n].T - fr.points_cam)
        assert err.max() <= pk.quant[0].max()


def test_packed_ingest_bit_identical_to_f32_path():
    frames = make_sweep(CFG, 4, 1800, seed=12, surface_frac=0.6)

    def fuse(packed):
        grid = make_grid(CFG)
        for i, fr in enumerate(frames):
            pk = pack_frame_q16(fr, CFG.max_points)
            if packed:
                grid = integrate_frame(
                    grid, jnp.asarray(pk.points_q), jnp.asarray(pk.rgb_u32),
                    jnp.asarray(np.int32(pk.count)), jnp.asarray(pk.pose),
                    config=CFG, quant=jnp.asarray(pk.quant))
            else:
                # the dequantized f32 frame through the planar path
                mask = np.zeros(CFG.max_points, bool)
                mask[:pk.count] = True
                rgbp = np.zeros((3, CFG.max_points), np.float32)
                rgbp[:, :pk.count] = fr.rgb.T
                grid = integrate_frame(
                    grid, jnp.asarray(pk.points_f32), jnp.asarray(rgbp),
                    jnp.asarray(mask), jnp.asarray(pk.pose), config=CFG)
            if (i + 1) % 2 == 0:
                grid = refine_pass(grid, config=CFG)
        grid = refine_pass(grid, config=CFG)
        return grid

    a, b = fuse(False), fuse(True)
    ma, mb = grid_metrics(a, CFG), grid_metrics(b, CFG)
    assert ma == mb, (ma, mb)
    assert all(v == 0 for k, v in ma.items() if k.startswith("overflow"))
    ea, eb = to_host(extract(a, config=CFG)), to_host(extract(b, config=CFG))
    assert ea["cell"].size > 100
    for k in ea:
        np.testing.assert_array_equal(ea[k], eb[k], err_msg=k)


def test_packed_count_prefix_masks_tail():
    fr = make_sweep(CFG, 1, 1000, seed=13)[0]
    pk = pack_frame_q16(fr, CFG.max_points)
    # poison the padding beyond count: must not affect the grid
    pq = np.array(pk.points_q)
    pq[:, pk.count:] = 12345
    rc = np.array(pk.rgb_u32)
    rc[pk.count:] = 0xFFFFFF
    g1 = integrate_frame(make_grid(CFG), jnp.asarray(pk.points_q),
                         jnp.asarray(pk.rgb_u32),
                         jnp.asarray(np.int32(pk.count)),
                         jnp.asarray(pk.pose), config=CFG,
                         quant=jnp.asarray(pk.quant))
    g2 = integrate_frame(make_grid(CFG), jnp.asarray(pq), jnp.asarray(rc),
                         jnp.asarray(np.int32(pk.count)),
                         jnp.asarray(pk.pose), config=CFG,
                         quant=jnp.asarray(pk.quant))
    assert grid_metrics(g1, CFG) == grid_metrics(g2, CFG)
    np.testing.assert_array_equal(np.asarray(g1.n_pts), np.asarray(g2.n_pts))
