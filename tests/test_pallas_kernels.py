"""Pallas frontend kernel vs the pure-XLA reference path (interpret mode)."""

import jax.numpy as jnp
import numpy as np
import pytest

from hifi_fusion_tpu.config import small_test_config
from hifi_fusion_tpu.ops import geometry
from hifi_fusion_tpu.ops.pallas_kernels import transform_clip_cellid

CFG = small_test_config(z_clip=(0.28, 0.6))


def _xla_reference(pts, mask, pose, cfg):
    zmin, zmax = cfg.z_clip
    zclip = (pts[2] > zmin) & (pts[2] < zmax)
    world = geometry.transform_points(pts, pose)
    coords = geometry.cell_coords(world, cfg)
    valid = (mask & zclip
             & geometry.valid_points(world, cfg)
             & geometry.valid_coords(coords, cfg))
    return world, geometry.cell_id(coords, cfg), valid


@pytest.mark.parametrize("n", [4096, 5000])
def test_frontend_matches_xla(n):
    rng = np.random.default_rng(0)
    pts = rng.uniform(-0.5, 0.7, (3, n)).astype(np.float32)
    mask = rng.random(n) > 0.1
    theta = 0.4
    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = [[1, 0, 0],
                    [0, np.cos(theta), -np.sin(theta)],
                    [0, np.sin(theta), np.cos(theta)]]
    pose[:3, 3] = [0.05, -0.02, 0.3]

    world, ids, valid = transform_clip_cellid(
        jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(pose),
        config=CFG, interpret=True)
    w_ref, id_ref, v_ref = _xla_reference(
        jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(pose), CFG)

    assert world.shape == (3, n) and ids.shape == (n,)
    np.testing.assert_array_equal(np.asarray(valid), np.asarray(v_ref))
    np.testing.assert_allclose(np.asarray(world), np.asarray(w_ref),
                               atol=1e-6)
    v = np.asarray(v_ref)
    np.testing.assert_array_equal(np.asarray(ids)[v], np.asarray(id_ref)[v])


def test_frontend_all_masked():
    pts = jnp.zeros((3, 4096), jnp.float32)
    mask = jnp.zeros(4096, bool)
    world, ids, valid = transform_clip_cellid(
        pts, mask, jnp.eye(4, dtype=jnp.float32), config=CFG,
        interpret=True)
    assert not bool(valid.any())
