"""Unit tests: grid geometry semantics + analytic eigen33 (survey §4).

Device geometry uses the planar (3, N) component-major layout.
"""

import jax.numpy as jnp
import numpy as np

from hifi_fusion_tpu.config import small_test_config
from hifi_fusion_tpu.ops import geometry
from hifi_fusion_tpu.ops.eigen33 import smallest_eigenpair


CFG = small_test_config()


def test_cell_roundtrip():
    rng = np.random.default_rng(1)
    dims = np.asarray(CFG.dims)
    coords = rng.integers(0, dims, size=(500, 3)).astype(np.int32).T
    ids = geometry.cell_id(jnp.asarray(coords), CFG)
    back = geometry.id_to_coords(ids, CFG)
    assert (np.asarray(back) == coords).all()


def test_cell_coords_floor_and_center():
    p = jnp.asarray([[-0.32 + 0.015], [0.0], [0.0]], jnp.float32)
    c = geometry.cell_coords(p, CFG)
    assert int(c[0, 0]) == 1           # 0.015/0.01 -> cell 1
    ctr = geometry.cell_center(c, CFG)
    np.testing.assert_allclose(float(ctr[0, 0]), -0.32 + 0.015, atol=1e-6)


def test_valid_points_exclusive_bounds():
    # The reference drops boundary points on BOTH ends (GRID.hpp:639-645).
    b = CFG.bbox
    pts = jnp.asarray([
        [b[0], 0.0, 0.0],
        [b[1], 0.0, 0.0],
        [0.0, b[2], 0.0],
        [0.0, 0.0, b[5]],
        [0.0, 0.0, 0.0],
    ], jnp.float32).T
    v = np.asarray(geometry.valid_points(pts, CFG))
    assert (v == [False, False, False, False, True]).all()


def test_valid_coords():
    dims = CFG.dims
    cs = jnp.asarray([[0, 0, 0], [dims[0] - 1, 0, 0], [dims[0], 0, 0],
                      [-1, 0, 0]], jnp.int32).T
    v = np.asarray(geometry.valid_coords(cs, CFG))
    assert (v == [True, True, False, False]).all()


def test_projection_matches_reference_formula():
    # projectPointToVector (GRID.hpp:40-49) == c + ((p-c)·n)n for unit n.
    rng = np.random.default_rng(2)
    for _ in range(20):
        c = rng.normal(size=3)
        n = rng.normal(size=3)
        n = n / np.linalg.norm(n)
        p = c + rng.normal(scale=0.01, size=3)
        r_ball = 0.015
        a = c - r_ball * n
        bb = c + r_ball * n
        ap = a - p
        ab = a - bb
        proj_ref = a - (ap @ ab) / (ab @ ab) * ab
        q_proj, dist = geometry.project_to_axis(
            jnp.asarray((p - c)[:, None], jnp.float32),
            jnp.asarray(n[:, None], jnp.float32))
        np.testing.assert_allclose(np.asarray(q_proj)[:, 0] + c, proj_ref,
                                   atol=1e-6)
        np.testing.assert_allclose(
            float(dist[0]), np.linalg.norm(p - proj_ref), atol=1e-6)


def test_transform_points():
    rng = np.random.default_rng(3)
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    theta = 0.7
    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = np.asarray([
        [np.cos(theta), -np.sin(theta), 0],
        [np.sin(theta), np.cos(theta), 0],
        [0, 0, 1]], np.float32)
    pose[:3, 3] = [0.1, -0.2, 0.3]
    out = geometry.transform_points(jnp.asarray(pts.T), jnp.asarray(pose))
    ref = pts @ pose[:3, :3].T + pose[:3, 3]
    np.testing.assert_allclose(np.asarray(out).T, ref, atol=1e-5)


def test_eigen33_vs_numpy():
    rng = np.random.default_rng(4)
    mats = []
    for _ in range(256):
        a = rng.normal(size=(8, 3))
        mats.append(np.cov(a.T, bias=True))
    cov = jnp.asarray(np.stack(mats), jnp.float32)
    val, vec = smallest_eigenpair(cov)
    val, vec = np.asarray(val), np.asarray(vec)
    for i, m in enumerate(mats):
        w, v = np.linalg.eigh(m)
        np.testing.assert_allclose(val[i], w[0], rtol=2e-3, atol=1e-6)
        # eigenvector up to sign
        assert abs(float(np.dot(vec[i], v[:, 0]))) > 0.999, i
        np.testing.assert_allclose(np.linalg.norm(vec[i]), 1.0, atol=1e-5)


def test_eigen33_planar_degenerate():
    # exactly planar points -> zero smallest eigenvalue, normal = plane normal
    pts = np.asarray([[x, y, 0.0] for x in range(-2, 3)
                      for y in range(-2, 3)], np.float64) * 0.01
    cov = np.cov(pts.T, bias=True)
    val, vec = smallest_eigenpair(jnp.asarray(cov[None], jnp.float32))
    assert abs(float(val[0])) < 1e-8
    assert abs(float(np.asarray(vec)[0] @ np.asarray([0, 0, 1.0]))) > 0.999


def test_eigen33_isotropic_fallback():
    cov = jnp.eye(3, dtype=jnp.float32)[None] * 2.0
    val, vec = smallest_eigenpair(cov)
    np.testing.assert_allclose(float(val[0]), 2.0, rtol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(vec)[0]), 1.0,
                               atol=1e-5)
