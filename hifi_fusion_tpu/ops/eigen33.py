"""Batched analytic symmetric 3x3 eigensolver (smallest eigenpair).

TPU-native replacement for ``pcl::eigen33`` (used via solvePlaneParameters,
OccupancyGrid.hpp:282-293): closed-form trigonometric (Cardano) eigenvalues
plus a cross-product eigenvector extraction, fully vectorized over a batch of
covariance matrices — no iteration, no data-dependent control flow, pure VPU
math.  Matches PCL's convention of returning the eigenvector of the *smallest*
eigenvalue (the plane normal of a PCA patch).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

_EPS = 1e-20


def smallest_eigenpair(cov: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(...,3,3) symmetric matrices -> (eigenvalue (...,), eigenvector (...,3)).

    The eigenvector is unit-norm; its sign is arbitrary (callers orient it,
    e.g. toward the viewpoint as in OccupancyGrid.hpp:393-396).
    """
    # Scale normalization for numerical robustness.
    scale = jnp.max(jnp.abs(cov), axis=(-2, -1), keepdims=True)
    scale = jnp.where(scale < _EPS, 1.0, scale)
    A = cov / scale

    a00 = A[..., 0, 0]
    a01 = A[..., 0, 1]
    a02 = A[..., 0, 2]
    a11 = A[..., 1, 1]
    a12 = A[..., 1, 2]
    a22 = A[..., 2, 2]

    p1 = a01 * a01 + a02 * a02 + a12 * a12
    q = (a00 + a11 + a22) / 3.0
    b00, b11, b22 = a00 - q, a11 - q, a22 - q
    p2 = b00 * b00 + b11 * b11 + b22 * b22 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 0.0))
    safe_p = jnp.where(p < _EPS, 1.0, p)

    # det(B)/2 with B = (A - qI)/p
    detB = (b00 * (b11 * b22 - a12 * a12)
            - a01 * (a01 * b22 - a12 * a02)
            + a02 * (a01 * a12 - b11 * a02)) / (safe_p ** 3)
    r = jnp.clip(detB / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0

    eig_max = q + 2.0 * p * jnp.cos(phi)
    eig_min = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    # Degenerate (p ~ 0): A ~ q*I, every direction is an eigenvector.
    eig_min = jnp.where(p < _EPS, q, eig_min)

    vec = _eigenvector(A, eig_min)
    return eig_min * scale[..., 0, 0], vec


def _eigenvector(A: jax.Array, lam: jax.Array) -> jax.Array:
    """Null-space direction of (A - lam I) via the largest row cross product.

    For a symmetric matrix with eigenvalue lam, any two independent rows of
    (A - lam I) have a cross product along the eigenvector.  We compute all
    three pairwise cross products and pick the largest (most numerically
    stable) — the same trick pcl::eigen33 uses.
    """
    M = A - lam[..., None, None] * jnp.eye(3, dtype=A.dtype)
    r0, r1, r2 = M[..., 0, :], M[..., 1, :], M[..., 2, :]
    c01 = jnp.cross(r0, r1)
    c02 = jnp.cross(r0, r2)
    c12 = jnp.cross(r1, r2)
    n01 = jnp.sum(c01 * c01, axis=-1)
    n02 = jnp.sum(c02 * c02, axis=-1)
    n12 = jnp.sum(c12 * c12, axis=-1)
    best = jnp.stack([n01, n02, n12], axis=-1)
    idx = jnp.argmax(best, axis=-1)
    cand = jnp.stack([c01, c02, c12], axis=-2)     # (...,3,3)
    vec = jnp.take_along_axis(cand, idx[..., None, None].repeat(3, -1),
                              axis=-2)[..., 0, :]
    nrm = jnp.linalg.norm(vec, axis=-1, keepdims=True)
    # Fully degenerate (multiple eigenvalue): fall back to the coordinate
    # axis with the smallest diagonal entry of M.
    fallback_idx = jnp.argmin(jnp.abs(jnp.stack(
        [M[..., 0, 0], M[..., 1, 1], M[..., 2, 2]], axis=-1)), axis=-1)
    fallback = jax.nn.one_hot(fallback_idx, 3, dtype=A.dtype)
    ok = nrm[..., 0] > 1e-12
    vec = jnp.where(ok[..., None], vec / jnp.where(nrm < 1e-30, 1.0, nrm),
                    fallback)
    return vec
