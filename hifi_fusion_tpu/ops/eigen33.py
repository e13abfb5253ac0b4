"""Batched analytic symmetric 3x3 eigensolver (smallest eigenpair).

TPU-native replacement for ``pcl::eigen33`` (used via solvePlaneParameters,
OccupancyGrid.hpp:282-293): closed-form trigonometric (Cardano) eigenvalues
plus a cross-product eigenvector extraction, fully vectorized over a batch of
covariance matrices — no iteration, no data-dependent control flow, pure VPU
math.  Matches PCL's convention of returning the eigenvector of the
*smallest* eigenvalue (the plane normal of a PCA patch).

LAYOUT: the batch API takes the six unique components as separate (U,)
arrays and returns a planar (3, U) eigenvector — an (U, 3, 3) tensor would
pad its minor 3x3 to an 8x128 TPU tile (≈550x waste); component arrays pad
nothing.  ``smallest_eigenpair`` keeps the (..., 3, 3) matrix interface for
tests and host code.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

_EPS = 1e-20


def smallest_eigenpair_sym(a00, a01, a02, a11, a12, a22
                           ) -> Tuple[jax.Array, jax.Array]:
    """Component-wise batched solver.

    Inputs: the six unique entries of symmetric matrices, any common shape S.
    Returns ``(eigenvalue S, eigenvector (3,) + S planar)``; eigenvector sign
    is arbitrary (callers orient it, e.g. toward the viewpoint as in
    OccupancyGrid.hpp:393-396).
    """
    # Scale normalization for numerical robustness.
    scale = jnp.maximum(
        jnp.maximum(jnp.maximum(jnp.abs(a00), jnp.abs(a11)),
                    jnp.maximum(jnp.abs(a22), jnp.abs(a01))),
        jnp.maximum(jnp.abs(a02), jnp.abs(a12)))
    scale = jnp.where(scale < _EPS, 1.0, scale)
    a00, a01, a02 = a00 / scale, a01 / scale, a02 / scale
    a11, a12, a22 = a11 / scale, a12 / scale, a22 / scale

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
    eig_min = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    eig_min = jnp.where(p < _EPS, q, eig_min)    # degenerate: A ~ q*I

    vec = _eigenvector_sym(a00, a01, a02, a11, a12, a22, eig_min)
    return eig_min * scale, vec


def _eigenvector_sym(a00, a01, a02, a11, a12, a22, lam) -> jax.Array:
    """Null-space direction of (A - lam I) via the largest row cross product
    — the same trick pcl::eigen33 uses, component-wise."""
    m00, m11, m22 = a00 - lam, a11 - lam, a22 - lam
    # rows: r0 = (m00, a01, a02), r1 = (a01, m11, a12), r2 = (a02, a12, m22)
    def cross(ax, ay, az, bx, by, bz):
        return (ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx)

    c01 = cross(m00, a01, a02, a01, m11, a12)
    c02 = cross(m00, a01, a02, a02, a12, m22)
    c12 = cross(a01, m11, a12, a02, a12, m22)

    def sq(c):
        return c[0] * c[0] + c[1] * c[1] + c[2] * c[2]

    n01, n02, n12 = sq(c01), sq(c02), sq(c12)
    best12 = n12 > jnp.maximum(n01, n02)
    best02 = (n02 >= n12) & (n02 > n01)

    def pick(i):
        v = jnp.where(best12, c12[i], jnp.where(best02, c02[i], c01[i]))
        return v

    vx, vy, vz = pick(0), pick(1), pick(2)
    nrm2 = jnp.maximum(vx * vx + vy * vy + vz * vz, 0.0)
    nrm = jnp.sqrt(nrm2)
    ok = nrm > 1e-12
    inv = jnp.where(ok, 1.0 / jnp.where(nrm < 1e-30, 1.0, nrm), 0.0)
    # Fully degenerate (repeated eigenvalue): coordinate axis with the
    # smallest |diagonal| of M.
    d0, d1, d2 = jnp.abs(m00), jnp.abs(m11), jnp.abs(m22)
    f0 = (d0 <= d1) & (d0 <= d2)
    f1 = ~f0 & (d1 <= d2)
    f2 = ~f0 & ~f1
    fx = jnp.where(f0, 1.0, 0.0)
    fy = jnp.where(f1, 1.0, 0.0)
    fz = jnp.where(f2, 1.0, 0.0)
    vx = jnp.where(ok, vx * inv, fx)
    vy = jnp.where(ok, vy * inv, fy)
    vz = jnp.where(ok, vz * inv, fz)
    return jnp.stack([vx, vy, vz], axis=0)


def smallest_eigenpair(cov: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Matrix interface: (..., 3, 3) -> (eigval (...), eigvec (..., 3)).

    Convenience wrapper for tests/host use; device code should call
    ``smallest_eigenpair_sym`` with component arrays.
    """
    val, vec = smallest_eigenpair_sym(
        cov[..., 0, 0], cov[..., 0, 1], cov[..., 0, 2],
        cov[..., 1, 1], cov[..., 1, 2], cov[..., 2, 2])
    return val, jnp.moveaxis(vec, 0, -1)
