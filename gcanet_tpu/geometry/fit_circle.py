"""3-D circle fitting (JAX port of utils/fit_circle.py:117-152).

PCA plane fit -> Rodrigues rotation into the XY plane -> algebraic 2-D circle
least squares -> rotate the center back.  Fully vectorised / differentiable.
"""

from __future__ import annotations

import jax.numpy as jnp

from gcanet_tpu.ops.mathutil import safe_norm


def _rodrigues_rot(p, n0, n1):
    """Rotate points by the rotation taking unit vector n0 to n1 (fit_circle.py:86-104)."""
    n0 = n0 / (safe_norm(n0, axis=-1) + 1e-12)
    n1 = n1 / (safe_norm(n1, axis=-1) + 1e-12)
    k = jnp.cross(n0, n1)
    k_norm = safe_norm(k, axis=-1)
    # degenerate case n0 ~ +-n1: fall back to identity axis
    k = jnp.where(k_norm > 1e-8, k / (k_norm + 1e-12), jnp.array([1.0, 0.0, 0.0]))
    cos_t = jnp.clip(jnp.dot(n0, n1), -1.0, 1.0)
    sin_t = jnp.sqrt(jnp.clip(1.0 - cos_t**2, 0.0, 1.0))
    kxp = jnp.cross(jnp.broadcast_to(k, p.shape), p)
    kdp = (p @ k)[:, None]
    return p * cos_t + kxp * sin_t + k[None, :] * kdp * (1 - cos_t)


def fit_circle_2d(x, y):
    """Algebraic least-squares circle (fit_circle.py:59-77)."""
    a = jnp.stack([x, y, jnp.ones_like(x)], axis=1)
    b = x**2 + y**2
    ata = a.T @ a + 1e-9 * jnp.eye(3)
    c = jnp.linalg.solve(ata, a.T @ b)
    xc, yc = c[0] / 2, c[1] / 2
    r = jnp.sqrt(jnp.clip(c[2] + xc**2 + yc**2, min=1e-12))
    return xc, yc, r


def fit_circle_3d(points):
    """points [N, 3] -> (center [1, 3], radius scalar) (fit_circle.py:117-152)."""
    mean = points.mean(0)
    centered = points - mean
    # plane normal: smallest right singular vector of the centered cloud
    cov = centered.T @ centered
    _, v = jnp.linalg.eigh(cov)
    normal = v[:, 0]
    z = jnp.array([0.0, 0.0, 1.0])
    p_xy = _rodrigues_rot(centered, normal, z)
    xc, yc, r = fit_circle_2d(p_xy[:, 0], p_xy[:, 1])
    center = _rodrigues_rot(jnp.array([[xc, yc, 0.0]]), z, normal) + mean
    return center, r
