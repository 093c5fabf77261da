"""Differentiable weighted primitive fitting (JAX port of utils/fitting_func.py).

  * ``lstsq``            (:43-79)  — regularised least squares (no host-side
                                    rank checks: a fixed Tikhonov term keeps the
                                    solve jit-compatible and well-conditioned)
  * ``smallest_right_singular`` — the guarded SVD of :81-116; gradients are
    taken through an eigh of AtA with clamped spectral gaps (eq.13 of
    arXiv:1509.07838 as referenced there)
  * ``fit_plane``        (:122-143)
  * ``fit_sphere``       (:160-183)
  * ``fit_cylinder``     (:200-230) — with the on-device circle fit
  * ``fit_cone``         (:232-266)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gcanet_tpu.geometry.fit_circle import fit_circle_3d
from gcanet_tpu.ops.mathutil import safe_norm

EPS = 1.1920929e-07


def guard_sqrt(x, minimum=1e-5):
    return jnp.sqrt(jnp.clip(x, min=minimum))


def lstsq(a, y, lamb=1e-6):
    """min ||Ax - y||^2 + lamb ||x||^2 via normal equations (jit-safe)."""
    cols = a.shape[1]
    ata = a.T @ a + lamb * jnp.eye(cols, dtype=a.dtype)
    return jnp.linalg.solve(ata, a.T @ y)


@jax.custom_jvp
def _eigh_guarded(ata):
    return jnp.linalg.eigh(ata)


@_eigh_guarded.defjvp
def _eigh_guarded_jvp(primals, tangents):
    """eigh JVP with clamped spectral gaps so degenerate (equal-eigenvalue)
    inputs give large-but-finite gradients instead of inf — the same guard as
    CustomSVD (fitting_func.py:81-116)."""
    (ata,), (dat,) = primals, tangents
    w, v = jnp.linalg.eigh(ata)
    vt_dat_v = v.T @ dat @ v
    gaps = w[None, :] - w[:, None]
    # clamp tiny gaps: K_ij = 1/(w_j - w_i) with |gap| >= 1e-6
    safe = jnp.where(jnp.abs(gaps) < 1e-6, jnp.sign(gaps + 1e-30) * 1e-6, gaps)
    k = jnp.where(jnp.eye(w.shape[0], dtype=bool), 0.0, 1.0 / safe)
    dw = jnp.diagonal(vt_dat_v)
    dv = v @ (k * vt_dat_v)
    return (w, v), (dw, dv)


def smallest_right_singular(a):
    """Right singular vector of the smallest singular value of ``a [N, 3]``."""
    ata = a.T @ a
    _, v = _eigh_guarded(ata)
    return v[:, 0]                       # eigh sorts ascending


def fit_plane(points, weights):
    """Weighted plane fit (fitting_func.py:122-143).

    points [N, 3], weights [N, 1] -> (normal [1, 3], offset scalar)."""
    wsum = jnp.sum(weights) + EPS
    x = points - jnp.sum(weights * points, 0, keepdims=True) / wsum
    a = smallest_right_singular(weights * x).reshape(1, 3)
    d = jnp.sum(weights * (points @ a.T)) / wsum
    return a, d


def fit_sphere(points, weights):
    """fitting_func.py:160-183 -> (center [1, 3], radius scalar)."""
    n = points.shape[0]
    wsum = jnp.sum(weights) + EPS
    a = 2 * (-points + jnp.sum(points * weights, 0) / wsum)
    dots = weights * jnp.sum(points * points, 1, keepdims=True)
    y = (dots - jnp.sum(dots) / wsum).reshape(n, 1)
    center = -lstsq(weights * a, weights * y, 0.01).reshape(1, 3)
    r2 = jnp.sum(weights[:, 0] * jnp.sum((points - center) ** 2, 1)) / wsum
    return center, guard_sqrt(jnp.clip(r2, min=1e-3))


def fit_cylinder(points, normals, weights):
    """fitting_func.py:200-230 -> (axis [3, 1], center [1, 3], radius)."""
    a = smallest_right_singular(weights * normals).reshape(3, 1)
    a = a / (safe_norm(a, axis=0, keepdims=True) + EPS)
    prj = points - (points @ a) @ a.T          # project out the axis
    center, radius = fit_circle_3d(prj)
    return a, center, radius


def fit_cone(points, normals, weights):
    """fitting_func.py:232-266 -> (apex [3, 1], axis [1, 3], theta scalar)."""
    n = points.shape[0]
    a_mat = weights * normals
    y = weights * jnp.sum(normals * points, 1).reshape(n, 1)
    c = lstsq(a_mat, y, lamb=1e-3)

    a, _ = fit_plane(normals, weights)
    flip = jnp.sum(normals @ a.T) > 0          # axis points inside the cone
    a = jnp.where(flip, -a, a)

    diff = points - c.T
    diff = diff / (safe_norm(diff, axis=1, keepdims=True) + EPS)
    proj = jnp.clip(jnp.abs(diff @ a.T), max=0.999)
    theta = jnp.sum(weights * jnp.arccos(proj)) / (jnp.sum(weights) + EPS)
    return c, a, jnp.clip(theta, 1e-3, 3.142 / 2 - 1e-3)
