"""B-spline surface utilities (geomdl-free).

Replaces the parts of ``utils/spec_utils.py`` the GCANet path can reach:
  * ``uniform_knot_bspline``            (spec_utils.py:107) — basis matrices
    for a uniform-knot B-spline surface, evaluated at a regular grid.
  * ``sample_points_from_control_points`` (spec_utils.py:221) — surface points
    as ``Nu @ CP @ Nv^T`` per coordinate.
  * ``standardize_points``              (spec_utils.py:129) — PCA alignment
    used before the spline-control-point network.

The basis is computed with Cox–de Boor recursion in numpy (static shapes),
so sampling is a pair of small matmuls on device.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def bspline_basis(num_ctrl: int, degree: int, num_samples: int) -> np.ndarray:
    """Cox–de Boor basis matrix [num_samples, num_ctrl] on a clamped uniform knot
    vector, evaluated at num_samples uniform parameters in [0, 1]."""
    p = degree
    n = num_ctrl
    m = n + p + 1
    knots = np.concatenate([
        np.zeros(p + 1),
        np.arange(1, n - p) / (n - p),
        np.ones(p + 1),
    ])
    assert len(knots) == m
    ts = np.linspace(0.0, 1.0, num_samples)
    ts[-1] = 1.0 - 1e-9                            # stay inside the last span
    basis = np.zeros((num_samples, n))
    for si, t in enumerate(ts):
        b = np.zeros(m - 1)
        for i in range(m - 1):
            b[i] = 1.0 if knots[i] <= t < knots[i + 1] else 0.0
        for d in range(1, p + 1):
            nb = np.zeros(m - 1)
            for i in range(m - d - 1):
                left = 0.0
                if knots[i + d] > knots[i]:
                    left = (t - knots[i]) / (knots[i + d] - knots[i]) * b[i]
                right = 0.0
                if knots[i + d + 1] > knots[i + 1]:
                    right = (knots[i + d + 1] - t) / (knots[i + d + 1] - knots[i + 1]) * b[i + 1]
                nb[i] = left + right
            b = nb
        basis[si] = b[:n]
    return basis


def uniform_knot_bspline(nu_ctrl: int, nv_ctrl: int, degree_u: int,
                         degree_v: int, grid: int):
    """(nu [grid, nu_ctrl], nv [grid, nv_ctrl]) basis matrices (spec_utils.py:107)."""
    return (bspline_basis(nu_ctrl, degree_u, grid),
            bspline_basis(nv_ctrl, degree_v, grid))


def sample_points_from_control_points(nu, nv, control_points):
    """control_points [B, nu_ctrl*nv_ctrl, 3] -> surface samples [B, grid*grid, 3]."""
    b = control_points.shape[0]
    cu, cv = nu.shape[1], nv.shape[1]
    cp = control_points.reshape(b, cu, cv, 3)
    pts = jnp.einsum("gu,buvc,hv->bghc", jnp.asarray(nu), cp, jnp.asarray(nv))
    return pts.reshape(b, -1, 3)


def standardize_points(points, weights=None):
    """PCA-align a cloud: center, rotate to principal axes, scale to unit box.

    Returns (aligned [B, N, 3], scales [B, 3], means [B, 3], rot [B, 3, 3]);
    semantics of spec_utils.py:129-180 (standardize_points_torch).
    """
    b = points.shape[0]
    if weights is None:
        weights = jnp.ones(points.shape[:2] + (1,), points.dtype)
    wsum = jnp.sum(weights, axis=1, keepdims=True) + 1e-12
    means = jnp.sum(points * weights, axis=1, keepdims=True) / wsum
    x = points - means
    cov = jnp.einsum("bni,bnj->bij", x * weights, x)
    _, v = jnp.linalg.eigh(cov)
    rot = v[..., ::-1].swapaxes(-1, -2)            # principal axes first
    aligned = jnp.einsum("bij,bnj->bni", rot, x)
    scales = jnp.max(jnp.abs(aligned), axis=1) + 1e-12
    aligned = aligned / scales[:, None, :]
    return aligned, scales, means[:, 0], rot


def refit_control_points(points, uv, nu, nv, reg: float = 1e-4):
    """Least-squares B-spline surface refit (the working core of the
    reference's ``optimize_open_spline_kronecker`` / ``optimize_close_spline_
    kronecker``, spec_utils.py:236-330, whose upstream module is missing from
    the snapshot).

    points [M, 3] targets; uv [M, 2] footpoint parameters in [0, 1]^2
    (e.g. nearest sampled-surface parameter); returns control points
    [nu_ctrl * nv_ctrl, 3] minimising ||B(u,v) CP - P||^2 + reg ||CP||^2.
    The design matrix rows are Kronecker products of the 1-D bases.
    """
    nu = jnp.asarray(nu)
    nv = jnp.asarray(nv)
    grid = nu.shape[0]
    ui = jnp.clip((uv[:, 0] * (grid - 1)).astype(jnp.int32), 0, grid - 1)
    vi = jnp.clip((uv[:, 1] * (grid - 1)).astype(jnp.int32), 0, grid - 1)
    bu = nu[ui]                                    # [M, nu_ctrl]
    bv = nv[vi]                                    # [M, nv_ctrl]
    design = (bu[:, :, None] * bv[:, None, :]).reshape(points.shape[0], -1)
    ata = design.T @ design + reg * jnp.eye(design.shape[1])
    return jnp.linalg.solve(ata, design.T @ points)


def footpoint_uv(points, surface_samples, grid: int):
    """Nearest-sample footpoint parameters: surface_samples [grid*grid, 3]
    sampled on the regular (u, v) lattice."""
    d2 = jnp.sum((points[:, None, :] - surface_samples[None, :, :]) ** 2, -1)
    idx = jnp.argmin(d2, axis=1)
    u = (idx // grid).astype(jnp.float32) / (grid - 1)
    v = (idx % grid).astype(jnp.float32) / (grid - 1)
    return jnp.stack([u, v], axis=1)
