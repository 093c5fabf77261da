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


def bspline_basis_at(ts: np.ndarray, num_ctrl: int, degree: int) -> np.ndarray:
    """Cox–de Boor basis matrix [len(ts), num_ctrl] on a clamped uniform knot
    vector, evaluated at arbitrary parameters in [0, 1]."""
    p = degree
    n = num_ctrl
    m = n + p + 1
    knots = np.concatenate([
        np.zeros(p + 1),
        np.arange(1, n - p) / (n - p),
        np.ones(p + 1),
    ])
    assert len(knots) == m
    ts = np.minimum(np.asarray(ts, np.float64), 1.0 - 1e-9)
    basis = np.zeros((len(ts), n))
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


def bspline_basis(num_ctrl: int, degree: int, num_samples: int) -> np.ndarray:
    """Basis matrix at ``num_samples`` uniform parameters in [0, 1]."""
    return bspline_basis_at(np.linspace(0.0, 1.0, num_samples),
                            num_ctrl, degree)


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


# --------------------------------------------------------------------------
# Spline refit ("kronecker optimize") path — spec_utils.py:236-382
# (optimize_open_spline_kronecker / optimize_close_spline_kronecker).  The
# reference's upstream helpers (src.approximation.fit_bezier_surface_fit_
# kronecker, src.curve_utils.DrawSurfs, src.fitting_optimization.Arap) are
# absent from the snapshot; their semantics are re-derived from the call
# sites: boundary+random parameterization, Hungarian parameter<->point
# matching, a Kronecker-structured least-squares control-point solve, and an
# optional ARAP deformation of the reconstructed grid toward the inputs.
# --------------------------------------------------------------------------


def regular_parameterization(nu: int, nv: int) -> np.ndarray:
    """[nu*nv, 2] regular (u, v) lattice in [0, 1]^2 (DrawSurfs.regular_
    parameterization call sites, spec_utils.py:299, 374)."""
    u, v = np.meshgrid(np.linspace(0, 1, nu), np.linspace(0, 1, nv),
                       indexing="ij")
    return np.stack([u.ravel(), v.ravel()], 1)


def boundary_parameterization(n: int) -> np.ndarray:
    """Parameters tracing the boundary of [0, 1]^2 (4(n-1) points) — the
    reference notes boundary coverage is necessary for a stable refit
    (spec_utils.py:256-259)."""
    t = np.linspace(0, 1, n)
    edges = [np.stack([t, np.zeros(n)], 1), np.stack([np.ones(n), t], 1),
             np.stack([t[::-1], np.ones(n)], 1),
             np.stack([np.zeros(n), t[::-1]], 1)]
    pts = np.concatenate([e[:-1] for e in edges], 0)
    return pts


def surface_basis_at(params: np.ndarray, cu: int, cv: int,
                     du: int, dv: int) -> np.ndarray:
    """Design matrix [M, cu*cv] whose row i is the Kronecker product
    NU[i] (x) NV[i] — evaluating a tensor-product surface at scattered
    parameters is then a single matmul (the 'kronecker' structure the
    reference's fit exploits, spec_utils.py:283-293)."""
    bu = bspline_basis_at(params[:, 0], cu, du)
    bv = bspline_basis_at(params[:, 1], cv, dv)
    return (bu[:, :, None] * bv[:, None, :]).reshape(len(params), cu * cv)


def fit_surface_kronecker(points, design, reg: float = 1e-6):
    """min_CP ||design @ CP - points||^2 + reg||CP||^2 -> CP [cu*cv, 3]
    (fit_bezier_surface_fit_kronecker semantics, spec_utils.py:293)."""
    design = jnp.asarray(design, jnp.float32)
    ata = design.T @ design + reg * jnp.eye(design.shape[1])
    return jnp.linalg.solve(ata, design.T @ jnp.asarray(points, jnp.float32))


def _grid_edges(gu: int, gv: int) -> np.ndarray:
    """Undirected 4-neighbourhood edges of a gu x gv vertex grid."""
    idx = np.arange(gu * gv).reshape(gu, gv)
    e = np.concatenate([
        np.stack([idx[:-1].ravel(), idx[1:].ravel()], 1),
        np.stack([idx[:, :-1].ravel(), idx[:, 1:].ravel()], 1)], 0)
    return e


def arap_deform(grid_points, targets, gu: int = 30, gv: int = 30,
                iters: int = 5, w_fit: float = 0.1):
    """As-rigid-as-possible deformation of a reconstructed surface grid toward
    the input cloud (Arap.deform call sites, spec_utils.py:243-249, 319-325).

    Classic local/global ARAP (Sorkine-Alexa) with a soft nearest-point data
    term: alternate (a) per-vertex rotation fit via 3x3 SVD of the deformed/
    rest edge covariance, (b) a global linear solve
    ``(L + w_fit I) P = b(R) + w_fit T`` with the fixed grid Laplacian L
    (Cholesky-prefactored once; every iteration is matmuls + one batched SVD,
    so the whole deform jits onto the MXU).

    grid_points [gu*gv, 3] rest vertices; targets [M, 3]; returns [gu*gv, 3].
    """
    from jax.scipy.linalg import cho_factor, cho_solve

    edges = _grid_edges(gu, gv)
    v = gu * gv
    lap = np.zeros((v, v), np.float32)
    for a, b in edges:
        lap[a, a] += 1.0
        lap[b, b] += 1.0
        lap[a, b] -= 1.0
        lap[b, a] -= 1.0
    system = jnp.asarray(lap) + w_fit * jnp.eye(v)
    factor = cho_factor(system)

    p0 = jnp.asarray(grid_points, jnp.float32)
    targets = jnp.asarray(targets, jnp.float32)
    ea, eb = jnp.asarray(edges[:, 0]), jnp.asarray(edges[:, 1])
    rest = p0[ea] - p0[eb]                          # [E, 3]

    def local_rotations(p):
        cur = p[ea] - p[eb]
        # per-vertex covariance: sum over incident edges (both directions)
        cov_e = rest[:, :, None] * cur[:, None, :]  # [E, 3, 3]
        cov = jnp.zeros((v, 3, 3)).at[ea].add(cov_e).at[eb].add(cov_e)
        u, _, vt = jnp.linalg.svd(cov)
        r = jnp.einsum("vij,vjk->vik", u, vt).transpose(0, 2, 1)
        flip = jnp.where(jnp.linalg.det(r) < 0, -1.0, 1.0)
        u_fix = u.at[:, :, -1].multiply(flip[:, None])
        return jnp.einsum("vij,vjk->vik", u_fix, vt).transpose(0, 2, 1)

    def step(p, _):
        t_idx = jnp.argmin(
            jnp.sum((p[:, None, :] - targets[None, :, :]) ** 2, -1), 1)
        r = local_rotations(p)
        r_edge = 0.5 * (r[ea] + r[eb])
        rhs_e = jnp.einsum("eij,ej->ei", r_edge, rest)
        rhs = (jnp.zeros((v, 3)).at[ea].add(rhs_e).at[eb].add(-rhs_e)
               + w_fit * targets[t_idx])
        return cho_solve(factor, rhs), None

    import jax

    out, _ = jax.lax.scan(step, p0, None, length=iters)
    return out


def _match_params_to_points(surface_pts: np.ndarray,
                            inputs: np.ndarray) -> np.ndarray:
    """Hungarian matching of sampled-surface points to input points
    (solve_dense call, spec_utils.py:276-281): returns inputs permuted so row
    i is the target for parameter i."""
    from scipy.optimize import linear_sum_assignment

    d = np.linalg.norm(surface_pts[:, None] - inputs[None, :], axis=2)
    rids, cids = linear_sum_assignment(d)
    out = np.empty_like(surface_pts)
    out[rids] = inputs[cids]
    return out


def _resample_to(points: np.ndarray, m: int, seed: int) -> np.ndarray:
    """Up/down-sample a cloud to exactly m points (up_sample_points_torch_in_
    range + random choice, spec_utils.py:271-274): jitter-duplicate when
    short, uniform subsample when long."""
    rng = np.random.RandomState(seed)
    pts = np.asarray(points, np.float32)
    while pts.shape[0] < m:
        take = rng.choice(pts.shape[0], min(pts.shape[0], m - pts.shape[0]),
                          replace=False)
        pts = np.concatenate([pts, pts[take]], 0)
    if pts.shape[0] > m:
        pts = pts[rng.choice(pts.shape[0], m, replace=False)]
    return pts


def optimize_spline_kronecker(input_points, control_points, closed: bool,
                              new_cp_size: int = 10, new_degree: int | None = None,
                              deform: bool = False, n_params: int = 1600,
                              out_grid: int = 30, seed: int = 0):
    """Post-fit spline refinement (optimize_open_spline_kronecker /
    optimize_close_spline_kronecker, spec_utils.py:236-382).

    1. Sample the PREDICTED surface (20x20 open / 21x20 closed control grid,
       degree 3) at boundary + random parameters.
    2. Optionally ARAP-deform the reconstructed grid toward the inputs and
       refit through the deformed samples.
    3. Hungarian-match sampled points to (resampled) input points so every
       parameter has a data target.
    4. Solve the Kronecker least-squares for a SMALLER control grid
       (new_cp_size^2, degree 2 open / 3 closed) through the matched targets.
    5. Evaluate on a regular out_grid^2 lattice; closed surfaces wrap by
       repeating the first u-row (930-point layout, spec_utils.py:377-381).

    input_points [N, 3]; control_points [400, 3] open / [420, 3] closed.
    Returns (optimized_points [out_grid^2 (+out_grid if closed), 3],
    new_control_points [new_cp_size^2, 3]).
    """
    if new_degree is None:
        new_degree = 3 if closed else 2
    cu = 21 if closed else 20
    rng = np.random.RandomState(seed)
    boundary = boundary_parameterization(30 if closed else 20)
    params = np.concatenate(
        [rng.random_sample((n_params - len(boundary), 2)), boundary], 0)

    cp = np.asarray(control_points, np.float32).reshape(cu, 20, 3)
    design_old = surface_basis_at(params, cu, 20, 3, 3)
    sampled = np.asarray(design_old @ cp.reshape(cu * 20, 3))

    inputs = _resample_to(np.asarray(input_points), n_params, seed)
    if deform:
        reg = regular_parameterization(out_grid, out_grid)
        grid0 = np.asarray(surface_basis_at(reg, cu, 20, 3, 3)
                           @ cp.reshape(cu * 20, 3))
        grid1 = np.asarray(arap_deform(grid0, inputs, out_grid, out_grid))
        # carry the deformation onto the scattered samples by refitting the
        # 20x20 grid through the deformed lattice, then re-sampling
        d_reg = surface_basis_at(reg, cu, 20, 3, 3)
        cp_def = np.asarray(fit_surface_kronecker(grid1, d_reg, reg=1e-4))
        sampled = np.asarray(design_old @ cp_def)

    matched = _match_params_to_points(sampled, inputs)

    design_new = surface_basis_at(params, new_cp_size, new_cp_size,
                                  new_degree, new_degree)
    new_cp = fit_surface_kronecker(matched, design_new, reg=1e-6)

    reg_params = regular_parameterization(out_grid, out_grid)
    out_pts = np.asarray(
        surface_basis_at(reg_params, new_cp_size, new_cp_size,
                         new_degree, new_degree) @ np.asarray(new_cp))
    if closed:
        grid = out_pts.reshape(out_grid, out_grid, 3)
        out_pts = np.concatenate([grid, grid[:1]], 0).reshape(-1, 3)
    return out_pts, np.asarray(new_cp)


def optimize_open_spline_kronecker(input_points, control_points,
                                   new_cp_size: int = 10, new_degree: int = 2,
                                   deform: bool = False, seed: int = 0):
    """spec_utils.py:236-304 semantics (open surface, 20x20 -> 10x10 deg 2)."""
    return optimize_spline_kronecker(input_points, control_points, False,
                                     new_cp_size, new_degree, deform,
                                     seed=seed)


def optimize_close_spline_kronecker(input_points, control_points,
                                    new_cp_size: int = 10, new_degree: int = 3,
                                    deform: bool = True, seed: int = 0):
    """spec_utils.py:306-382 semantics (closed surface, 21x20 control grid,
    wrapped 930-point output)."""
    return optimize_spline_kronecker(input_points, control_points, True,
                                     new_cp_size, new_degree, deform,
                                     seed=seed)
