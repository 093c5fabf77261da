"""Geometry stack tests: fits recover known primitives; distances vanish on
the surface; spline basis sanity; affinity matrices well-formed."""

import jax
import jax.numpy as jnp
import numpy as np

from gcanet_tpu.geometry import affinity as aff
from gcanet_tpu.geometry import fit_circle, fitting
from gcanet_tpu.geometry import primitive_dis as pdis
from gcanet_tpu.geometry import spline


def test_fit_plane_recovers_normal():
    rng = np.random.RandomState(0)
    n = np.array([0.0, 0.0, 1.0])
    pts = rng.randn(200, 3).astype(np.float32)
    pts[:, 2] = 2.0                                 # plane z = 2
    w = np.ones((200, 1), np.float32)
    a, d = fitting.fit_plane(jnp.asarray(pts), jnp.asarray(w))
    a = np.asarray(a)[0]
    assert abs(abs(a @ n) - 1.0) < 1e-3
    assert abs(abs(float(d)) - 2.0) < 1e-3


def test_fit_sphere_recovers_center_radius():
    rng = np.random.RandomState(1)
    c = np.array([0.5, -0.3, 0.2])
    r = 0.75
    d = rng.randn(500, 3)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    pts = (c + r * d).astype(np.float32)
    w = np.ones((500, 1), np.float32)
    center, radius = fitting.fit_sphere(jnp.asarray(pts), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(center)[0], c, atol=1e-3)
    assert abs(float(radius) - r) < 1e-3


def test_fit_cylinder_axis_and_radius():
    rng = np.random.RandomState(2)
    axis = np.array([0.0, 0.0, 1.0])
    r = 0.4
    theta = rng.uniform(0, 2 * np.pi, 400)
    h = rng.uniform(-1, 1, 400)
    pts = np.stack([r * np.cos(theta), r * np.sin(theta), h], 1).astype(np.float32)
    normals = np.stack([np.cos(theta), np.sin(theta), np.zeros(400)], 1).astype(np.float32)
    w = np.ones((400, 1), np.float32)
    a, center, radius = fitting.fit_cylinder(jnp.asarray(pts), jnp.asarray(normals),
                                             jnp.asarray(w))
    assert abs(abs(float(np.asarray(a)[:, 0] @ axis)) - 1.0) < 1e-2
    assert abs(float(radius) - r) < 1e-2


def test_fit_cone_recovers_apex_angle():
    rng = np.random.RandomState(3)
    theta = 0.5
    # cone with apex at origin, axis +z
    t = rng.uniform(0.2, 1.0, 600)
    phi = rng.uniform(0, 2 * np.pi, 600)
    r = t * np.tan(theta)
    pts = np.stack([r * np.cos(phi), r * np.sin(phi), t], 1).astype(np.float32)
    # outward normals
    axis_comp = -np.sin(theta)
    radial = np.cos(theta)
    normals = np.stack([radial * np.cos(phi), radial * np.sin(phi),
                        np.full(600, axis_comp)], 1).astype(np.float32)
    w = np.ones((600, 1), np.float32)
    apex, a, th = fitting.fit_cone(jnp.asarray(pts), jnp.asarray(normals),
                                   jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(apex)[:, 0], 0.0, atol=5e-2)
    assert abs(float(th) - theta) < 5e-2


def test_fit_circle_3d():
    rng = np.random.RandomState(4)
    t = rng.uniform(0, 2 * np.pi, 100)
    pts = np.stack([0.6 * np.cos(t) + 1.0, 0.6 * np.sin(t) - 2.0,
                    np.zeros(100)], 1).astype(np.float32)
    center, r = fit_circle.fit_circle_3d(jnp.asarray(pts))
    np.testing.assert_allclose(np.asarray(center)[0], [1.0, -2.0, 0.0], atol=1e-3)
    assert abs(float(r) - 0.6) < 1e-3


def test_distances_vanish_on_surface():
    rng = np.random.RandomState(5)
    pts = rng.randn(50, 3).astype(np.float32)
    pts[:, 2] = 0.0
    plane = np.zeros((1, 4), np.float32)
    plane[0, 2] = 1.0                               # z = 0
    d = np.asarray(pdis.distance_from_plane(jnp.asarray(pts), jnp.asarray(plane)))
    np.testing.assert_allclose(d, 0.0, atol=1e-6)

    sph = np.array([[0, 0, 0, 1.0]], np.float32)
    dirs = rng.randn(50, 3)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    d = np.asarray(pdis.distance_from_sphere(jnp.asarray(dirs.astype(np.float32)),
                                             jnp.asarray(sph)))
    np.testing.assert_allclose(d, 0.0, atol=1e-5)


def test_bspline_basis_partition_of_unity():
    nu, nv = spline.uniform_knot_bspline(20, 20, 3, 3, 30)
    np.testing.assert_allclose(nu.sum(1), 1.0, atol=1e-6)
    np.testing.assert_allclose(nv.sum(1), 1.0, atol=1e-6)
    # flat control grid -> flat surface
    u, v = np.meshgrid(np.linspace(0, 1, 20), np.linspace(0, 1, 20), indexing="ij")
    cp = np.stack([u, v, np.zeros_like(u)], -1).reshape(1, 400, 3).astype(np.float32)
    pts = np.asarray(spline.sample_points_from_control_points(nu, nv, jnp.asarray(cp)))
    np.testing.assert_allclose(pts[0, :, 2], 0.0, atol=1e-6)
    assert pts[0, :, 0].min() >= -1e-6 and pts[0, :, 0].max() <= 1 + 1e-6


def test_affinity_normal_shape_and_symmetry():
    rng = np.random.RandomState(6)
    xyz = rng.randn(1, 64, 3).astype(np.float32)
    nrm = rng.randn(1, 64, 3).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    a = np.asarray(aff.construction_affinity_matrix_normal(
        jnp.asarray(xyz), jnp.asarray(nrm), knn=8))
    assert a.shape == (1, 64, 64)
    assert np.isfinite(a).all()
    np.testing.assert_allclose(np.diagonal(a[0]), 0.0, atol=1e-6)


def test_affinity_type_well_formed():
    rng = np.random.RandomState(7)
    xyz = rng.randn(1, 64, 3).astype(np.float32)
    types = np.full((1, 64), 1)                     # all plane
    params = np.zeros((1, 64, 22), np.float32)
    params[..., 6] = 1.0                            # plane normal +z
    a = np.asarray(aff.construction_affinity_matrix_type(
        jnp.asarray(xyz), jnp.asarray(types), jnp.asarray(params)))
    assert a.shape == (1, 64, 64)
    assert np.isfinite(a).all()
    np.testing.assert_allclose(a[0], a[0].T, atol=1e-5)


def test_entropy_finite():
    feat = np.random.RandomState(8).randn(1, 128, 16).astype(np.float32)
    e = float(aff.compute_entropy(jnp.asarray(feat)))
    assert np.isfinite(e) and e > 0


def test_spline_refit_recovers_surface():
    import jax.numpy as jnp
    rng = np.random.RandomState(9)
    nu, nv = spline.uniform_knot_bspline(10, 10, 3, 3, 30)
    u, v = np.meshgrid(np.linspace(0, 1, 10), np.linspace(0, 1, 10), indexing="ij")
    cp_true = np.stack([u, v, 0.3 * np.sin(3 * u) * np.cos(2 * v)], -1)
    cp_true = cp_true.reshape(1, 100, 3).astype(np.float32)
    surface = np.asarray(spline.sample_points_from_control_points(nu, nv,
                                                                  jnp.asarray(cp_true)))[0]
    # fit from noisy surface samples
    pts = surface + 0.001 * rng.randn(*surface.shape).astype(np.float32)
    uv = spline.footpoint_uv(jnp.asarray(pts), jnp.asarray(surface), 30)
    cp_fit = spline.refit_control_points(jnp.asarray(pts), uv, nu, nv)
    resampled = np.asarray(spline.sample_points_from_control_points(
        nu, nv, jnp.asarray(cp_fit)[None]))[0]
    err = np.abs(resampled - surface).mean()
    assert err < 0.01


def test_surface_basis_partition_of_unity_scattered():
    rng = np.random.RandomState(0)
    params = rng.random_sample((64, 2))
    d = spline.surface_basis_at(params, 10, 10, 2, 2)
    np.testing.assert_allclose(d.sum(1), 1.0, atol=1e-9)
    assert (d >= 0).all()


def test_optimize_open_spline_kronecker_recovers_control_grid():
    """Done-criterion from the round-1 verdict: recover a known control grid
    from noisy surface samples (spec_utils.py:236-304 pipeline)."""
    rng = np.random.RandomState(1)
    # ground truth = a smooth 10x10 deg-2 surface; predict from a coarse
    # 20x20 deg-3 LSQ fit of it, then optimize back
    u, v = np.meshgrid(np.linspace(0, 1, 10), np.linspace(0, 1, 10),
                       indexing="ij")
    cp_true = np.stack([u, v, 0.3 * np.sin(2 * u) * np.cos(2 * v)],
                       -1).reshape(100, 3)
    d_true = spline.surface_basis_at(
        spline.regular_parameterization(40, 40), 10, 10, 2, 2)
    clean = d_true @ cp_true
    noisy = clean + 0.005 * rng.randn(*clean.shape)

    # "predicted" 20x20 control grid: direct LSQ through the noisy samples
    d20 = spline.surface_basis_at(
        spline.regular_parameterization(40, 40), 20, 20, 3, 3)
    cp_pred = np.asarray(spline.fit_surface_kronecker(noisy, d20, reg=1e-4))

    out_pts, new_cp = spline.optimize_spline_kronecker(
        noisy, cp_pred, closed=False, new_cp_size=10, new_degree=2,
        n_params=1600, out_grid=20, seed=0)
    d_out = spline.surface_basis_at(
        spline.regular_parameterization(20, 20), 10, 10, 2, 2)
    ref = d_out @ cp_true
    err = np.abs(out_pts - ref).max()
    assert err < 0.06, err                     # measured 0.042

    # the refit surface is closer to the true surface than the noisy inputs
    dense = spline.surface_basis_at(
        spline.regular_parameterization(80, 80), 10, 10, 2, 2) @ cp_true

    def chamfer(a, b):
        return np.linalg.norm(a[:, None] - b[None, :], axis=2).min(1).mean()

    assert chamfer(out_pts, dense) < chamfer(noisy, dense)


def test_fit_surface_kronecker_recovers_control_points():
    """The Kronecker LSQ itself recovers a known control grid exactly-ish
    when given true footpoint parameters (boundary coverage included, per the
    reference's own note, spec_utils.py:256-259)."""
    rng = np.random.RandomState(3)
    u, v = np.meshgrid(np.linspace(0, 1, 10), np.linspace(0, 1, 10),
                       indexing="ij")
    cp_true = np.stack([u, v, 0.2 * u * u - 0.1 * v], -1).reshape(100, 3)
    params = np.concatenate([rng.random_sample((500, 2)),
                             spline.boundary_parameterization(20)], 0)
    d = spline.surface_basis_at(params, 10, 10, 2, 2)
    pts = d @ cp_true + 0.002 * rng.randn(len(params), 3)
    cp_rec = np.asarray(spline.fit_surface_kronecker(pts, d, reg=1e-6))
    assert np.abs(cp_rec - cp_true).max() < 0.05


def test_optimize_close_spline_wraps_first_row():
    rng = np.random.RandomState(2)
    cp = rng.randn(420, 3) * 0.1
    cp[:20] = cp[400:420]                      # closed: first u-row == last
    pts = rng.randn(500, 3) * 0.1
    out, _ = spline.optimize_spline_kronecker(
        pts, cp, closed=True, new_cp_size=8, new_degree=3,
        deform=False, n_params=300, out_grid=12, seed=0)
    assert out.shape == (12 * 12 + 12, 3)
    np.testing.assert_allclose(out[-12:], out[:12], atol=1e-6)


def test_arap_deform_translation_and_rigidity():
    """A flat grid pulled toward a translated copy moves toward it while
    approximately preserving edge lengths (the 'as-rigid-as-possible'
    property)."""
    g = 10
    u, v = np.meshgrid(np.linspace(0, 1, g), np.linspace(0, 1, g),
                       indexing="ij")
    grid = np.stack([u.ravel(), v.ravel(), np.zeros(g * g)], 1)
    # small rigid shift: nearest-point correspondences stay mostly true, so
    # the deform should converge onto the target with edge lengths intact
    shift = np.array([0.05, 0.05, 0.1])
    targets = grid + shift
    out = np.asarray(spline.arap_deform(grid, targets, g, g, iters=8,
                                        w_fit=0.5))
    assert np.linalg.norm(out - targets, axis=1).mean() < 0.01
    edges = spline._grid_edges(g, g)
    l0 = np.linalg.norm(grid[edges[:, 0]] - grid[edges[:, 1]], axis=1)
    l1 = np.linalg.norm(out[edges[:, 0]] - out[edges[:, 1]], axis=1)
    assert np.abs(l1 - l0).max() < 1e-3
