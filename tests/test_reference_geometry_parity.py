"""Differential parity: geometry stack + RLE vs the reference's own code.

Exec-loads the reference's pure-python modules at test time (open3d stubbed,
its fit_circle injected as a module; nothing copied into the framework) and
compares on synthetic primitives: closed-form primitive distances (exact),
plane/sphere/cylinder/cone fits and the 3-D circle fit (tolerance — the
reference runs float64 torch/numpy SVD, ours float32 guarded-eigh), and the
run-length mask codec (exact).  Skips where the snapshot is absent.
"""

import pathlib
import sys
import types

import jax.numpy as jnp
import numpy as np
import pytest

from gcanet_tpu.geometry import fit_circle as ours_circle
from gcanet_tpu.geometry import fitting as ours_fit
from gcanet_tpu.geometry import primitive_dis as ours_dis
from gcanet_tpu.train import instances as ours_inst

REFROOT = pathlib.Path("/root/reference")

pytestmark = pytest.mark.skipif(not REFROOT.exists(),
                                reason="reference snapshot not available")


def _exec(path, ns=None):
    ns = ns if ns is not None else {}
    exec(compile(path.read_text(), str(path), "exec"), ns)
    return ns


@pytest.fixture(scope="module")
def ref():
    rle = _exec(REFROOT / "softgroup/util/rle.py")
    dis = _exec(REFROOT / "utils/primitive_dis.py")
    circ = _exec(REFROOT / "utils/fit_circle.py")
    circ_mod = types.ModuleType("fit_circle")
    vars(circ_mod).update(circ)
    o3d = types.ModuleType("open3d")
    o3d.io = types.SimpleNamespace(read_point_cloud=None,
                                   write_point_cloud=None)
    o3d.geometry = types.SimpleNamespace(PointCloud=None)
    o3d.utility = types.SimpleNamespace(Vector3dVector=None)
    saved = {k: sys.modules.get(k) for k in ("open3d", "fit_circle")}
    sys.modules.update({"open3d": o3d, "fit_circle": circ_mod})
    try:
        src = (REFROOT / "utils/fitting_func.py").read_text()
        # the snapshot predates torch 1.9's removal of torch.matrix_rank
        src = src.replace("torch.matrix_rank(", "torch.linalg.matrix_rank(")
        fit: dict = {}
        exec(compile(src, str(REFROOT / "utils/fitting_func.py"), "exec"),
             fit)
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    return {"rle": rle, "dis": dis, "circ": circ, "fit": fit}


def test_rle_codec_parity(ref):
    rng = np.random.RandomState(0)
    for frac in (0.0, 0.3, 1.0):
        mask = (rng.rand(500) < frac).astype(np.uint8)
        ours = ours_inst.rle_encode(mask)
        theirs = ref["rle"]["rle_encode"](mask)
        assert ours["length"] == theirs["length"]
        assert ours["counts"] == theirs["counts"]
        np.testing.assert_array_equal(ours_inst.rle_decode(theirs),
                                      ref["rle"]["rle_decode"](ours))


def test_primitive_distances_match(ref):
    import torch

    rng = np.random.RandomState(1)
    pts = rng.randn(60, 3).astype(np.float32)
    cpd = ref["dis"]["ComputePrimitiveDistance"](reduce=False)
    m = 4

    def nrm(x):
        return x / np.linalg.norm(x, axis=-1, keepdims=True)

    cases = {
        "plane": (np.hstack([nrm(rng.randn(m, 3)), rng.randn(m, 1)]),
                  ours_dis.distance_from_plane, cpd.distance_from_plane),
        "sphere": (np.hstack([rng.randn(m, 3), rng.rand(m, 1) + 0.5]),
                   ours_dis.distance_from_sphere, cpd.distance_from_sphere),
        "cylinder": (np.hstack([nrm(rng.randn(m, 3)), rng.randn(m, 3),
                                rng.rand(m, 1) + 0.5]),
                     ours_dis.distance_from_cylinder,
                     cpd.distance_from_cylinder),
        "cone": (np.hstack([rng.randn(m, 3), nrm(rng.randn(m, 3)),
                            rng.rand(m, 1) + 0.3]),
                 ours_dis.distance_from_cone, cpd.distance_from_cone),
    }
    for name, (params, f_ours, f_ref) in cases.items():
        params = params.astype(np.float32)
        got = np.asarray(f_ours(jnp.asarray(pts), jnp.asarray(params)))
        want = f_ref(torch.as_tensor(pts), torch.as_tensor(params)).numpy()
        np.testing.assert_allclose(got, want.reshape(got.shape),
                                   atol=1e-4, err_msg=name)

    axis = nrm(rng.randn(3)).astype(np.float32)
    center = rng.randn(3).astype(np.float32)
    got = np.asarray(ours_dis.distance_from_torus(
        jnp.asarray(pts), (jnp.asarray(axis), jnp.asarray(center), 1.5, 0.4)))
    want = cpd.distance_from_torus(
        torch.as_tensor(pts), (torch.as_tensor(axis), torch.as_tensor(center),
                               1.5, 0.4)).numpy()
    np.testing.assert_allclose(got, want, atol=1e-4)


def _sign_align(a, b):
    return a if float(np.sum(a * b)) >= 0 else -a


def test_fits_match(ref):
    import torch

    rng = np.random.RandomState(2)
    n = 300
    w_np = np.ones((n, 1), np.float32)
    w = torch.as_tensor(w_np)

    # ---- plane
    nvec = np.array([0.2, -0.5, 0.84])
    nvec /= np.linalg.norm(nvec)
    basis = np.linalg.svd(np.eye(3) - np.outer(nvec, nvec))[0][:, :2]
    pts = (rng.randn(n, 2) @ basis.T + 2.0 * nvec
           + 0.005 * rng.randn(n, 3)).astype(np.float32)
    a_o, d_o = ours_fit.fit_plane(jnp.asarray(pts), jnp.asarray(w_np))
    a_r, d_r = ref["fit"]["fit_plane_torch"](torch.as_tensor(pts), None, w)
    a_o, d_o = np.asarray(a_o).ravel(), float(d_o)
    a_r, d_r = a_r.numpy().ravel(), float(d_r)
    if np.dot(a_o, a_r) < 0:
        a_o, d_o = -a_o, -d_o
    np.testing.assert_allclose(a_o, a_r, atol=5e-3)
    np.testing.assert_allclose(d_o, d_r, atol=5e-3)

    # ---- sphere
    c_true = np.array([0.5, -1.0, 2.0])
    dirs = rng.randn(n, 3)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    pts = (c_true + 1.3 * dirs + 0.005 * rng.randn(n, 3)).astype(np.float32)
    c_o, r_o = ours_fit.fit_sphere(jnp.asarray(pts), jnp.asarray(w_np))
    c_r, r_r = ref["fit"]["fit_sphere_torch"](torch.as_tensor(pts), None, w)
    np.testing.assert_allclose(np.asarray(c_o).ravel(), c_r.numpy().ravel(),
                               atol=2e-2)
    np.testing.assert_allclose(float(r_o), float(r_r), atol=2e-2)

    # ---- cylinder (points on the surface, normals radial)
    ax = np.array([0.0, 0.0, 1.0])
    theta = rng.rand(n) * 2 * np.pi
    z = rng.randn(n)
    radial = np.stack([np.cos(theta), np.sin(theta), np.zeros(n)], 1)
    pts = (1.1 * radial + z[:, None] * ax
           + 0.003 * rng.randn(n, 3)).astype(np.float32)
    nrms = (radial + 0.01 * rng.randn(n, 3)).astype(np.float32)
    a_o, c_o, r_o = ours_fit.fit_cylinder(jnp.asarray(pts), jnp.asarray(nrms),
                                          jnp.asarray(w_np))
    a_r, c_r, r_r = ref["fit"]["fit_cylinder_torch"](
        torch.as_tensor(pts), torch.as_tensor(nrms), w)
    a_o = _sign_align(np.asarray(a_o).ravel(), a_r.numpy().ravel())
    np.testing.assert_allclose(a_o, a_r.numpy().ravel(), atol=5e-3)
    np.testing.assert_allclose(float(r_o), float(r_r), atol=2e-2)
    np.testing.assert_allclose(np.asarray(c_o).ravel()[:2],
                               np.asarray(c_r).ravel()[:2], atol=2e-2)

    # ---- cone (apex at origin, half-angle 0.5)
    half = 0.5
    axis = np.array([0.0, 0.0, 1.0])
    s = rng.rand(n) * 2 + 0.5
    phi = rng.rand(n) * 2 * np.pi
    ring = np.stack([np.cos(phi), np.sin(phi), np.zeros(n)], 1)
    pts = (s[:, None] * (np.cos(half) * axis + np.sin(half) * ring)
           + 0.003 * rng.randn(n, 3)).astype(np.float32)
    nrms = (np.cos(half) * ring - np.sin(half) * axis
            + 0.01 * rng.randn(n, 3)).astype(np.float32)
    c_o, a_o, t_o = ours_fit.fit_cone(jnp.asarray(pts), jnp.asarray(nrms),
                                      jnp.asarray(w_np))
    c_r, a_r, t_r = ref["fit"]["fit_cone_torch"](
        torch.as_tensor(pts), torch.as_tensor(nrms), w)
    np.testing.assert_allclose(np.asarray(c_o).ravel(), c_r.numpy().ravel(),
                               atol=3e-2)
    np.testing.assert_allclose(np.asarray(a_o).ravel(), a_r.numpy().ravel(),
                               atol=1e-2)
    np.testing.assert_allclose(float(t_o), float(t_r), atol=1e-2)


def test_circle_fit_matches(ref):
    rng = np.random.RandomState(3)
    nvec = np.array([0.3, 0.4, 0.87])
    nvec /= np.linalg.norm(nvec)
    basis = np.linalg.svd(np.eye(3) - np.outer(nvec, nvec))[0][:, :2]
    t = rng.rand(200) * 2 * np.pi
    ring2d = np.stack([np.cos(t), np.sin(t)], 1) * 0.8
    pts = (ring2d @ basis.T + np.array([1.0, 2.0, 3.0])
           + 0.002 * rng.randn(200, 3)).astype(np.float32)
    c_o, r_o = ours_circle.fit_circle_3d(jnp.asarray(pts))
    c_r, r_r = ref["circ"]["fit_circle_numpy"](pts.astype(np.float64))
    np.testing.assert_allclose(np.asarray(c_o).ravel(),
                               np.asarray(c_r).ravel(), atol=1e-2)
    np.testing.assert_allclose(float(r_o), float(r_r), atol=1e-2)
