"""Differential parity: geometric-consistency affinity stack vs abc_utils.py.

Exec-loads the reference's abc_utils at test time with its native deps
stubbed (pykdtree -> scipy cKDTree adapter, FittingModule neutered — the
spline branches need pretrained checkpoints and are kept out of the inputs)
and compares: map_type_gt, the type-affinity construction over analytic
primitives, the normal-angle kNN affinity with its second normalisation
pass, block-chunked feature entropy, and sklearn mean-shift labels.
Skips where the snapshot is absent.
"""

import pathlib
import sys
import types

import jax.numpy as jnp
import numpy as np
import pytest

from gcanet_tpu.geometry import affinity as ours

REFROOT = pathlib.Path("/root/reference")

pytestmark = pytest.mark.skipif(not REFROOT.exists(),
                                reason="reference snapshot not available")


class _KDTreeAdapter:
    """pykdtree.kdtree.KDTree API over scipy (query returns (dist, idx))."""

    def __init__(self, data):
        from scipy.spatial import cKDTree

        self._t = cKDTree(np.asarray(data))

    def query(self, x, k):
        return self._t.query(np.asarray(x), k=k)


def _exec(path, ns=None):
    ns = ns if ns is not None else {}
    exec(compile(path.read_text(), str(path), "exec"), ns)
    return ns


@pytest.fixture(scope="module")
def ref():
    return _load_ref()


def _load_ref():
    import torch

    # modules abc_utils imports: utils.primitive_dis (exec'd for real),
    # utils.main_utils (2 tiny helpers), utils.spec_utils (exec'd with its
    # missing src.* stubbed), pykdtree (scipy adapter)
    dis = _exec(REFROOT / "utils/primitive_dis.py")
    dis_mod = types.ModuleType("utils.primitive_dis")
    vars(dis_mod).update(dis)

    mains = types.ModuleType("utils.main_utils")
    mains.npy = lambda t: t.data.cpu().numpy()
    mains.v = lambda x: torch.as_tensor(x)

    approx = types.ModuleType("src.approximation")
    approx.fit_bezier_surface_fit_kronecker = None
    approx.BSpline = None
    approx.uniform_knot_bspline_ = None
    curve = types.ModuleType("src.curve_utils")
    curve.DrawSurfs = type(
        "DrawSurfs", (),
        {"regular_parameterization": lambda self, u, v: np.zeros((u * v, 2))})
    src_pkg = types.ModuleType("src")
    src_pkg.approximation, src_pkg.curve_utils = approx, curve
    lap = types.ModuleType("lapsolver")
    lap.solve_dense = None
    spec_stub = {"src": src_pkg, "src.approximation": approx,
                 "src.curve_utils": curve, "lapsolver": lap}
    saved = {k: sys.modules.get(k) for k in spec_stub}
    sys.modules.update(spec_stub)
    try:
        spec = _exec(REFROOT / "utils/spec_utils.py")
    finally:
        for k, v in saved.items():
            sys.modules.pop(k, None) if v is None else sys.modules.update({k: v})
    spec_mod = types.ModuleType("utils.spec_utils")
    vars(spec_mod).update(spec)

    kd_mod = types.ModuleType("pykdtree.kdtree")
    kd_mod.KDTree = _KDTreeAdapter
    kd_pkg = types.ModuleType("pykdtree")
    kd_pkg.kdtree = kd_mod
    utils_pkg = types.ModuleType("utils")
    utils_pkg.primitive_dis = dis_mod
    utils_pkg.main_utils = mains
    utils_pkg.spec_utils = spec_mod

    new = {"utils": utils_pkg, "utils.primitive_dis": dis_mod,
           "utils.main_utils": mains, "utils.spec_utils": spec_mod,
           "pykdtree": kd_pkg, "pykdtree.kdtree": kd_mod}
    saved = {k: sys.modules.get(k) for k in new}
    sys.modules.update(new)
    try:
        ns = _exec(REFROOT / "utils/abc_utils.py")
    finally:
        for k, v in saved.items():
            sys.modules.pop(k, None) if v is None else sys.modules.update({k: v})
    ns["FittingModule"] = lambda: None      # spline branches stay untouched
    return ns


def test_map_type_gt_matches(ref):
    import torch

    t = np.random.RandomState(0).randint(0, 10, 200)
    got = np.asarray(ours.map_type_gt(jnp.asarray(t)))
    want = ref["map_type_gt"](torch.as_tensor(t.copy())).numpy()
    np.testing.assert_array_equal(got, want)


def test_type_affinity_matches(ref):
    import torch

    rng = np.random.RandomState(1)
    n = 150
    # keep squared distances small: the affinity is exp(-(d^2)^2 / 2s^2) and
    # borderline float32 underflow to exact 0 flips the symmetrisation
    # denominator differently per implementation — a numerics artifact, not
    # a semantics difference
    xyz = (0.3 * rng.randn(1, n, 3)).astype(np.float32)
    # >=30 points per analytic type; a handful of spline/background types
    # (below the 30-point cutoff -> background columns on both sides)
    t = np.concatenate([np.full(40, 1), np.full(40, 4), np.full(35, 5),
                        np.full(30, 3), np.full(5, 2)])
    rng.shuffle(t)
    params = (0.5 * rng.randn(1, n, 22)).astype(np.float32)
    got = np.asarray(ours.construction_affinity_matrix_type(
        jnp.asarray(xyz), jnp.asarray(t[None]), jnp.asarray(params),
        sigma=3.0))
    want = ref["construction_affinity_matrix_type"](
        torch.as_tensor(np.swapaxes(xyz, 1, 2).copy()),       # ref is [B,3,N]
        torch.as_tensor(t[None].copy()),
        torch.as_tensor(params), sigma=3.0).numpy()
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_normal_affinity_matches(ref):
    import torch

    rng = np.random.RandomState(2)
    n = 120
    xyz = rng.randn(1, n, 3).astype(np.float32)
    nrm = rng.randn(1, n, 3).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    got = np.asarray(ours.construction_affinity_matrix_normal(
        jnp.asarray(xyz), jnp.asarray(nrm), knn=8))
    want = ref["construction_affinity_matrix_normal"](
        torch.as_tensor(np.swapaxes(xyz, 1, 2).copy()),       # ref is [B,3,N]
        torch.as_tensor(nrm), knn=8).numpy()
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_entropy_matches(ref):
    import torch

    rng = np.random.RandomState(3)
    feat = rng.rand(1, 7000, 2).astype(np.float32)    # ref hardcodes 1000-blocks
    got = float(ours.compute_entropy(jnp.asarray(feat)))
    want = float(ref["compute_entropy"](torch.as_tensor(feat)))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_mean_shift_matches(ref):
    import torch

    rng = np.random.RandomState(4)
    x = np.concatenate([rng.randn(30, 2) * 0.05,
                        rng.randn(30, 2) * 0.05 + 3.0]).astype(np.float32)
    got = ours.mean_shift(x[None], bandwidth=0.5)
    want = ref["mean_shift"](torch.as_tensor(x[None]), 0.5).numpy()
    np.testing.assert_array_equal(got[0], want[0])
