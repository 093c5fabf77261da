"""Differential parity: our Cox–de Boor spline basis vs the reference's.

Exec-loads utils/spec_utils.py at test time (its missing src.* modules and
lapsolver stubbed) and checks that our clamped-uniform-knot basis matrices
and control-point surface sampling reproduce the reference's
basis_function_one / uniform_knot_bspline / sample_points_from_control_points_
exactly.  Skips where the snapshot is absent.
"""

import pathlib
import sys
import types

import numpy as np
import pytest

from gcanet_tpu.geometry import spline as ours

REF = pathlib.Path("/root/reference/utils/spec_utils.py")

pytestmark = pytest.mark.skipif(not REF.exists(),
                                reason="reference snapshot not available")


@pytest.fixture(scope="module")
def ref():
    approx = types.ModuleType("src.approximation")
    approx.fit_bezier_surface_fit_kronecker = None
    approx.BSpline = None
    approx.uniform_knot_bspline_ = None
    curve = types.ModuleType("src.curve_utils")

    class DrawSurfs:                                  # module-level instance
        def regular_parameterization(self, u, v):
            return np.zeros((u * v, 2))

    curve.DrawSurfs = DrawSurfs
    src_pkg = types.ModuleType("src")
    src_pkg.approximation, src_pkg.curve_utils = approx, curve
    lap = types.ModuleType("lapsolver")
    lap.solve_dense = None
    new = {"src": src_pkg, "src.approximation": approx,
           "src.curve_utils": curve, "lapsolver": lap}
    saved = {k: sys.modules.get(k) for k in new}
    sys.modules.update(new)
    try:
        ns: dict = {}
        exec(compile(REF.read_text(), str(REF), "exec"), ns)
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    return ns


@pytest.mark.parametrize("n,deg", [(10, 2), (20, 3), (7, 3)])
def test_basis_matrices_match(ref, n, deg):
    grid = 30
    nu_ref, nv_ref = ref["uniform_knot_bspline"](n, n, deg, deg, grid)
    u = np.arange(0.0, 1.0, 1.0 / grid)               # the reference's grid
    nu_ours = ours.bspline_basis_at(u, n, deg)
    np.testing.assert_allclose(nu_ours, nu_ref, atol=1e-9)
    np.testing.assert_allclose(nu_ours, nv_ref, atol=1e-9)


def test_surface_sampling_matches(ref):
    import torch

    n, deg, grid = 10, 2, 25
    nu, nv = ref["uniform_knot_bspline"](n, n, deg, deg, grid)
    rng = np.random.RandomState(0)
    cp = rng.randn(2, n * n, 3).astype(np.float32)
    theirs = ref["sample_points_from_control_points_"](
        torch.as_tensor(nu, dtype=torch.float32),
        torch.as_tensor(nv, dtype=torch.float32),
        torch.as_tensor(cp), 2, input_size_u=n, input_size_v=n).numpy()
    got = np.asarray(ours.sample_points_from_control_points(
        nu.astype(np.float32), nv.astype(np.float32), cp))
    np.testing.assert_allclose(got, theirs, atol=1e-4)
