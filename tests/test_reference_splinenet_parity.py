"""Model-level differential: SplineNet control-point nets vs the reference.

The reference's models/splinenet.py ``DGCNNControlPoints`` (the open/closed
spline networks the geometric-consistency affinity path loads,
abc_utils.py:34-61) is pure torch — exec-load it, randomise its BatchNorm
running stats, convert the state_dict through the REAL checkpoint-importer
``model="splinenet"`` key map, and assert our flax net emits the same control
grid in eval mode for both channel configurations (mode 0 = open, mode 1 =
closed).  Skips where the snapshot is absent.
"""

import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gcanet_tpu.models.splinenet import DGCNNControlPoints
from gcanet_tpu.utils.import_torch import convert_state_dict

REF = pathlib.Path("/root/reference/models/splinenet.py")

pytestmark = pytest.mark.skipif(not REF.exists(),
                                reason="reference snapshot not available")


def _load_ref():
    src = REF.read_text()
    # the gather-offset tensor is sent to the gpu of x (splinenet.py:35);
    # keep it where torch.arange made it
    src = src.replace(
        "idx_base = idx_base.cuda(torch.get_device(x))", "pass")
    ns = {"__file__": str(REF)}
    exec(compile(src, str(REF), "exec"), ns)
    return ns


@pytest.mark.parametrize("mode", [0, 1])
def test_splinenet_forward_matches_reference(mode):
    import torch

    k, b, n, cp = 10, 2, 64, 4
    ns = _load_ref()
    torch.manual_seed(4 + mode)
    ref = ns["DGCNNControlPoints"](cp, num_points=k, mode=mode)
    # randomise the BN running stats so the BN_STATS mapping is actually
    # exercised (fresh torch BNs are mean=0/var=1, which any bug would pass)
    for m in ref.modules():
        if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
            m.running_mean.normal_(0.0, 0.3)
            m.running_var.uniform_(0.5, 1.5)
    ref.eval()

    rng = np.random.RandomState(17 + mode)
    pts = rng.randn(b, n, 3).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.as_tensor(np.swapaxes(pts, 1, 2).copy())).numpy()

    ours = DGCNNControlPoints(num_control_points=cp, k=k, mode=mode)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(pts),
                          train=False)
    sd = {kk: v.numpy() for kk, v in ref.state_dict().items()}
    params, batch_stats, report = convert_state_dict(
        sd, variables["params"], variables["batch_stats"], model="splinenet")
    assert not report.unmatched, report.unmatched
    assert not report.missing, report.missing

    got = np.asarray(ours.apply(
        {"params": params, "batch_stats": batch_stats}, jnp.asarray(pts),
        train=False))
    assert got.shape == want.shape == (b, cp * cp, 3)
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


def test_splinenet_weighted_pool_matches_reference():
    """The per-point weighting before the global pool (splinenet.py:164-166;
    the reference's reshape((1,1,-1)) only supports batch 1 — exactly the way
    FittingModule calls it)."""
    import torch

    k, n, cp = 10, 48, 3
    ns = _load_ref()
    torch.manual_seed(9)
    ref = ns["DGCNNControlPoints"](cp, num_points=k, mode=0)
    for m in ref.modules():
        if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
            m.running_mean.normal_(0.0, 0.3)
            m.running_var.uniform_(0.5, 1.5)
    ref.eval()

    rng = np.random.RandomState(23)
    pts = rng.randn(1, n, 3).astype(np.float32)
    w = rng.rand(1, n).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.as_tensor(np.swapaxes(pts, 1, 2).copy()),
                   weights=torch.as_tensor(w)).numpy()

    ours = DGCNNControlPoints(num_control_points=cp, k=k, mode=0)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(pts),
                          train=False)
    sd = {kk: v.numpy() for kk, v in ref.state_dict().items()}
    params, batch_stats, report = convert_state_dict(
        sd, variables["params"], variables["batch_stats"], model="splinenet")
    assert not report.unmatched, report.unmatched

    got = np.asarray(ours.apply(
        {"params": params, "batch_stats": batch_stats}, jnp.asarray(pts),
        weights=jnp.asarray(w), train=False))
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)
