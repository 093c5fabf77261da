"""Differential parity: our losses/metrics vs the reference's torch code.

utils/loss_utils.py is pure torch/numpy once its CUDA-ops import is stubbed
(the functions under test never call them), so where the reference snapshot
is available we exec it AT TEST TIME as the oracle and compare on random
inputs: Hungarian mIoU, type-mIoU (with the spline folds), embedding
pull/push, NLL, per-type param loss with its skip rules, offset L1 and the
normal acos loss.  Nothing is copied into the framework; the test skips
elsewhere.  Realises SURVEY §4(d) for the loss stack.
"""

import pathlib
import sys
import types

import jax.numpy as jnp
import numpy as np
import pytest

from gcanet_tpu.losses import losses as L
from gcanet_tpu.train import metrics as M

REF = pathlib.Path("/root/reference/utils/loss_utils.py")

pytestmark = pytest.mark.skipif(not REF.exists(),
                                reason="reference snapshot not available")


@pytest.fixture(scope="module")
def ref():
    """Exec the reference loss module with import stubs; restore sys.modules."""
    import torch
    from scipy.optimize import linear_sum_assignment

    def solve_dense(cost):  # lapsolver API over scipy
        return linear_sum_assignment(np.asarray(cost))

    stubs = {}
    mains = types.ModuleType("utils.main_utils")
    mains.npy = lambda t: t.data.cpu().numpy()
    mains.v = lambda x: torch.as_tensor(x)
    utils_pkg = types.ModuleType("utils")
    utils_pkg.main_utils = mains
    lap = types.ModuleType("lapsolver")
    lap.solve_dense = solve_dense
    sg = types.ModuleType("softgroup")
    sg_util = types.ModuleType("softgroup.util")
    sg_util.force_fp32 = lambda *a, **k: (lambda f: f)
    sg_ops = types.ModuleType("softgroup.ops")
    for name in ("ball_query", "bfs_cluster", "get_mask_iou_on_cluster",
                 "get_mask_iou_on_pred", "get_mask_label", "global_avg_pool",
                 "sec_max", "sec_min", "voxelization", "voxelization_idx"):
        setattr(sg_ops, name, None)
    sg.util, sg.ops = sg_util, sg_ops
    new = {"utils": utils_pkg, "utils.main_utils": mains, "lapsolver": lap,
           "softgroup": sg, "softgroup.util": sg_util, "softgroup.ops": sg_ops}
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
    stubs["ns"] = ns
    return ns


def _labels(rng, n, k, bg_frac=0.2):
    """Contiguous instance ids 0..k-1 plus -1 background (the reference's
    type-mIoU crashes on non-contiguous gt ids — a documented quirk)."""
    lbl = rng.randint(0, k, n)
    lbl[rng.rand(n) < bg_frac] = -1
    for i in range(k):                      # ensure contiguity
        lbl[rng.randint(0, n)] = i
    return lbl


@pytest.mark.parametrize("seed", range(3))
def test_miou_and_type_miou_match(ref, seed):
    import torch

    rng = np.random.RandomState(seed)
    n = 400
    i_gt = _labels(rng, n, rng.randint(2, 7))
    pred = rng.randint(0, rng.randint(2, 9), n)
    ours = M.compute_miou(pred, i_gt)
    theirs = float(ref["compute_miou"](torch.as_tensor(pred[None]),
                                       torch.as_tensor(i_gt[None])))
    np.testing.assert_allclose(ours, theirs, atol=1e-5)

    tpp = rng.randn(n, 10).astype(np.float32)
    t_gt = rng.randint(0, 10, n)
    ours_t = M.compute_type_miou_abc(tpp.copy(), t_gt.copy(),
                                     pred.copy(), i_gt.copy())
    theirs_t = float(ref["compute_type_miou_abc"](
        torch.as_tensor(tpp[None].copy()), torch.as_tensor(t_gt[None].copy()),
        torch.as_tensor(pred[None].copy()), torch.as_tensor(i_gt[None].copy())))
    np.testing.assert_allclose(ours_t, theirs_t, atol=1e-5)


@pytest.mark.parametrize("seed", range(3))
def test_embedding_loss_matches(ref, seed):
    import torch

    rng = np.random.RandomState(seed)
    b, n, k = 2, 150, 8
    feat = rng.randn(b, n, k).astype(np.float32)
    lbl = np.stack([_labels(rng, n, rng.randint(1, 6)) for _ in range(b)])
    total, pull, push = L.compute_embedding_loss(
        jnp.asarray(feat), jnp.asarray(lbl), max_instances=8)
    r_total, r_pull, r_push = ref["compute_embedding_loss"](
        torch.as_tensor(feat), torch.as_tensor(lbl))
    np.testing.assert_allclose(float(pull), float(r_pull), atol=1e-4)
    np.testing.assert_allclose(float(push), float(r_push), atol=1e-4)
    np.testing.assert_allclose(float(total), float(r_total), atol=1e-4)


def test_pointwise_losses_match(ref):
    import torch
    import torch.nn.functional as F  # noqa: F401  (exec'd module uses it)

    rng = np.random.RandomState(0)
    b, n, k = 2, 200, 7
    # NLL over valid points
    logp = np.log(rng.dirichlet(np.ones(k), (b, n)).astype(np.float32))
    gt = rng.randint(-1, k, (b, n))
    ours = float(L.compute_nnl_loss(jnp.asarray(logp), jnp.asarray(gt)))
    theirs = float(ref["compute_nnl_loss"](torch.as_tensor(logp),
                                           torch.as_tensor(gt)))
    np.testing.assert_allclose(ours, theirs, atol=1e-5)

    # normal acos loss
    nrm = rng.randn(b, n, 3).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    prd = rng.randn(b, n, 3).astype(np.float32)
    prd /= np.linalg.norm(prd, axis=-1, keepdims=True)
    ours = float(L.compute_normal_loss(jnp.asarray(prd), jnp.asarray(nrm)))
    theirs = float(ref["compute_normal_loss"](torch.as_tensor(prd),
                                              torch.as_tensor(nrm)))
    np.testing.assert_allclose(ours, theirs, atol=1e-5)

    # offset L1 over foreground (reference wants [N, 1] labels)
    off_p = rng.randn(n, 3).astype(np.float32)
    off_g = rng.randn(n, 3).astype(np.float32)
    inst = _labels(rng, n, 4)
    ours = float(L.offset_loss(jnp.asarray(off_p), jnp.asarray(inst),
                               jnp.asarray(off_g)))
    theirs = float(ref["offset_loss"](torch.as_tensor(off_p),
                                      torch.as_tensor(inst[:, None]),
                                      torch.as_tensor(off_g)))
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


@pytest.mark.parametrize("seed", range(3))
def test_param_loss_matches(ref, seed):
    import torch

    rng = np.random.RandomState(seed)
    b, n = 2, 120
    pred = rng.randn(b, n, 22).astype(np.float32)
    t_gt = rng.choice([1, 3, 4, 5, 0, 2], (b, n))
    pgt = rng.randn(b, n, 22).astype(np.float32)
    pgt[rng.rand(b, n) < 0.3] = 0.0                 # rows with empty gt slices
    pgt[0, rng.randint(0, n, 5)] = 20.0             # trip the gt-max>10 skip
    # guarantee at least one surviving group (reference NameErrors otherwise)
    t_gt[1, :10] = 1
    pgt[1, :10] = 0.5
    ours = float(L.compute_param_loss(jnp.asarray(pred), jnp.asarray(t_gt),
                                      jnp.asarray(pgt)))
    theirs = float(ref["compute_param_loss"](torch.as_tensor(pred),
                                             torch.as_tensor(t_gt),
                                             torch.as_tensor(pgt)))
    np.testing.assert_allclose(ours, theirs, atol=1e-4)
