"""Instance-head parity through the checkpoint importer.

Extends the activation-parity chain (encoder/offset/trunk,
tests/test_reference_encoder_parity.py) THROUGH the instance head's
learnable pieces around the spconv CUDA boundary (dgcnn-4.py:1379-1392):
``tiny_unet_outputlayer`` BN+ReLU, per-voxel ``mask_linear`` MLP, the
``global_pool`` proposal mean (roipool.cu semantics) and the
``cls_linear``/``iou_score_linear`` heads.  The reference modules are the
real ones (blocks.py MLP exec-loaded with spconv stubbed; torch
BatchNorm1d/Linear), weights converted through the REAL importer key map —
the tiny U-Net itself is the documented dense-16^3 deviation and is
excluded (its output features are the test's common input).  Skips when
the reference snapshot is absent.
"""

import pathlib
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REF_BLOCKS = pathlib.Path("/root/reference/softgroup/model/blocks.py")

pytestmark = pytest.mark.skipif(not REF_BLOCKS.exists(),
                                reason="reference snapshot not available")


def _load_ref_mlp():
    """Exec-load softgroup/model/blocks.py with spconv stubbed (its MLP and
    norm blocks are pure torch)."""
    import torch

    spconv_mod = types.ModuleType("spconv")
    spconv_pt = types.ModuleType("spconv.pytorch")
    spconv_mods = types.ModuleType("spconv.pytorch.modules")
    spconv_mods.SparseModule = torch.nn.Module
    spconv_pt.modules = spconv_mods

    class _StubSparse(torch.nn.Module):
        """Subclassable stand-in for spconv layer classes (blocks.py only
        needs them as base classes / constructors, never executed here)."""

        def __init__(self, *a, **k):
            super().__init__()

    for name in ("SparseConv3d", "SparseSequential", "SubMConv3d",
                 "SparseInverseConv3d", "SparseConvTensor", "SparseModule"):
        setattr(spconv_pt, name, _StubSparse)
    spconv_mod.pytorch = spconv_pt
    saved = {k: sys.modules.get(k) for k in
             ("spconv", "spconv.pytorch", "spconv.pytorch.modules")}
    sys.modules.update({"spconv": spconv_mod, "spconv.pytorch": spconv_pt,
                        "spconv.pytorch.modules": spconv_mods})
    try:
        ns = {"__file__": str(REF_BLOCKS)}
        exec(compile(REF_BLOCKS.read_text(), str(REF_BLOCKS), "exec"), ns)
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    return ns["MLP"]


def test_instance_head_linears_match_reference():
    import torch

    from gcanet_tpu.models.instance_head import InstanceHead
    from gcanet_tpu.models.layers import MLP, MaskedBatchNorm
    from gcanet_tpu.utils.import_torch import convert_state_dict
    import flax.linen as fnn

    c, n_cls, g = 64, 7, 4
    g3 = g * g * g
    p = 5                                   # proposals
    RefMLP = _load_ref_mlp()

    torch.manual_seed(3)
    # the head modules exactly as PrimitivesEmbeddingDGCNGn builds them
    # (dgcnn-4.py:611-615)
    outputlayer_bn = torch.nn.BatchNorm1d(c, eps=1e-4, momentum=0.1)
    mask_linear = RefMLP(c, n_cls, norm_fn=None, num_layers=2)
    cls_linear = torch.nn.Linear(c, n_cls)
    iou_score_linear = torch.nn.Linear(c, n_cls)
    # non-trivial running stats (a freshly-initialised BN is the identity)
    with torch.no_grad():
        outputlayer_bn.running_mean.normal_(0.0, 0.5)
        outputlayer_bn.running_var.uniform_(0.5, 2.0)
        outputlayer_bn.weight.normal_(1.0, 0.2)
        outputlayer_bn.bias.normal_(0.0, 0.2)
    outputlayer_bn.eval()

    # common input: post-tiny-U-Net per-voxel features with a realistic
    # active-voxel mask per proposal
    rng = np.random.RandomState(11)
    active = rng.rand(p, g3) < 0.4
    active[:, 0] = True                     # every proposal non-empty
    feats = (rng.randn(p, g3, c) * active[..., None]).astype(np.float32)

    # ---- reference forward around the CUDA boundary --------------------
    tf = torch.as_tensor(feats[active])                     # [V, C] sparse
    with torch.no_grad():
        y = torch.relu(outputlayer_bn(tf))
        want_mask = mask_linear(y).numpy()                  # [V, cls]
        # global_pool: per-proposal mean over its voxels (roipool.cu:12-71)
        pid = np.repeat(np.arange(p), active.sum(1))
        pooled = torch.stack([y[pid == i].mean(0) for i in range(p)])
        want_cls = cls_linear(pooled).numpy()
        want_iou = iou_score_linear(pooled).numpy()

    # ---- ours, through the importer ------------------------------------
    head = InstanceHead(num_classes=n_cls, channels=c, grid_size=g,
                        compute_bf16=False)
    pid_tbl = -np.ones((1, p * 2), np.int32)
    variables = head.init(jax.random.PRNGKey(0), jnp.asarray(feats),
                          jnp.asarray(active),
                          jnp.zeros((1, p * 2), jnp.int32),
                          jnp.asarray(pid_tbl), False)
    sd = {}
    for name, mod in (("tiny_unet_outputlayer.0", outputlayer_bn),
                      ("mask_linear", mask_linear),
                      ("cls_linear", cls_linear),
                      ("iou_score_linear", iou_score_linear)):
        for kk, v in mod.state_dict().items():
            sd[f"{name}.{kk}"] = v.numpy()
    params, batch_stats, report = convert_state_dict(
        sd, {"InstanceHead_0": variables["params"]},
        {"InstanceHead_0": variables.get("batch_stats", {})}, mode=5)
    assert not report.unmatched, report.unmatched
    hp = params["InstanceHead_0"]
    hbs = batch_stats["InstanceHead_0"]

    x = jnp.asarray(feats)
    a = jnp.asarray(active)
    y_ours = MaskedBatchNorm().apply(
        {"params": hp["MaskedBatchNorm_0"],
         "batch_stats": hbs["MaskedBatchNorm_0"]},
        x, train=False, active=a)
    y_ours = fnn.relu(y_ours) * a[..., None]
    got_mask = np.asarray(MLP(n_cls, hidden_features=c).apply(
        {"params": hp["MLP_0"]}, y_ours))
    denom = np.maximum(active.sum(1, keepdims=True), 1)
    got_pool = np.asarray(
        (y_ours * a[..., None]).sum(axis=1)) / denom
    got_cls = np.asarray(fnn.Dense(n_cls).apply(
        {"params": hp["Dense_0"]}, jnp.asarray(got_pool)))
    got_iou = np.asarray(fnn.Dense(n_cls).apply(
        {"params": hp["Dense_1"]}, jnp.asarray(got_pool)))

    np.testing.assert_allclose(got_mask[active], want_mask,
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(got_cls, want_cls, atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(got_iou, want_iou, atol=1e-4, rtol=1e-4)
