"""Correctness anchors for the spconv CPU emulation (tests/ref_spconv_stub).

The emulation is itself a test oracle, so each op is pinned against the
equivalent DENSE torch conv (zeros at inactive sites) — the convention the
checkpoint importer assumes for spconv kernels (utils/import_torch.py:15-17
and the masked-dense instance-head equivalence, models/instance_head.py).
"""

import numpy as np
import pytest
import torch
from torch import nn

import ref_spconv_stub as sps


def _random_sparse(seed=0, b=2, g=6, c=3, m=40):
    rng = np.random.RandomState(seed)
    sites = set()
    while len(sites) < m:
        sites.add((rng.randint(b), rng.randint(g), rng.randint(g),
                   rng.randint(g)))
    idx = np.asarray(sorted(sites), np.int64)
    torch.manual_seed(seed)
    feats = torch.randn(m, c)
    return sps.SparseConvTensor(feats, torch.as_tensor(idx, dtype=torch.int32),
                                [g, g, g], b), idx


def _to_dense(x, g, c):
    d = torch.zeros(x.batch_size, c, g, g, g)
    idx = x.indices.long()
    d[idx[:, 0], :, idx[:, 1], idx[:, 2], idx[:, 3]] = x.features
    return d


def test_subm_conv_matches_masked_dense():
    g, cin, cout = 6, 3, 5
    x, idx = _random_sparse(c=cin, g=g)
    conv = sps.SubMConv3d(cin, cout, kernel_size=3, padding=1, bias=False)
    y = conv(x)
    dense = _to_dense(x, g, cin)
    # torch Conv3d weight [out, in, kd, kh, kw] <- our [out, kd, kh, kw, in]
    w = conv.weight.permute(0, 4, 1, 2, 3)
    ref = torch.nn.functional.conv3d(dense, w, padding=1)
    got = y.features
    want = ref[idx[:, 0], :, idx[:, 1], idx[:, 2], idx[:, 3]]
    torch.testing.assert_close(got, want, atol=1e-5, rtol=1e-5)
    assert (y.indices == x.indices).all()


def test_sparse_conv_downsample_matches_dense():
    g, cin, cout = 6, 3, 4
    x, idx = _random_sparse(c=cin, g=g, seed=1)
    conv = sps.SparseConv3d(cin, cout, kernel_size=2, stride=2, bias=False,
                            indice_key="k")
    y = conv(x)
    dense = _to_dense(x, g, cin)
    w = conv.weight.permute(0, 4, 1, 2, 3)
    ref = torch.nn.functional.conv3d(dense, w, stride=2)
    oidx = y.indices.long()
    want = ref[oidx[:, 0], :, oidx[:, 1], oidx[:, 2], oidx[:, 3]]
    torch.testing.assert_close(y.features, want, atol=1e-5, rtol=1e-5)
    # output sites are exactly the parents of active inputs
    parents = {(b, xx // 2, yy // 2, zz // 2) for b, xx, yy, zz in idx}
    got_sites = {tuple(r) for r in oidx.numpy()}
    assert got_sites == parents
    assert "k" in y.indice_dict


def test_inverse_conv_restores_sites_and_matches_dense_transpose():
    g, cin, cmid = 6, 3, 4
    x, idx = _random_sparse(c=cin, g=g, seed=2)
    down = sps.SparseConv3d(cin, cmid, kernel_size=2, stride=2, bias=False,
                            indice_key="k")
    up = sps.SparseInverseConv3d(cmid, cin, kernel_size=2, bias=False,
                                 indice_key="k")
    y = up(down(x))
    assert (y.indices == x.indices).all()
    # dense reference: conv_transpose3d with kernel offsets NOT mirrored:
    # torch's conv_transpose3d computes y(p) = sum_o x(o) W[p - 2o] with
    # weight [in, out, kd, kh, kw] — the same pairing our stub uses.
    mid = down(x)
    dmid = _to_dense(mid, g // 2, cmid)
    w = up.weight.permute(4, 0, 1, 2, 3)   # [in=cmid, out=cin, k, k, k]
    ref = torch.nn.functional.conv_transpose3d(dmid, w, stride=2)
    want = ref[idx[:, 0], :, idx[:, 1], idx[:, 2], idx[:, 3]]
    torch.testing.assert_close(y.features, want, atol=1e-5, rtol=1e-5)


def test_sequential_routes_feature_ops():
    g, c = 6, 3
    x, _ = _random_sparse(c=c, g=g, seed=3)
    seq = sps.SparseSequential(nn.BatchNorm1d(c), nn.ReLU(),
                               sps.SubMConv3d(c, c, 3, padding=1))
    seq.eval()
    y = seq(x)
    assert isinstance(y, sps.SparseConvTensor)
    assert y.features.shape == x.features.shape


def test_blocks_ublock_runs_on_stub():
    """softgroup/model/blocks.py exec-loads against the stub module and a
    2-level UBlock round-trips indices (the tiny_unet configuration,
    dgcnn-4.py:611)."""
    import functools
    import pathlib
    import sys

    blocks_py = pathlib.Path("/root/reference/softgroup/model/blocks.py")
    if not blocks_py.exists():
        pytest.skip("reference snapshot not available")
    mod = sps.module()
    saved = {k: sys.modules.get(k) for k in
             ("spconv", "spconv.pytorch", "spconv.pytorch.modules")}
    sys.modules.update({"spconv": mod, "spconv.pytorch": mod.pytorch,
                        "spconv.pytorch.modules": mod.pytorch.modules})
    try:
        ns = {}
        exec(compile(blocks_py.read_text(), str(blocks_py), "exec"), ns)
        norm_fn = functools.partial(nn.BatchNorm1d, eps=1e-4, momentum=0.01)
        torch.manual_seed(0)
        c = 4
        unet = ns["UBlock"]([c, 2 * c], norm_fn, 2, block=ns["ResidualBlock"],
                            indice_key_id=11)
        unet.eval()
        x, _ = _random_sparse(c=c, g=8, m=60, seed=4)
        y = unet(x)
        assert (y.indices == x.indices).all()
        assert y.features.shape == (x.features.shape[0], c)
        assert torch.isfinite(y.features).all()
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
