"""Module-level checks: GroupNorm parity with torch, masked dense conv ==
submanifold sparse conv at active sites, model forward/grad smoke (the
"5-step loss decreases" pattern lives in test_train_step.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import flax.linen as fnn


def test_groupnorm_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(0)
    b, n, k, c = 2, 5, 4, 8
    x = rng.randn(b, n, k, c).astype(np.float32)

    gn = fnn.GroupNorm(num_groups=2, epsilon=1e-5)
    vars_ = gn.init(jax.random.PRNGKey(0), jnp.asarray(x))
    got = np.asarray(gn.apply(vars_, jnp.asarray(x)))

    tgn = torch.nn.GroupNorm(2, c)   # torch layout: [B, C, ...spatial]
    with torch.no_grad():
        ref = tgn(torch.tensor(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_masked_dense_conv_equals_sparse():
    """Dense conv with zeroed inactive voxels + output masking must equal a
    direct submanifold computation (sum over active neighbours, outputs only
    at active sites)."""
    from gcanet_tpu.models.instance_head import SubMConv3d

    rng = np.random.RandomState(1)
    g, cin, cout = 6, 3, 5
    active = rng.rand(1, g, g, g) < 0.3
    x = rng.randn(1, g, g, g, cin).astype(np.float32) * active[..., None]

    conv = SubMConv3d(cout)
    vars_ = conv.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(active))
    got = np.asarray(conv.apply(vars_, jnp.asarray(x), jnp.asarray(active)))
    w = np.asarray(vars_["params"]["Conv_0"]["kernel"])  # [3,3,3,cin,cout]

    ref = np.zeros((1, g, g, g, cout), np.float32)
    for ix in range(g):
        for iy in range(g):
            for iz in range(g):
                if not active[0, ix, iy, iz]:
                    continue
                acc = np.zeros(cout, np.float32)
                for dx in (-1, 0, 1):
                    for dy in (-1, 0, 1):
                        for dz in (-1, 0, 1):
                            jx, jy, jz = ix + dx, iy + dy, iz + dz
                            if 0 <= jx < g and 0 <= jy < g and 0 <= jz < g \
                                    and active[0, jx, jy, jz]:
                                acc += x[0, jx, jy, jz] @ w[dx + 1, dy + 1, dz + 1]
                ref[0, ix, iy, iz] = acc
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_masked_batchnorm_stats_over_active_only():
    from gcanet_tpu.models.layers import MaskedBatchNorm

    rng = np.random.RandomState(2)
    x = rng.randn(4, 10, 3).astype(np.float32)
    active = rng.rand(4, 10) < 0.5
    bn = MaskedBatchNorm()
    vars_ = bn.init(jax.random.PRNGKey(0), jnp.asarray(x), train=True,
                    active=jnp.asarray(active))
    y, _ = bn.apply(vars_, jnp.asarray(x), train=True, active=jnp.asarray(active),
                    mutable=["batch_stats"])
    y = np.asarray(y)
    flat = x[active]
    mean, var = flat.mean(0), flat.var(0)
    ref = (x - mean) / np.sqrt(var + 1e-4)
    np.testing.assert_allclose(y[active], ref[active], atol=1e-4)
    assert (y[~active] == 0).all()


def test_offset_keypoints_deterministic():
    from gcanet_tpu.models.offset import keypoint_permutation

    a = keypoint_permutation(7000, 120)
    b = keypoint_permutation(7000, 120)
    np.testing.assert_array_equal(a, b)
    assert len(np.unique(a)) == 120


def test_canonicalize_params_unit_norms():
    from gcanet_tpu.models.primitive_net import canonicalize_params

    raw = jnp.asarray(np.random.RandomState(3).randn(2, 10, 22).astype(np.float32))
    out = np.asarray(canonicalize_params(raw))
    for sl in [(4, 7), (8, 11), (15, 18)]:
        nrm = np.linalg.norm(out[..., sl[0]:sl[1]], axis=-1)
        np.testing.assert_allclose(nrm, 1.0, atol=1e-4)
    np.testing.assert_allclose(out[..., 0:4], np.asarray(raw)[..., 0:4])


def test_masked_downconv_upconv_sparse_equivalence():
    """Stride-2 down conv + transpose up conv with occupancy masking must
    equal the sparse computation: down-level site active iff any input in its
    2^3 window is active; up conv only writes level-0 active sites."""
    import jax.numpy as jnp
    from gcanet_tpu.models.instance_head import TinyUNet

    rng = np.random.RandomState(4)
    g, c = 8, 4
    active = rng.rand(1, g, g, g) < 0.25
    x = (rng.randn(1, g, g, g, c).astype(np.float32)) * active[..., None]
    net = TinyUNet(channels=c)
    vars_ = net.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(active),
                     True)
    out, _ = net.apply(vars_, jnp.asarray(x), jnp.asarray(active), True,
                       mutable=["batch_stats"])
    out = np.asarray(out)
    # outputs only at active sites
    assert (out[~active] == 0).all()
    assert np.isfinite(out).all()
    # inactive inputs cannot influence anything: perturb an inactive voxel
    x2 = x.copy()
    ix = np.argwhere(~active[0])[0]
    x2[0, ix[0], ix[1], ix[2]] += 100.0
    out2, _ = net.apply(vars_, jnp.asarray(x2), jnp.asarray(active), True,
                        mutable=["batch_stats"])
    np.testing.assert_allclose(out, np.asarray(out2), atol=1e-5)


def test_edgeconv_bf16_matches_fp32():
    """encoder_bf16 runs the [B,N,K,C] edge tensors in bf16; outputs must
    match the fp32 path within bf16 rounding (GN stats stay fp32)."""
    from gcanet_tpu.models.dgcnn import DGCNNEncoderGn

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 64, 6).astype(np.float32))

    enc32 = DGCNNEncoderGn(mode=5, nn_nb=8, knn_impl="xla")
    enc16 = DGCNNEncoderGn(mode=5, nn_nb=8, knn_impl="xla", compute_bf16=True)
    v = enc32.init(jax.random.PRNGKey(0), x)
    y32 = enc32.apply(v, x)
    y16 = enc16.apply(v, x)                 # same params, bf16 compute
    assert y16.dtype == jnp.float32         # encoder output stays fp32
    # bf16 has ~2-3 decimal digits; a handful of max-pool argmax flips when
    # two neighbours are within one ulp give O(1) differences on <1% of
    # elements (the consumer treats neighbourhoods as sets), so compare by
    # quantile rather than elementwise
    diff = np.abs(np.asarray(y32) - np.asarray(y16))
    assert np.mean(diff) < 0.02
    assert np.quantile(diff, 0.99) < 0.3

    # gradients flow and are finite through the bf16 path
    def loss(params):
        return jnp.sum(enc16.apply({"params": params}, x) ** 2)

    g = jax.grad(loss)(v["params"])
    leaves = jax.tree.leaves(g)
    assert all(bool(jnp.all(jnp.isfinite(l))) for l in leaves)
    assert any(float(jnp.max(jnp.abs(l))) > 0 for l in leaves)
