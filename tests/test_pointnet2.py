"""PointNet++ op/module tests: FPS/ball-query/grouping/interpolation oracles
plus SA/FP module forward shapes (BASELINE config 2 path)."""

import jax
import jax.numpy as jnp
import numpy as np

from gcanet_tpu.ops import pointnet2 as p2


def test_fps_spreads_points():
    rng = np.random.RandomState(0)
    # two distant blobs: FPS with 2 samples must take one from each
    a = rng.randn(50, 3) * 0.01
    b = rng.randn(50, 3) * 0.01 + 10.0
    xyz = np.concatenate([a, b])[None].astype(np.float32)
    idx = np.asarray(p2.furthest_point_sample(jnp.asarray(xyz), 2))[0]
    assert (idx[0] < 50) != (idx[1] < 50)

    # samples are distinct for n_samples <= N
    idx = np.asarray(p2.furthest_point_sample(jnp.asarray(xyz), 16))[0]
    assert len(np.unique(idx)) == 16


def test_ball_query_semantics():
    xyz = np.zeros((1, 5, 3), np.float32)
    xyz[0, :, 0] = [0.0, 0.1, 0.2, 5.0, 6.0]
    new_xyz = np.zeros((1, 1, 3), np.float32)
    idx = np.asarray(p2.ball_query(0.5, 4, jnp.asarray(xyz), jnp.asarray(new_xyz)))
    # points 0,1,2 inside; padding with first hit (0)
    assert set(idx[0, 0].tolist()) == {0, 1, 2}
    assert (np.bincount(idx[0, 0], minlength=5)[0] == 2)


def test_grouping_and_gather():
    rng = np.random.RandomState(1)
    feats = rng.randn(2, 4, 10).astype(np.float32)
    idx = rng.randint(0, 10, (2, 3, 5)).astype(np.int32)
    out = np.asarray(p2.grouping_operation(jnp.asarray(feats), jnp.asarray(idx)))
    assert out.shape == (2, 4, 3, 5)
    assert np.allclose(out[1, :, 2, 3], feats[1, :, idx[1, 2, 3]])

    gi = rng.randint(0, 10, (2, 6)).astype(np.int32)
    g = np.asarray(p2.gather_operation(jnp.asarray(feats), jnp.asarray(gi)))
    assert np.allclose(g[0, :, 4], feats[0, :, gi[0, 4]])


def test_three_interpolate_exact_at_known_points():
    rng = np.random.RandomState(2)
    known = rng.randn(1, 8, 3).astype(np.float32)
    feats = rng.randn(1, 5, 8).astype(np.float32)
    dist, idx = p2.three_nn(jnp.asarray(known), jnp.asarray(known))
    recip = 1.0 / (np.asarray(dist) + 1e-8)
    w = recip / recip.sum(-1, keepdims=True)
    out = np.asarray(p2.three_interpolate(jnp.asarray(feats), idx, jnp.asarray(w)))
    # nearest neighbour of a known point is itself with dist ~0 -> weight ~1
    np.testing.assert_allclose(out, feats, atol=1e-3)


def test_sa_and_fp_modules():
    from gcanet_tpu.models.pointnet2 import PointnetFPModule, PointnetSAModuleMSG

    rng = np.random.RandomState(3)
    xyz = jnp.asarray(rng.randn(2, 64, 3).astype(np.float32))
    feats = jnp.asarray(rng.randn(2, 64, 8).astype(np.float32))

    sa = PointnetSAModuleMSG(npoint=16, radii=[0.5, 1.0], nsamples=[8, 16],
                             mlps=[[16, 16], [16, 32]])
    vars_ = sa.init(jax.random.PRNGKey(0), xyz, feats)
    new_xyz, new_feats = sa.apply(vars_, xyz, feats)
    assert new_xyz.shape == (2, 16, 3)
    assert new_feats.shape == (2, 16, 48)

    fp = PointnetFPModule(mlp=[32, 16])
    vars_ = fp.init(jax.random.PRNGKey(1), xyz, new_xyz, feats, new_feats)
    up = fp.apply(vars_, xyz, new_xyz, feats, new_feats)
    assert up.shape == (2, 64, 16)
    assert np.isfinite(np.asarray(up)).all()


def test_splinenet_and_transformer_forward():
    from gcanet_tpu.models.splinenet import DGCNNControlPoints
    from gcanet_tpu.models.transformer import Transformer

    rng = np.random.RandomState(4)
    pts = jnp.asarray(rng.randn(1, 100, 3).astype(np.float32))
    net = DGCNNControlPoints(num_control_points=20, k=10)
    vars_ = net.init(jax.random.PRNGKey(0), pts)
    cp = net.apply(vars_, pts)
    assert cp.shape == (1, 400, 3)
    assert np.abs(np.asarray(cp)).max() <= 1.0

    x = jnp.asarray(rng.randn(2, 17, 32).astype(np.float32))
    tr = Transformer(dim=32, depth=2, heads=4, dim_head=8, mlp_dim=64)
    vars_ = tr.init(jax.random.PRNGKey(1), x)
    y = tr.apply(vars_, x)
    assert y.shape == x.shape
