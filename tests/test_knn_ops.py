"""Oracle tests for kNN + edge features, after the KNN_CUDA test pattern
(reference models/KNN_CUDA/tests/test_knn_cuda.py: distances cross-checked
against a brute-force oracle across shapes; indices not compared on ties)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gcanet_tpu.ops import knn as K


@pytest.mark.parametrize("n,c,k", [(10, 3, 2), (100, 3, 8), (500, 6, 33), (1024, 64, 80)])
def test_knn_matches_bruteforce(n, c, k):
    rng = np.random.RandomState(0)
    x = rng.randn(2, n, c).astype(np.float32)
    with jax.default_matmul_precision("float32"):
        idx = np.asarray(K.knn_indices(jnp.asarray(x), k))
    for b in range(2):
        d_ref, _ = K.knn_bruteforce_numpy(x[b], k)
        d_got = ((x[b][:, None, :] - x[b][idx[b]]) ** 2).sum(-1)
        d_got.sort(axis=-1)
        np.testing.assert_allclose(d_got, d_ref, atol=1e-3)


def test_knn_points_normals_metric():
    rng = np.random.RandomState(1)
    p = rng.randn(1, 50, 3).astype(np.float32)
    nrm = rng.randn(1, 50, 3).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    x = np.concatenate([p, nrm], -1)
    with jax.default_matmul_precision("float32"):
        idx = np.asarray(K.knn_points_normals_indices(jnp.asarray(x), 5))
    # oracle: d_pos^2 * (1 + (2 - 2 n.n))
    pd = ((p[0][:, None] - p[0][None]) ** 2).sum(-1)
    nd = 2 - 2 * (nrm[0] @ nrm[0].T)
    metric = pd * (1 + nd)
    ref = np.sort(metric, axis=-1)[:, :5]
    got = np.sort(np.take_along_axis(metric, idx[0], axis=-1), axis=-1)
    np.testing.assert_allclose(got, ref, atol=1e-3)


def test_edge_feature_layout():
    rng = np.random.RandomState(2)
    x = rng.randn(1, 4, 6).astype(np.float32)   # [B, N=4, C=6]
    idx = np.array([[[1, 2], [0, 3], [3, 0], [2, 1]]], dtype=np.int32)
    ef = np.asarray(K.edge_feature(jnp.asarray(x), jnp.asarray(idx)))
    assert ef.shape == (1, 4, 2, 12)
    # [x_j - x_i ; x_i]
    np.testing.assert_allclose(ef[0, 0, 0, :6], x[0, 1] - x[0, 0], rtol=1e-6)
    np.testing.assert_allclose(ef[0, 0, 0, 6:], x[0, 0], rtol=1e-6)
    np.testing.assert_allclose(ef[0, 2, 1, :6], x[0, 0] - x[0, 2], rtol=1e-6)


def test_edge_feature_normals_g():
    rng = np.random.RandomState(3)
    x = rng.randn(1, 5, 6).astype(np.float32)
    x[..., 3:6] /= np.linalg.norm(x[..., 3:6], axis=-1, keepdims=True)
    idx = np.tile(np.arange(5, dtype=np.int32)[None, :, None], (1, 1, 3))
    ef = np.asarray(K.edge_feature_normals_g(jnp.asarray(x), jnp.asarray(idx)))
    assert ef.shape == (1, 5, 3, 7)
    # self-neighbour: angle = clip(<n, n>) = 0.99, diff = 0, ctr = n
    np.testing.assert_allclose(ef[0, :, 0, 0], 0.99, atol=1e-5)
    np.testing.assert_allclose(ef[0, :, 0, 1:4], 0.0, atol=1e-6)
    np.testing.assert_allclose(ef[0, :, 0, 4:7], x[0, :, 3:6], rtol=1e-5)
