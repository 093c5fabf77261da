"""Reverse-graph backward for the edge-conv neighbour gather (ops/knn.py).

The VJP of ``gather_neighbors`` is the most expensive op in the train step
(scatter-add of the [B, N, K, C] cotangent).  ``gather_neighbors_rev``
re-expresses it as a gather over the reverse graph with a bounded in-degree.
These tests pin: exactness when the cap covers the true max in-degree, the
documented truncation semantics when it does not (numpy oracle), and the
encoder-level flags (edge_backward / shared_graph) end to end.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gcanet_tpu.ops import knn as knn_ops


def _rand_idx(rng, b, n, k):
    return jax.random.randint(rng, (b, n, k), 0, n, dtype=jnp.int32)


def _scatter_grad(x, idx, g):
    """Reference backward: VJP of the plain gather (XLA scatter-add)."""
    _, vjp = jax.vjp(lambda xx: knn_ops.gather_neighbors(xx, idx), x)
    return vjp(g)[0]


def test_revgather_backward_exact_when_cap_covers():
    rng = jax.random.PRNGKey(0)
    b, n, k, c = 2, 64, 8, 5
    x = jax.random.normal(rng, (b, n, c))
    idx = _rand_idx(jax.random.PRNGKey(1), b, n, k)
    g = jax.random.normal(jax.random.PRNGKey(2), (b, n, k, c))

    # forward identical
    np.testing.assert_array_equal(
        np.asarray(knn_ops.gather_neighbors_rev(x, idx, 16)),
        np.asarray(knn_ops.gather_neighbors(x, idx)))

    # max in-degree of this graph
    deg = np.zeros((b, n), np.int64)
    for bi in range(b):
        np.add.at(deg[bi], np.asarray(idx[bi]).ravel(), 1)
    m = int(deg.max())

    _, vjp = jax.vjp(lambda xx: knn_ops.gather_neighbors_rev(xx, idx, m), x)
    got = np.asarray(vjp(g)[0])
    want = np.asarray(_scatter_grad(x, idx, g))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_revgather_backward_truncation_oracle():
    """With a cap below the true in-degree, only each target's first
    ``m`` in-edges IN EDGE-SORTED ORDER contribute; numpy oracle."""
    b, n, k, c, m = 1, 32, 6, 3, 2
    rng = np.random.RandomState(0)
    idx = rng.randint(0, n, (b, n, k)).astype(np.int32)
    g = rng.randn(b, n, k, c).astype(np.float32)
    x = rng.randn(b, n, c).astype(np.float32)

    _, vjp = jax.vjp(
        lambda xx: knn_ops.gather_neighbors_rev(xx, jnp.asarray(idx), m),
        jnp.asarray(x))
    got = np.asarray(vjp(jnp.asarray(g))[0])

    # oracle: jnp.argsort ties broken by position (stable), so in-edges of a
    # target rank in flat-edge order
    want = np.zeros((b, n, c), np.float32)
    for bi in range(b):
        flat_tgt = idx[bi].reshape(-1)
        flat_g = g[bi].reshape(-1, c)
        taken = np.zeros(n, np.int64)
        for e in range(flat_tgt.shape[0]):
            j = flat_tgt[e]
            if taken[j] < m:
                want[bi, j] += flat_g[e]
                taken[j] += 1
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_revgather_backward_bench_like_shapes():
    """kNN-like graph (each point picked ~k times) at a small bench-like
    shape: cap 2k is comfortably exact."""
    rng = jax.random.PRNGKey(3)
    b, n, k, c = 2, 128, 12, 16
    pts = jax.random.uniform(rng, (b, n, 3))
    idx = knn_ops.knn_indices(pts, k, "xla")
    x = jax.random.normal(jax.random.PRNGKey(4), (b, n, c))
    g = jax.random.normal(jax.random.PRNGKey(5), (b, n, k, c))

    deg = np.zeros((b, n), np.int64)
    for bi in range(b):
        np.add.at(deg[bi], np.asarray(idx[bi]).ravel(), 1)
    assert deg.max() <= 4 * k  # sanity on the cap headroom

    _, vjp = jax.vjp(
        lambda xx: knn_ops.gather_neighbors_rev(xx, idx, int(deg.max())), x)
    got = np.asarray(vjp(g)[0])
    want = np.asarray(_scatter_grad(x, idx, g))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("backward", ["scatter", "revgather:64"])
def test_encoder_edge_backward_flags(backward):
    """DGCNNEncoderGn trains under both backward impls and under
    shared_graph; grads stay finite and shapes match."""
    from gcanet_tpu.models.dgcnn import DGCNNEncoderGn

    rng = jax.random.PRNGKey(0)
    pts = jax.random.uniform(rng, (2, 96, 6))
    enc = DGCNNEncoderGn(mode=5, nn_nb=8, knn_impl="xla",
                         edge_backward=backward, shared_graph=True)
    v = enc.init(rng, pts)
    out = enc.apply(v, pts)
    assert out.shape == (2, 96, 1280)

    g = jax.grad(lambda vv: jnp.sum(enc.apply(vv, pts) ** 2))(v)
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(g))


def test_encoder_nn_nb_inner():
    """nn_nb_inner: k2 == k is identical to the default; k2 < k trains with
    the expected sliced-graph shapes under both shared and per-layer graphs."""
    from gcanet_tpu.models.dgcnn import DGCNNEncoderGn

    rng = jax.random.PRNGKey(0)
    pts = jax.random.uniform(rng, (2, 96, 6))

    base = DGCNNEncoderGn(mode=5, nn_nb=8, knn_impl="xla")
    same = DGCNNEncoderGn(mode=5, nn_nb=8, knn_impl="xla", nn_nb_inner=8)
    v = base.init(rng, pts)
    np.testing.assert_array_equal(np.asarray(base.apply(v, pts)),
                                  np.asarray(same.apply(v, pts)))

    for shared in (False, True):
        enc = DGCNNEncoderGn(mode=5, nn_nb=8, knn_impl="xla", nn_nb_inner=4,
                             shared_graph=shared)
        v2 = enc.init(rng, pts)
        out = enc.apply(v2, pts)
        assert out.shape == (2, 96, 1280)
        g = jax.grad(lambda vv: jnp.sum(enc.apply(vv, pts) ** 2))(v2)
        assert all(np.isfinite(np.asarray(x)).all()
                   for x in jax.tree.leaves(g))

    # under shared_graph, inner layers see the NEAREST k2 of the layer-1
    # graph: k2 == k shared output equals slicing by construction
    sh_full = DGCNNEncoderGn(mode=5, nn_nb=8, knn_impl="xla",
                             shared_graph=True)
    sh_same = DGCNNEncoderGn(mode=5, nn_nb=8, knn_impl="xla",
                             shared_graph=True, nn_nb_inner=8)
    v3 = sh_full.init(rng, pts)
    np.testing.assert_array_equal(np.asarray(sh_full.apply(v3, pts)),
                                  np.asarray(sh_same.apply(v3, pts)))


def test_encoder_revgather_matches_scatter_grad():
    """At a high cap, the full encoder's param grads under revgather equal
    the scatter-backward grads (same params, same input)."""
    from gcanet_tpu.models.dgcnn import DGCNNEncoderGn

    rng = jax.random.PRNGKey(0)
    pts = jax.random.uniform(rng, (1, 80, 6))
    enc_s = DGCNNEncoderGn(mode=5, nn_nb=6, knn_impl="xla",
                           edge_backward="scatter")
    enc_r = DGCNNEncoderGn(mode=5, nn_nb=6, knn_impl="xla",
                           edge_backward="revgather:80")  # cap = N >= any deg
    v = enc_s.init(rng, pts)

    def loss(enc, vv):
        return jnp.sum(enc.apply(vv, pts) ** 2)

    gs = jax.grad(lambda vv: loss(enc_s, vv))(v)
    gr = jax.grad(lambda vv: loss(enc_r, vv))(v)
    for a, b in zip(jax.tree.leaves(gs), jax.tree.leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)
