"""k-nearest-neighbour search and DGCNN edge features, TPU-native.

Replaces the reference's per-batch-item O(N^2) torch matmul+topk loops
(``models/dgcnn-hais-concat-direct-4.py:30-90``) and the KNN_CUDA extension
(``models/KNN_CUDA/knn_cuda/csrc/cuda/knn.cu``).  Everything here is batched,
fixed-shape, and jit-compatible.  Layout is channels-last: points are
``[B, N, C]`` and edge features are ``[B, N, K, C']``.

Implementations:
  * ``xla``     — distance matrix on the MXU + ``lax.top_k`` (exact).
  * ``approx``  — distance matrix + ``lax.approx_max_k`` (TPU-optimised partial
                  reduction; the encoder consumes neighbourhoods as sets via a
                  max-pool, so high-recall approximate top-k is behaviourally
                  equivalent there).

The neighbour indices are integers, so no gradient flows through the search —
matching the reference's ``torch.no_grad()`` wrapper (dgcnn-4.py:33,59).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def pairwise_sqdist(x: jnp.ndarray, y: jnp.ndarray | None = None) -> jnp.ndarray:
    """Squared euclidean distances ``[..., N, M]`` for ``x [..., N, C]``.

    Mirrors dgcnn-4.py:36-38 (||xi||^2 - 2 xi.xj + ||xj||^2), computed with a
    single MXU matmul.
    """
    if y is None:
        y = x
    x2 = jnp.sum(x * x, axis=-1, keepdims=True)            # [..., N, 1]
    y2 = jnp.sum(y * y, axis=-1, keepdims=True)            # [..., M, 1]
    inner = jnp.einsum("...nc,...mc->...nm", x, y,
                       preferred_element_type=jnp.float32)
    return x2 - 2.0 * inner + jnp.swapaxes(y2, -1, -2)


def pairwise_dist_points_normals(x: jnp.ndarray) -> jnp.ndarray:
    """Position-normal weighted metric of dgcnn-4.py:50-90.

    ``x [..., N, 6]`` (xyz ++ normal).  distance = d_pos^2 * (1 + d_normal^2)
    where d_normal^2 = 2 - 2 n_i . n_j  ("pays less attention to normals").
    """
    p, n = x[..., 0:3], x[..., 3:6]
    pd = pairwise_sqdist(p)
    nd = 2.0 - 2.0 * jnp.einsum("...nc,...mc->...nm", n, n,
                                preferred_element_type=jnp.float32)
    return pd * (1.0 + nd)


# Per-neighbour recall of the approximate search.  Measured on v5e at
# N=8192, k=80 (B=8): target 0.95 -> recall 0.987 at 49 ms/call, 0.9 ->
# 0.968 at 21 ms, 0.8 -> 0.933 at 10 ms, 0.7 -> 0.863 at 7 ms; exact top_k
# 187 ms.  The consumers max-pool over the neighbourhood, so a few percent
# of swapped near-neighbours is noise.  Default 0.8: production-size
# convergence is indistinguishable from 0.9 (mIoU 0.92 / type-mIoU 1.00 at
# step 1000, docs/production_convergence_r08.log) and the step is ~6%
# faster.  Encode a custom target in the impl string: ``approx:0.9``.
APPROX_RECALL_TARGET = 0.8


def _topk_neighbors(neg_dist: jnp.ndarray, k: int, impl: str) -> jnp.ndarray:
    if impl.startswith("approx"):
        target = float(impl.split(":", 1)[1]) if ":" in impl \
            else APPROX_RECALL_TARGET
        _, idx = jax.lax.approx_max_k(neg_dist, k, recall_target=target)
    else:
        _, idx = jax.lax.top_k(neg_dist, k)
    return idx


# Above this batch size the N x N distance matrices are computed in chunks
# (sequential lax.map) to bound peak memory: at B=16, N=8192 a single fused
# batch would transiently hold 4.3 GB of fp32 distances.  Measured: chunking
# at B=8 costs ~2x step time (serialisation), so it only engages beyond that.
_KNN_CHUNK = 4
_KNN_CHUNK_MIN_BATCH = 9


def _chunked(metric_fn, x, k, impl):
    b = x.shape[0]
    if b < _KNN_CHUNK_MIN_BATCH or b % _KNN_CHUNK:
        return _topk_neighbors(-metric_fn(x), k, impl)
    xs = x.reshape(b // _KNN_CHUNK, _KNN_CHUNK, *x.shape[1:])
    out = jax.lax.map(lambda xc: _topk_neighbors(-metric_fn(xc), k, impl), xs)
    return out.reshape(b, x.shape[1], k)


@functools.partial(jax.jit, static_argnames=("k", "impl"))
def knn_indices(x: jnp.ndarray, k: int, impl: str = "xla") -> jnp.ndarray:
    """Plain euclidean kNN of dgcnn-4.py:30-47. ``x [B, N, C]`` -> ``[B, N, k]``.

    The reference's (k1, k2) dilation machinery reduces to top-k because the
    default model always calls it with k1 == k2 (dgcnn-4.py:493-503).
    """
    return _chunked(pairwise_sqdist, jax.lax.stop_gradient(x), k, impl)


@functools.partial(jax.jit, static_argnames=("k", "impl"))
def knn_points_normals_indices(x: jnp.ndarray, k: int, impl: str = "xla") -> jnp.ndarray:
    """kNN under the position-normal metric (dgcnn-4.py:50-90). ``x [B, N, 6]``."""
    return _chunked(pairwise_dist_points_normals, jax.lax.stop_gradient(x), k, impl)


def gather_neighbors(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather ``x [B, N, C]`` at ``idx [B, N, K]`` -> ``[B, N, K, C]``."""
    return jnp.take_along_axis(x[:, :, None, :], idx[..., None], axis=1)


# ----------------------------------------------------------------------------
# Reverse-graph backward for the neighbour gather.
#
# The VJP of ``gather_neighbors`` is a scatter-add of the [B, N, K, C]
# cotangent into [B, N, C] — the single most expensive op in the train step
# (2 x 54 ms at the bench shapes; BASELINE.md).  TPU row-gathers are ~2.4x
# cheaper per index than row-scatters (measured, BASELINE.md r1 findings), so
# re-expressing the scatter as a gather over the REVERSE graph pays when the
# reverse index is cheap enough to build:
#
#   grad_x[j] = sum over in-edges e of j of g[e]
#             = sum_m g[rev[j, m]]            rev built by sorting edges by
#                                             target point
#
# ``max_in_degree`` bounds the reverse fan-in: points chosen as a neighbour
# by more than ``max_in_degree`` others have their surplus gradient
# contributions DROPPED (a documented approximation, like approx-kNN recall —
# hub points in a kNN graph have unbounded in-degree).  Exactness and
# convergence are A/B'd before this ever becomes a default; the oracle test
# uses max_in_degree >= the true maximum, where the result is exact.
# ----------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def gather_neighbors_rev(x: jnp.ndarray, idx: jnp.ndarray,
                         max_in_degree: int = 64) -> jnp.ndarray:
    """``gather_neighbors`` with a reverse-graph (gather-based) backward."""
    return gather_neighbors(x, idx)


def _gnr_fwd(x, idx, max_in_degree):
    return gather_neighbors(x, idx), (idx, x.shape)


def _gnr_bwd(max_in_degree, res, g):
    idx, x_shape = res
    b, n, k = idx.shape
    e = n * k
    m = max_in_degree
    flat = idx.reshape(b, e).astype(jnp.int32)
    order = jnp.argsort(flat, axis=1).astype(jnp.int32)        # [B, E]
    sorted_tgt = jnp.take_along_axis(flat, order, axis=1)
    # first sorted position of each target point (vectorised binary search)
    pts = jnp.arange(n, dtype=jnp.int32)
    starts = jax.vmap(
        lambda st: jnp.searchsorted(st, pts, side="left"))(sorted_tgt)
    ends = jnp.concatenate(
        [starts[:, 1:], jnp.full((b, 1), e, starts.dtype)], axis=1)
    pos = starts[:, :, None] + jnp.arange(m, dtype=jnp.int32)  # [B, N, M]
    valid = pos < ends[:, :, None]
    pos_c = jnp.minimum(pos, e - 1).reshape(b, n * m)
    rev = jnp.take_along_axis(order, pos_c, axis=1).reshape(b, n, m)
    rev = jnp.where(valid, rev, e)                             # pad row -> 0
    c = g.shape[-1]
    gf = jnp.concatenate(
        [g.reshape(b, e, c), jnp.zeros((b, 1, c), g.dtype)], axis=1)
    contrib = jnp.take_along_axis(
        gf, rev.reshape(b, n * m)[..., None], axis=1)          # [B, N*M, C]
    grad_x = jnp.sum(contrib.reshape(b, n, m, c), axis=2)
    return grad_x.astype(jnp.result_type(g.dtype)).reshape(x_shape), None


gather_neighbors_rev.defvjp(_gnr_fwd, _gnr_bwd)


def gather_neighbors_impl(x: jnp.ndarray, idx: jnp.ndarray,
                          backward: str = "scatter") -> jnp.ndarray:
    """Neighbour gather with a selectable backward.

    ``backward``: ``"scatter"`` (XLA scatter-add VJP, exact — the default) or
    ``"revgather:M"`` (reverse-graph gather VJP, in-degree capped at M).
    """
    if backward.startswith("revgather"):
        m = int(backward.split(":", 1)[1]) if ":" in backward else 64
        return gather_neighbors_rev(x, idx, m)
    return gather_neighbors(x, idx)


def edge_feature_from_gathered(x: jnp.ndarray, nbr: jnp.ndarray) -> jnp.ndarray:
    """Edge feature when the neighbour rows are already gathered (lets callers
    share one gather between consumers of the same index set)."""
    ctr = jnp.broadcast_to(x[:, :, None, :], nbr.shape)
    return jnp.concatenate([nbr - ctr, ctr], axis=-1)


def edge_feature_normals_g_from_gathered(x: jnp.ndarray, nbr6: jnp.ndarray) -> jnp.ndarray:
    """Normal-angle edge feature from pre-gathered 6-d neighbours."""
    n = x[..., 3:6]
    n_nbr = nbr6[..., 3:6]
    n_ctr = jnp.broadcast_to(n[:, :, None, :], n_nbr.shape)
    angle = jnp.clip(jnp.sum(n_ctr * n_nbr, axis=-1, keepdims=True), -0.99, 0.99)
    return jnp.concatenate([angle, n_nbr - n_ctr, n_ctr], axis=-1)


def edge_feature(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """DGCNN edge feature (dgcnn-4.py:93-124): ``[x_j - x_i ; x_i]``.

    ``x [B, N, C]``, ``idx [B, N, K]`` -> ``[B, N, K, 2C]`` (channels-last,
    vs. the reference's ``[B, 2C, N, K]``).
    """
    nbr = gather_neighbors(x, idx)
    ctr = jnp.broadcast_to(x[:, :, None, :], nbr.shape)
    return jnp.concatenate([nbr - ctr, ctr], axis=-1)


def edge_feature_normals_g(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Normal-angle edge feature of dgcnn-4.py:164-205.

    ``x [B, N, 6]`` (xyz ++ normal) -> ``[B, N, K, 7]``:
    ``[ <n_i, n_j> clamped ; n_j - n_i ; n_i ]``.
    """
    n = x[..., 3:6]
    n_nbr = gather_neighbors(n, idx)                       # [B, N, K, 3]
    n_ctr = jnp.broadcast_to(n[:, :, None, :], n_nbr.shape)
    angle = jnp.clip(jnp.sum(n_ctr * n_nbr, axis=-1, keepdims=True), -0.99, 0.99)
    return jnp.concatenate([angle, n_nbr - n_ctr, n_ctr], axis=-1)


# ----------------------------------------------------------------------------
# Reference oracles (used by tests, in the spirit of
# models/KNN_CUDA/tests/test_knn_cuda.py — brute force cross-check).
# ----------------------------------------------------------------------------

def knn_bruteforce_numpy(x, k):
    """Pure-numpy exact kNN for oracle tests. ``x [N, C]`` -> dist, idx [N, k]."""
    import numpy as np

    d = ((x[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    idx = np.argsort(d, axis=-1, kind="stable")[:, :k]
    return np.take_along_axis(d, idx, axis=-1), idx
