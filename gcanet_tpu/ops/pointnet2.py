"""PointNet++ op kit, TPU-native.

Replaces the vendored pointnet2_ops CUDA extension
(models/Pointnet2_PyTorch-master/pointnet2_ops_lib/pointnet2_ops/_ext-src/):
  * ``furthest_point_sample``  (sampling_gpu.cu; wrapper pointnet2_utils.py:34-60)
  * ``gather_operation``       (pointnet2_utils.py:63-91)
  * ``ball_query``             (ball_query_gpu.cu; pointnet2_utils.py:94-128)
  * ``grouping_operation``     (group_points_gpu.cu; pointnet2_utils.py:131-160)
  * ``three_nn`` / ``three_interpolate`` (interpolate_gpu.cu; :163-276)
plus the ``knn_point`` / ``group_points`` helpers of models/search_knn.py:11-39.

All fixed-shape and differentiable where the originals are (gather/group/
interpolate); index-producing ops are non-differentiable as in the reference.
FPS is a ``lax.fori_loop`` over the sample count with an O(N) distance update
per step — the standard parallel formulation (each step is one fused VPU pass,
no host sync).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from gcanet_tpu.ops import knn as knn_ops


@functools.partial(jax.jit, static_argnames=("num_samples",))
def furthest_point_sample(xyz: jnp.ndarray, num_samples: int) -> jnp.ndarray:
    """Iterative farthest point sampling. ``xyz [B, N, 3]`` -> idx ``[B, S]``.

    Matches sampling_gpu.cu semantics: start from point 0, greedily take the
    point with max distance to the selected set.
    """
    b, n, _ = xyz.shape
    x = jax.lax.stop_gradient(xyz)

    def body(i, state):
        idx, dists, last = state
        last_xyz = jnp.take_along_axis(x, last[:, None, None], axis=1)  # [B,1,3]
        d = jnp.sum((x - last_xyz) ** 2, -1)                            # [B,N]
        dists = jnp.minimum(dists, d)
        nxt = jnp.argmax(dists, axis=1).astype(jnp.int32)
        idx = idx.at[:, i].set(nxt)
        return idx, dists, nxt

    idx0 = jnp.zeros((b, num_samples), jnp.int32)
    dists0 = jnp.full((b, n), 1e10, x.dtype)
    idx, _, _ = jax.lax.fori_loop(1, num_samples, body,
                                  (idx0, dists0, jnp.zeros((b,), jnp.int32)))
    return idx


def gather_operation(features: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """features [B, C, N], idx [B, S] -> [B, C, S] (pointnet2_utils.py:63-91)."""
    return jnp.take_along_axis(features, idx[:, None, :], axis=2)


@functools.partial(jax.jit, static_argnames=("nsample",))
def ball_query(radius: float, nsample: int, xyz: jnp.ndarray,
               new_xyz: jnp.ndarray) -> jnp.ndarray:
    """First ``nsample`` points within ``radius`` of each query, padding with
    the first hit (ball_query_gpu.cu semantics).  xyz [B, N, 3], new_xyz
    [B, S, 3] -> idx [B, S, nsample].
    """
    d2 = knn_ops.pairwise_sqdist(jax.lax.stop_gradient(new_xyz),
                                 jax.lax.stop_gradient(xyz))        # [B, S, N]
    inside = d2 < radius * radius
    n = xyz.shape[1]
    arange = jnp.arange(n, dtype=jnp.int32)
    # rank hits by point index (CUDA scans in index order); non-hits to the end
    key = jnp.where(inside, arange[None, None, :], n)
    order = jnp.argsort(key, axis=-1)[..., :nsample].astype(jnp.int32)
    got = jnp.take_along_axis(inside, order, axis=-1)
    first = order[..., :1]
    return jnp.where(got, order, first)


def grouping_operation(features: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """features [B, C, N], idx [B, S, K] -> [B, C, S, K] (group_points_gpu.cu)."""
    b, c, n = features.shape
    s, k = idx.shape[1], idx.shape[2]
    flat = jnp.take_along_axis(features, idx.reshape(b, 1, s * k), axis=2)
    return flat.reshape(b, c, s, k)


@jax.jit
def three_nn(unknown: jnp.ndarray, known: jnp.ndarray):
    """3 nearest neighbours: unknown [B, S, 3], known [B, N, 3]
    -> (dist [B, S, 3], idx [B, S, 3]) (interpolate_gpu.cu)."""
    d2 = knn_ops.pairwise_sqdist(jax.lax.stop_gradient(unknown),
                                 jax.lax.stop_gradient(known))
    neg, idx = jax.lax.top_k(-d2, 3)
    return jnp.sqrt(jnp.maximum(-neg, 1e-10)), idx.astype(jnp.int32)


def three_interpolate(features: jnp.ndarray, idx: jnp.ndarray,
                      weight: jnp.ndarray) -> jnp.ndarray:
    """features [B, C, N], idx/weight [B, S, 3] -> [B, C, S]."""
    b, c, n = features.shape
    s = idx.shape[1]
    gathered = jnp.take_along_axis(features, idx.reshape(b, 1, s * 3),
                                   axis=2).reshape(b, c, s, 3)
    return jnp.sum(gathered * weight[:, None, :, :], -1)


def knn_point(k: int, xyz: jnp.ndarray, new_xyz: jnp.ndarray):
    """models/search_knn.py:11-20: kNN of queries in xyz (channels-last)."""
    d2 = knn_ops.pairwise_sqdist(new_xyz, xyz)
    neg, idx = jax.lax.top_k(-d2, k)
    return -neg, idx.astype(jnp.int32)


def group_points(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """models/search_knn.py:23-39: points [B, N, C], idx [B, S, K] -> [B, S, K, C]."""
    b, n, c = points.shape
    s, k = idx.shape[1], idx.shape[2]
    out = jnp.take_along_axis(points, idx.reshape(b, s * k)[..., None], axis=1)
    return out.reshape(b, s, k, c)
