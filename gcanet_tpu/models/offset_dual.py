"""Dual-attention offset module — the ``-2`` model variant's head.

Reference: models/dgcnn-hais-concat-direct-2.py:326-466.  Differences from the
default (``-4``) module:
  * neighbourhoods are the k=60 *geometrically* nearest of 120 fixed keypoints
    (KNN_CUDA + pointnet2 grouping in the reference -> our kNN ops), not
    cosine-similarity top-k;
  * KPAM uses a sigmoid gate (not softmax) driven by instance-embedding
    euclidean distances to the neighbours (inst_and_seg_dist, :307-323).
This is the reason KNN_CUDA / pointnet2_ops exist in the reference tree; both
are subsumed by :mod:`gcanet_tpu.ops.knn` / :mod:`gcanet_tpu.ops.pointnet2`.
"""

from __future__ import annotations

import flax.linen as fnn
import jax
import jax.numpy as jnp

from gcanet_tpu.models.layers import ConvGNAct
from gcanet_tpu.models.offset import keypoint_permutation
from gcanet_tpu.ops import pointnet2 as p2


class KPAMSigmoid(fnn.Module):
    """Sigmoid-gated keypoint attention (dgcnn-2.py:326-349)."""

    k: int

    @fnn.compact
    def __call__(self, x, attention_feature):
        a = fnn.Dense(self.k, use_bias=False)(attention_feature)
        a = fnn.relu(a)
        a = fnn.Dense(self.k, use_bias=False)(a)
        a = fnn.sigmoid(a)
        return x * a[..., None]


class OffsetPredModuleDual(fnn.Module):
    """dgcnn-2.py:351-466 (nn_nb=60, sampling_ratio=120 at :565)."""

    nn_nb: int = 60
    sampling_ratio: int = 120

    @fnn.compact
    def __call__(self, points, feature, semantic_feature, instance_feature):
        b, n, _ = points.shape
        k = min(self.nn_nb, self.sampling_ratio)
        sub = jnp.asarray(keypoint_permutation(n, self.sampling_ratio))
        key_points = points[:, sub]
        feature_sampling = feature[:, sub]

        # k nearest keypoints by euclidean distance (KNN_CUDA semantics).
        # The three keypoint pulls are one [B,N,K,S]@[B,S,C] one-hot matmul:
        # with S=120 source rows this is an order of magnitude faster than
        # gather/scatter on TPU (see OffsetPredModule).  The seg branch of the
        # reference is commented out (dgcnn-2.py), so sem_knn is not pulled.
        _, idx = p2.knn_point(k, key_points, points)            # [B, N, K]
        onehot = jax.nn.one_hot(idx, self.sampling_ratio, dtype=feature.dtype)
        src = jnp.concatenate([key_points, feature_sampling,
                               instance_feature[:, sub]], -1)   # [B, S, 195]
        pulled = jnp.einsum("bnks,bsc->bnkc", onehot, src)
        points_knn = pulled[..., :3]                            # [B, N, K, 3]
        feature_knn = pulled[..., 3:3 + feature.shape[-1]]      # [B, N, K, 128]
        inst_knn = pulled[..., 3 + feature.shape[-1]:]          # [B, N, K, 64]

        direction = points_knn - points[:, :, None, :]
        feat_dir = jnp.concatenate([feature_knn, direction], -1)  # [B,N,K,131]

        # euclidean distance of each point's instance embedding to neighbours
        d_inst = jnp.sqrt(jnp.clip(jnp.sum(
            (instance_feature[:, :, None, :] - inst_knn) ** 2, -1), min=1e-12))

        attended = KPAMSigmoid(k)(feat_dir, d_inst)
        h = ConvGNAct(128, 2)(attended)
        h = jnp.max(h, axis=2)
        h = jnp.concatenate([h, feature], axis=-1)
        return fnn.Dense(3)(h)
