"""Key-point attention offset prediction (dgcnn-4.py:351-452).

The reference samples 120 fixed "key points" with a hard-coded numpy seed
(np.random.seed(1234), dgcnn-4.py:404-406); we reproduce the identical
permutation so checkpoints/behaviour line up.  Everything else is plain XLA:
cosine similarity against the keypoints, top-30, KPAM channel attention over
the sorted-similarity vector, 1x1 convs and a max-pool.
"""

from __future__ import annotations

import flax.linen as fnn
import jax
import jax.numpy as jnp
import numpy as np

from gcanet_tpu.models.layers import ConvGNAct, leaky_relu
from gcanet_tpu.ops.mathutil import safe_norm


def keypoint_permutation(num_points: int, sampling_ratio: int) -> np.ndarray:
    """The exact fixed subset of dgcnn-4.py:403-406."""
    l = np.arange(num_points)
    rng = np.random.RandomState(1234)
    rng.shuffle(l)
    return l[:sampling_ratio]


class KPAMWeights(fnn.Module):
    """Channel-softmax attention weights over the k sorted similarities
    (dgcnn-4.py:351-373) — returns the [B, N, K] weights."""

    k: int

    @fnn.compact
    def __call__(self, attention_feature):
        a = fnn.Dense(self.k, use_bias=False)(attention_feature)
        a = fnn.relu(a)
        a = fnn.Dense(self.k, use_bias=False)(a)
        return fnn.softmax(a, axis=-1)                      # softmax over K


class KPAM(fnn.Module):
    """KPAM applied to features: x * KPAMWeights (kept for the dual variant)."""

    k: int

    @fnn.compact
    def __call__(self, x, attention_feature):
        return x * KPAMWeights(self.k)(attention_feature)[..., None]


class OffsetPredModule(fnn.Module):
    """dgcnn-4.py:376-452: per-point 3-d offsets to the instance centroid."""

    nn_nb: int = 30
    sampling_ratio: int = 120

    @fnn.compact
    def __call__(self, points, feature, instance_feature):
        # points [B, N, 3]; feature [B, N, 128]; instance_feature [B, N, 64]
        b, n, _ = points.shape
        sub = jnp.asarray(keypoint_permutation(n, self.sampling_ratio))

        key_points = points[:, sub]                          # [B, S, 3]
        feature_sampling = feature[:, sub]                   # [B, S, 128]
        inst_sampling = instance_feature[:, sub]             # [B, S, 64]

        # cos_dist (dgcnn-4.py:326-342): -(1 - cos) = cos - 1
        fn = instance_feature / safe_norm(instance_feature, axis=-1, keepdims=True)
        gn = inst_sampling / safe_norm(inst_sampling, axis=-1, keepdims=True)
        sim = jnp.einsum("bnc,bkc->bnk", fn, gn) - 1.0       # [B, N, S]

        topk_dist, topk_idx = jax.lax.top_k(sim, self.nn_nb)  # sorted descending

        def take(src):                                        # [B, S, C] -> [B, N, K, C]
            return jnp.take_along_axis(src[:, None, :, :],
                                       topk_idx[..., None], axis=2)

        # conv1 (dgcnn-4.py:390-392) decomposed: the 131->128 conv is linear
        # and the KPAM attention is a scalar per (n, k), so
        #   conv(a * [feat_j ; kp_j - p_n]) = a * (gather(proj_kp)_j - proj_p_n)
        # with proj_kp computed on the 120 keypoints and proj_p on the points —
        # the [B, N, K, 131] tensor and its 1 GB matmul never materialise.
        c_out = 128
        kernel = self.param("conv1_kernel", fnn.initializers.lecun_normal(),
                            (feature.shape[-1] + 3, c_out))
        w_feat, w_dir = kernel[:feature.shape[-1]], kernel[feature.shape[-1]:]
        proj_kp = feature_sampling @ w_feat + key_points @ w_dir   # [B, S, 128]
        proj_p = points @ w_dir                                    # [B, N, 128]
        h = take(proj_kp) - proj_p[:, :, None, :]                  # [B, N, K, 128]
        a = KPAMWeights(self.nn_nb)(topk_dist)                     # [B, N, K]
        h = h * a[..., None]
        h = fnn.GroupNorm(num_groups=2, epsilon=1e-5)(h)
        h = fnn.leaky_relu(h, negative_slope=0.2)
        h = jnp.max(h, axis=2)                                # max over K -> [B, N, 128]
        h = jnp.concatenate([h, feature], axis=-1)            # [B, N, 256]
        return fnn.Dense(3)(h)                                # mlp_offset
