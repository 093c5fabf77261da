"""SplineNet — B-spline control-point regression (reference models/splinenet.py).

``DGCNNControlPoints``: 4 edge convs + global pooling -> 1024-d code -> MLP ->
tanh control grid (20 x 20 x 3).  Used by the geometric-consistency affinity
path to reconstruct open/closed spline surfaces (abc_utils.py:34-61 loads
pretrained weights; here weights come from our own checkpoints).

mode 0 = open splines (64/64/128/256 channels), mode 1 = closed splines
(128/256/256/512) — splinenet.py:67-135.
"""

from __future__ import annotations

import flax.linen as fnn
import jax.numpy as jnp

from gcanet_tpu.ops import knn as knn_ops


class _EdgeBlock(fnn.Module):
    features: int
    k: int

    @fnn.compact
    def __call__(self, x, train: bool):
        idx = knn_ops.knn_indices(x, self.k)
        ef = knn_ops.edge_feature(x, idx)
        ef = fnn.Dense(self.features, use_bias=False)(ef)
        ef = fnn.BatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5)(ef)
        ef = fnn.leaky_relu(ef, negative_slope=0.2)
        return jnp.max(ef, axis=2)


class DGCNNControlPoints(fnn.Module):
    num_control_points: int = 20
    k: int = 40
    mode: int = 0

    @fnn.compact
    def __call__(self, points, weights=None, train: bool = False):
        """points [B, N, 3] -> control grid [B, cp^2, 3]."""
        b = points.shape[0]
        chans = (64, 64, 128, 256) if self.mode == 0 else (128, 256, 256, 512)

        x = points
        skips = []
        for c in chans:
            x = _EdgeBlock(c, self.k)(x, train)
            skips.append(x)
        x = jnp.concatenate(skips, axis=-1)

        width = 1024
        x = fnn.Dense(width, use_bias=False)(x)
        x = fnn.BatchNorm(use_running_average=not train, momentum=0.9,
                          epsilon=1e-5)(x)
        x = fnn.leaky_relu(x, negative_slope=0.2)

        if weights is not None:
            x = x * weights[..., None]

        code = jnp.max(x, axis=1)                       # adaptive max pool
        h = fnn.relu(fnn.BatchNorm(use_running_average=not train, momentum=0.9,
                                   epsilon=1e-5)(fnn.Dense(1024)(code)))
        h = fnn.relu(fnn.BatchNorm(use_running_average=not train, momentum=0.9,
                                   epsilon=1e-5)(fnn.Dense(1024)(h)))
        cp = jnp.tanh(fnn.Dense(3 * self.num_control_points**2)(h))
        return cp.reshape(b, self.num_control_points**2, 3)
