"""PointNet++ set-abstraction / feature-propagation modules (flax).

Equivalent of the vendored ``pointnet2_ops_lib`` module layer
(pointnet2_ops/pointnet2_utils.py:279-379 QueryAndGroup/GroupAll and
pointnet2_ops/pointnet2_modules.py:22-209 SA/MSG/FP modules), rebuilt
channels-last on the TPU-native op kit.  BASELINE.json config 2 exercises
this path: FPS + ball-query + grouping MLPs on ABC batches.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as fnn
import jax.numpy as jnp

from gcanet_tpu.ops import pointnet2 as p2


class SharedMLP(fnn.Module):
    """Per-point MLP: Dense + BatchNorm + ReLU stack (channels-last)."""

    channels: Sequence[int]

    @fnn.compact
    def __call__(self, x, train: bool = False):
        for c in self.channels:
            x = fnn.Dense(c, use_bias=False)(x)
            x = fnn.BatchNorm(use_running_average=not train, momentum=0.9,
                              epsilon=1e-5)(x)
            x = fnn.relu(x)
        return x


def query_and_group(xyz, new_xyz, features, radius: float, nsample: int,
                    use_xyz: bool = True):
    """pointnet2_utils.py:279-340: ball query + grouping + centre subtraction.

    xyz [B, N, 3]; new_xyz [B, S, 3]; features [B, N, C] or None
    -> [B, S, nsample, C(+3)].
    """
    idx = p2.ball_query(radius, nsample, xyz, new_xyz)
    grouped_xyz = p2.group_points(xyz, idx) - new_xyz[:, :, None, :]
    if features is not None:
        grouped = p2.group_points(features, idx)
        return jnp.concatenate([grouped_xyz, grouped], -1) if use_xyz else grouped
    return grouped_xyz


def group_all(xyz, features, use_xyz: bool = True):
    """pointnet2_utils.py:343-379: the single-group variant."""
    grouped_xyz = xyz[:, None, :, :]
    if features is not None:
        grouped = features[:, None, :, :]
        return jnp.concatenate([grouped_xyz, grouped], -1) if use_xyz else grouped
    return grouped_xyz


class PointnetSAModuleMSG(fnn.Module):
    """Multi-scale-grouping set abstraction (pointnet2_modules.py:62-135)."""

    npoint: Optional[int]
    radii: Sequence[float]
    nsamples: Sequence[int]
    mlps: Sequence[Sequence[int]]
    use_xyz: bool = True

    @fnn.compact
    def __call__(self, xyz, features=None, train: bool = False
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        if self.npoint is not None:
            fps_idx = p2.furthest_point_sample(xyz, self.npoint)
            new_xyz = jnp.take_along_axis(xyz, fps_idx[..., None], axis=1)
        else:
            new_xyz = jnp.zeros((xyz.shape[0], 1, 3), xyz.dtype)

        outs = []
        for radius, nsample, mlp in zip(self.radii, self.nsamples, self.mlps):
            if self.npoint is not None:
                g = query_and_group(xyz, new_xyz, features, radius, nsample,
                                    self.use_xyz)
            else:
                g = group_all(xyz, features, self.use_xyz)
            g = SharedMLP(mlp)(g, train)
            outs.append(jnp.max(g, axis=2))                 # [B, S, C]
        return new_xyz, jnp.concatenate(outs, -1)


class PointnetSAModule(PointnetSAModuleMSG):
    """Single-scale convenience wrapper (pointnet2_modules.py:138-166)."""

    @classmethod
    def make(cls, mlp, npoint=None, radius=None, nsample=None, use_xyz=True):
        return cls(npoint=npoint, radii=[radius], nsamples=[nsample],
                   mlps=[mlp], use_xyz=use_xyz)


class PointnetFPModule(fnn.Module):
    """Feature propagation (pointnet2_modules.py:169-209)."""

    mlp: Sequence[int]

    @fnn.compact
    def __call__(self, unknown, known, unknown_feats, known_feats,
                 train: bool = False):
        if known is not None:
            dist, idx = p2.three_nn(unknown, known)
            recip = 1.0 / (dist + 1e-8)
            weight = recip / jnp.sum(recip, -1, keepdims=True)
            interp = p2.three_interpolate(
                jnp.swapaxes(known_feats, 1, 2), idx, weight)
            interp = jnp.swapaxes(interp, 1, 2)             # [B, S, C]
        else:
            interp = jnp.broadcast_to(known_feats,
                                      (known_feats.shape[0], unknown.shape[1],
                                       known_feats.shape[-1]))
        if unknown_feats is not None:
            interp = jnp.concatenate([interp, unknown_feats], -1)
        return SharedMLP(self.mlp)(interp, train)
