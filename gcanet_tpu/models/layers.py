"""Shared neural building blocks (flax), channels-last.

Torch-to-flax translation notes:
  * ``nn.Conv1d/Conv2d(k=1)`` on ``[B, C, ...]`` == ``nn.Dense`` on channels-last.
  * ``nn.GroupNorm(G, C)`` (torch eps 1e-5) == ``fnn.GroupNorm(num_groups=G,
    epsilon=1e-5)`` — both normalise per sample over (spatial x C/G).
  * ``nn.BatchNorm1d(eps=1e-4, momentum=0.1)`` (dgcnn-4.py:605) ==
    ``MaskedBatchNorm(momentum=0.9, epsilon=1e-4)`` with stats over *active*
    voxels only, replicating sparse-conv batch norm.
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as fnn
import jax
import jax.numpy as jnp


def leaky_relu(x):
    return fnn.leaky_relu(x, negative_slope=0.2)


class ConvGNAct(fnn.Module):
    """Dense (1x1 conv) + GroupNorm + activation, the DGCNN conv block.

    ``dtype=jnp.bfloat16`` runs the block's compute (and therefore its
    activations/cotangents) in bf16 — used on the [B, N, K, C] edge tensors
    where HBM traffic, not FLOPs, is the cost.  flax GroupNorm computes its
    statistics in fp32 whenever dtype is half-precision; params stay fp32.
    """

    features: int
    groups: int
    use_bias: bool = False
    act: Callable = leaky_relu
    dtype: Optional[jnp.dtype] = None

    @fnn.compact
    def __call__(self, x):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        x = fnn.Dense(self.features, use_bias=self.use_bias, dtype=self.dtype)(x)
        x = fnn.GroupNorm(num_groups=self.groups, epsilon=1e-5,
                          dtype=self.dtype)(x)
        return self.act(x)


class DenseGN(fnn.Module):
    """Dense + GroupNorm (no activation), for heads that apply relu outside."""

    features: int
    groups: int
    use_bias: bool = True

    @fnn.compact
    def __call__(self, x):
        x = fnn.Dense(self.features, use_bias=self.use_bias)(x)
        return fnn.GroupNorm(num_groups=self.groups, epsilon=1e-5)(x)


class MLP(fnn.Module):
    """softgroup/model/blocks.py:9-27 MLP: (Linear [+norm] ReLU)^(L-1) Linear."""

    out_features: int
    hidden_features: Optional[int] = None
    num_layers: int = 2
    use_norm: bool = False

    @fnn.compact
    def __call__(self, x, train: bool = False, active: Optional[jnp.ndarray] = None):
        h = self.hidden_features or x.shape[-1]
        for _ in range(self.num_layers - 1):
            x = fnn.Dense(h)(x)
            if self.use_norm:
                x = MaskedBatchNorm(momentum=0.9, epsilon=1e-4)(x, train=train, active=active)
            x = fnn.relu(x)
        return fnn.Dense(self.out_features)(x)


class MaskedBatchNorm(fnn.Module):
    """BatchNorm whose statistics are computed over a boolean mask of rows.

    Equivalent to torch BatchNorm1d over sparse-conv voxel features: empty
    voxels in the dense emulation must not contribute to the statistics.
    ``x [..., C]``, ``active [...]`` broadcastable to x's leading dims.
    """

    momentum: float = 0.9
    epsilon: float = 1e-4

    @fnn.compact
    def __call__(self, x, train: bool, active: Optional[jnp.ndarray] = None):
        c = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((c,)))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((c,)))
        gamma = self.param("scale", fnn.initializers.ones, (c,))
        beta = self.param("bias", fnn.initializers.zeros, (c,))

        if train:
            # statistics in fp32 regardless of compute dtype (bf16 sums over
            # ~1M voxels would lose several decimal digits)
            flat = x.reshape(-1, c).astype(jnp.float32)
            if active is not None:
                m = active.reshape(-1, 1).astype(jnp.float32)
                cnt = jnp.maximum(jnp.sum(m), 1.0)
                mean = jnp.sum(flat * m, axis=0) / cnt
                var = jnp.sum(((flat - mean) ** 2) * m, axis=0) / cnt
            else:
                mean = jnp.mean(flat, axis=0)
                var = jnp.var(flat, axis=0)
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
        else:
            mean, var = ra_mean.value, ra_var.value

        y = ((x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.epsilon)
             * gamma + beta).astype(x.dtype)
        if active is not None:
            y = y * active[..., None].astype(x.dtype)
        return y
