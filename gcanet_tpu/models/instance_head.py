"""Per-proposal instance head: dense masked 3-D U-Net + cls/mask/IoU heads.

TPU-native replacement for the spconv tiny U-Net of the reference
(dgcnn-4.py:611-615 construction, :1379-1392 forward; blocks at
softgroup/model/blocks.py:44-143).  Submanifold sparse convolution computes
outputs only at active voxel sites, summing over active neighbours; with
inactive voxels held at zero, a dense convolution produces identical values at
the active sites — so we run dense convs on a [P, G, G, G, C] grid and mask
every op's output with the occupancy mask.  Stride-2 down/up convolutions use
the down-sampled occupancy, mirroring spconv's SparseConv3d/SparseInverseConv3d
indice bookkeeping.  BatchNorm statistics are taken over active voxels only
(MaskedBatchNorm), matching norm over sparse features.

The reference grid is 64^3 sparse; we default to a dense 16^3 (config
``instance_head.grid_size``) — an intentional architecture deviation noted in
SURVEY.md §7.6 (per-proposal clouds are <= 3000 points, so occupancy at 64^3
is ~0.1%; a dense 16^3 grid keeps similar effective resolution per proposal).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import flax.linen as fnn
import jax
import jax.numpy as jnp

from gcanet_tpu.models.layers import MLP, MaskedBatchNorm


class SubMConv3d(fnn.Module):
    """3x3x3 masked dense conv == submanifold sparse conv at active sites.

    ``dtype=jnp.bfloat16`` must be passed EXPLICITLY for half-precision
    compute: flax's default dtype inference promotes a bf16 input against the
    fp32 params back to fp32, silently undoing any caller-side cast.
    """

    features: int
    kernel: int = 3
    dtype: Optional[jnp.dtype] = None

    @fnn.compact
    def __call__(self, x, active):
        y = fnn.Conv(self.features, (self.kernel,) * 3, padding="SAME",
                     use_bias=False, dtype=self.dtype)(x)
        return y * active[..., None]


class ResidualBlock(fnn.Module):
    """blocks.py:44-79 pre-activation residual block (BN -> ReLU -> conv) x2."""

    features: int
    dtype: Optional[jnp.dtype] = None

    @fnn.compact
    def __call__(self, x, active, train: bool):
        identity = x
        h = MaskedBatchNorm()(x, train=train, active=active)
        h = fnn.relu(h) * active[..., None]
        h = SubMConv3d(self.features, dtype=self.dtype)(h, active)
        h = MaskedBatchNorm()(h, train=train, active=active)
        h = fnn.relu(h) * active[..., None]
        h = SubMConv3d(self.features, dtype=self.dtype)(h, active)
        if identity.shape[-1] != self.features:
            identity = fnn.Dense(self.features, use_bias=False,
                                 dtype=self.dtype)(identity)  # Custom1x1Subm3d
        return h + identity * active[..., None]


class TinyUNet(fnn.Module):
    """UBlock([C, 2C], block_reps=2) of blocks.py:82-143 on dense masked grids."""

    channels: int = 64
    dtype: Optional[jnp.dtype] = None

    @fnn.compact
    def __call__(self, x, active, train: bool):
        c = self.channels
        a0 = active
        for _ in range(2):                                   # blocks
            x = ResidualBlock(c, dtype=self.dtype)(x, a0, train)
        identity = x

        # down: BN + ReLU + SparseConv3d(k2 s2) (blocks.py:99-107)
        h = MaskedBatchNorm()(x, train=train, active=a0)
        h = fnn.relu(h) * a0[..., None]
        h = fnn.Conv(2 * c, (2, 2, 2), strides=(2, 2, 2), use_bias=False,
                     dtype=self.dtype)(h)
        a1 = jnp.max(a0.reshape(a0.shape[0],
                                a0.shape[1] // 2, 2,
                                a0.shape[2] // 2, 2,
                                a0.shape[3] // 2, 2).astype(jnp.int32),
                     axis=(2, 4, 6)).astype(bool)
        h = h * a1[..., None]

        for _ in range(2):                                   # inner UBlock([2C]) blocks
            h = ResidualBlock(2 * c, dtype=self.dtype)(h, a1, train)

        # deconv: BN + ReLU + SparseInverseConv3d(k2) (blocks.py:112-119)
        h = MaskedBatchNorm()(h, train=train, active=a1)
        h = fnn.relu(h) * a1[..., None]
        h = fnn.ConvTranspose(c, (2, 2, 2), strides=(2, 2, 2), use_bias=False,
                              dtype=self.dtype)(h)
        h = h * a0[..., None]

        x = jnp.concatenate([identity, h], axis=-1)          # blocks.py:140
        # blocks_tail: block0 in=2C out=C, block1 in=C out=C (blocks.py:121-129)
        x = ResidualBlock(c, dtype=self.dtype)(x, a0, train)
        x = ResidualBlock(c, dtype=self.dtype)(x, a0, train)
        return x


class InstanceHeadOutput(NamedTuple):
    cls_scores: jnp.ndarray        # [P, num_classes]
    iou_scores: jnp.ndarray        # [P, num_classes]
    mask_scores: jnp.ndarray       # [CH, B*N, num_classes] per-entry voxel mask
    entry_pid: jnp.ndarray         # [CH, B*N] == Proposals.point_pid


class InstanceHead(fnn.Module):
    """forward_instance (dgcnn-4.py:1379-1392) on dense voxelised proposals.

    ``compute_bf16`` runs the dense U-Net convolutions in bfloat16 (the MXU's
    native precision; ~1.4x faster fwd+bwd measured) while batch-norm
    statistics stay fp32 (MaskedBatchNorm upcasts internally) and all head
    outputs are returned fp32.
    """

    num_classes: int = 7
    channels: int = 64
    grid_size: int = 16
    compute_bf16: bool = True

    @fnn.compact
    def __call__(self, vox_feats, active, entry_voxel, point_pid, train: bool):
        p, g3, c = vox_feats.shape
        g = self.grid_size
        dt = jnp.bfloat16 if self.compute_bf16 else None
        if self.compute_bf16:
            vox_feats = vox_feats.astype(jnp.bfloat16)
        x = vox_feats.reshape(p, g, g, g, c)
        a = active.reshape(p, g, g, g)

        x = TinyUNet(self.channels, dtype=dt)(x, a, train)
        x = MaskedBatchNorm()(x, train=train, active=a)      # tiny_unet_outputlayer
        x = fnn.relu(x) * a[..., None]
        x = x.reshape(p, g3, self.channels).astype(jnp.float32)

        # mask head: per-voxel MLP (MLP(C, classes, num_layers=2), dgcnn-4.py:614)
        mask_vox = MLP(self.num_classes, hidden_features=self.channels)(x)  # [P, G3, cls]

        # gather per-entry mask scores at each point's voxel
        ch, n_total = point_pid.shape
        pid_flat = point_pid.reshape(-1)
        vox_flat = entry_voxel.reshape(-1)
        valid = (pid_flat >= 0) & (vox_flat >= 0)
        pid_c = jnp.clip(pid_flat, 0, p - 1)
        vox_c = jnp.clip(vox_flat, 0, g3 - 1)
        entry_mask = mask_vox[pid_c, vox_c]                  # [CH*BN, cls]
        entry_mask = jnp.where(valid[:, None], entry_mask, 0.0)
        entry_mask = entry_mask.reshape(ch, n_total, self.num_classes)

        # global average pool over active voxels (global_avg_pool, roipool.cu:12-71)
        denom = jnp.maximum(jnp.sum(active, axis=1, keepdims=True), 1)
        pooled = jnp.sum(x * active[..., None], axis=1) / denom  # [P, C]

        cls_scores = fnn.Dense(self.num_classes)(pooled)
        iou_scores = fnn.Dense(self.num_classes)(pooled)
        return InstanceHeadOutput(cls_scores, iou_scores, entry_mask, point_pid)
