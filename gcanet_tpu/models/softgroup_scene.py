"""Scene-level SoftGroup model family.

TPU-native counterpart of the vendored original SoftGroup
(softgroup/model/softgroup.py:18-731): a voxel U-Net backbone over the whole
scene with semantic + offset heads, followed by the same class-gated
clustering and per-proposal instance head as the flagship model.  The
reference backbone is a spconv sparse U-Net over a point-cloud-sized voxel
hash; here the scene is voxelised into a dense masked grid (the same
masked-dense-equals-submanifold equivalence proved for the instance head) and
features are mapped voxel->point through the p2v map.

This covers SoftGroup-style scene segmentation (ScanNet-like data) as a model
family; GCANet's ABC pipeline keeps using the DGCNN flagship.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import flax.linen as fnn
import jax
import jax.numpy as jnp

from gcanet_tpu.config import Config
from gcanet_tpu.models.instance_head import InstanceHead, ResidualBlock
from gcanet_tpu.models.layers import MLP, MaskedBatchNorm
from gcanet_tpu.ops import grouping as grouping_ops
from gcanet_tpu.ops import segment as seg
from gcanet_tpu.ops import voxelize as vox_ops


class SceneUNet(fnn.Module):
    """Dense masked 3-level U-Net over [B, G, G, G, C] scene grids
    (softgroup.py's UBlock([C, 2C, 3C, ...]) analogue, depth 3).

    ``dtype=jnp.bfloat16`` runs the convolutions in bf16 (explicitly — flax's
    default dtype inference would promote back to fp32 against fp32 params);
    MaskedBatchNorm statistics stay fp32 either way.
    """

    channels: int = 32
    dtype: jnp.dtype | None = None
    # Rematerialise the residual blocks' activations in backward: the level-0
    # [B, G^3, C] tensors dominate scene HBM (B=10 at G=64 OOMs,
    # BASELINE.md 2026-08-19); remat trades one extra forward pass of the
    # blocks for dropping their stored activations, lifting the batch
    # ceiling.  Opt-in via SoftGroupNet(remat=True) / GCA_BENCH_SCENE_REMAT.
    remat: bool = False

    @fnn.compact
    def __call__(self, x, active, train: bool):
        c = self.channels
        # train is arg index 3 (0 = module instance) — static python bool
        RB = (fnn.remat(ResidualBlock, static_argnums=(3,)) if self.remat
              else ResidualBlock)
        if self.dtype is not None:
            x = x.astype(self.dtype)

        def down(h, a):
            h = MaskedBatchNorm()(h, train=train, active=a)
            h = fnn.relu(h) * a[..., None]
            h = fnn.Conv(h.shape[-1] * 2, (2, 2, 2), strides=(2, 2, 2),
                         use_bias=False, dtype=self.dtype)(h)
            b = a.reshape(a.shape[0], a.shape[1] // 2, 2, a.shape[2] // 2, 2,
                          a.shape[3] // 2, 2)
            a2 = jnp.max(b.astype(jnp.int32), axis=(2, 4, 6)).astype(bool)
            return h * a2[..., None], a2

        def up(h, a_target, out_c):
            h = fnn.ConvTranspose(out_c, (2, 2, 2), strides=(2, 2, 2),
                                  use_bias=False, dtype=self.dtype)(h)
            return h * a_target[..., None]

        x0 = RB(c, dtype=self.dtype, name="ResidualBlock_0")(x, active, train)
        x1, a1 = down(x0, active)
        x1 = RB(2 * c, dtype=self.dtype, name="ResidualBlock_1")(x1, a1, train)
        x2, a2 = down(x1, a1)
        x2 = RB(4 * c, dtype=self.dtype, name="ResidualBlock_2")(x2, a2, train)

        u1 = up(x2, a1, 2 * c)
        x1 = RB(2 * c, dtype=self.dtype, name="ResidualBlock_3")(
            jnp.concatenate([x1, u1], -1), a1, train)
        u0 = up(x1, active, c)
        x0 = RB(c, dtype=self.dtype, name="ResidualBlock_4")(
            jnp.concatenate([x0, u0], -1), active, train)
        return x0.astype(jnp.float32)


class SoftGroupOutput(NamedTuple):
    semantic_scores: jnp.ndarray   # [B*N, num_classes]
    pt_offsets: jnp.ndarray        # [B*N, 3]
    proposals: grouping_ops.Proposals
    instance: object


class SoftGroupNet(fnn.Module):
    """forward_train semantics of softgroup.py:113-150 on dense scene grids.

    Points in [0, 1]^3; ``scene_grid`` controls the voxel resolution.

    ``semantic_only`` builds only the backbone + point-wise heads
    (softgroup.py:24,72-77,93 — the instance branch is not even constructed,
    so a stage-1 checkpoint contains exactly the stage-2-shared params).

    ``x4_split=True`` at call time reproduces the S3DIS eval protocol
    (softgroup.py:380-411): the scene's points are split into the 4
    interleaved subsets [p::4], the backbone runs on them as a batch of 4
    (each part voxelised into its own grid, like the reference's per-piece
    voxelization in s3dis.py:transform_test), the point features are
    re-interleaved, and grouping + instance head see the full merged scene.
    TPU-native deviation: the parts run as ONE batched forward instead of a
    python loop of batch-1 forwards — same math, one compile.  The
    reference's per-piece min-shift of voxel coords is a no-op here (points
    already live in the unit cube).
    """

    cfg: Config
    scene_grid: int = 64
    channels: int = 32
    # bf16 backbone compute: unlike the ABC family's index-bound edge path,
    # the scene cost is dense-conv FLOPs + HBM over [B, G^3, C] grids, where
    # half precision pays directly.  Off by default pending a convergence A/B.
    compute_bf16: bool = False
    semantic_only: bool = False
    # Remat the U-Net residual blocks (drops stored [B, G^3, C] activations;
    # lifts the B=4 OOM ceiling at the cost of one extra block forward).
    remat: bool = False

    def _backbone(self, xyz, feats, train: bool):
        """Voxelise + U-Net + v2p gather -> per-point features [B*N, C]."""
        b, n, in_c = feats.shape
        g = self.scene_grid
        g3 = g * g * g

        # scene voxelisation: point -> voxel scatter-mean (voxelize_fp mode 4)
        vox = jnp.clip((xyz * g).astype(jnp.int32), 0, g - 1)
        vid = (vox[..., 0] * g + vox[..., 1]) * g + vox[..., 2]    # [B, N]
        bid = jnp.arange(b, dtype=jnp.int32)[:, None]
        flat_vid = (bid * g3 + vid).reshape(-1)
        vfeats = seg.segment_mean(feats.reshape(b * n, in_c), flat_vid, b * g3)
        vcount = seg.segment_count(flat_vid, b * g3)
        active = (vcount > 0).reshape(b, g, g, g)

        h = fnn.Dense(self.channels, use_bias=False,
                      name="input_conv")(vfeats)
        h = h.reshape(b, g, g, g, self.channels) * active[..., None]
        h = SceneUNet(self.channels,
                      dtype=jnp.bfloat16 if self.compute_bf16 else None,
                      remat=self.remat, name="unet")(h, active, train)
        h = MaskedBatchNorm(name="output_layer")(h, train=train, active=active)
        h = fnn.relu(h) * active[..., None]
        vox_out = h.reshape(b * g3, self.channels)

        # voxel -> point (the v2p map of the reference input pipeline)
        return vox_out[flat_vid]                                   # [B*N, C]

    @fnn.compact
    def __call__(self, xyz, feats, train: bool = True,
                 rng: Optional[jax.Array] = None, x4_split: bool = False):
        cfg = self.cfg
        b, n, _ = feats.shape
        num_cls = cfg.num_primitives

        if x4_split:
            # [1, N] scene -> [4, N/4] interleaved parts (part p = pts [p::4],
            # softgroup.py:392-399 merge_4_parts inverse); backbone as B=4,
            # heads/grouping on the re-merged full scene.
            assert b == 1 and n % 4 == 0, "x4_split needs one scene, 4 | N"
            sp = lambda a: a.reshape(n // 4, 4, *a.shape[2:]).swapaxes(0, 1)
            pfeat = self._backbone(sp(xyz), sp(feats), train)
            pfeat = pfeat.reshape(4, n // 4, -1).swapaxes(0, 1).reshape(n, -1)
        else:
            pfeat = self._backbone(xyz, feats, train)

        semantic_scores = MLP(num_cls, hidden_features=self.channels,
                              name="semantic_linear")(pfeat)
        pt_offsets = MLP(3, hidden_features=self.channels,
                         name="offset_linear")(pfeat)

        if self.semantic_only:
            return SoftGroupOutput(semantic_scores, pt_offsets, None, None)

        shifted = xyz + pt_offsets.reshape(b, n, 3)
        if cfg.scene_soft_grouping:
            # Reference-faithful soft grouping (softgroup.py:412-481): one
            # clustering per non-ignored class over the soft subset
            # ``softmax(scores)[:, c] > score_thr`` — overlapping membership,
            # no HAIS (the vendored SoftGroup has none).
            proposals = grouping_ops.build_soft_proposals(
                jax.lax.stop_gradient(shifted).astype(jnp.float32),
                jax.lax.stop_gradient(
                    semantic_scores.reshape(b, n, num_cls)).astype(
                        jnp.float32),
                num_cls,
                cfg.grouping,
                max_proposals=cfg.instance_head.max_proposals)
        else:
            # ABC-style argmax partition (speed knob --scene_soft_grouping 0).
            # Plain radius ball query on the shifted coords — the affinity
            # gates are GCANet's addition and are meaningless here (the scene
            # path trains no embedding-similarity objective; a 0.989 cosine
            # gate on raw backbone features deletes every edge).
            import dataclasses

            cls_argmax = jnp.argmax(semantic_scores.reshape(b, n, num_cls), -1)
            gcfg = dataclasses.replace(cfg.grouping,
                                       similarity_threshold_inst=0.0,
                                       similarity_threshold_para=0.0)
            proposals = grouping_ops.build_proposals(
                jax.lax.stop_gradient(shifted).astype(jnp.float32),
                cls_argmax.astype(jnp.int32),
                jax.lax.stop_gradient(
                    pfeat.reshape(b, n, -1)).astype(jnp.float32),
                jnp.zeros((b, n, 22), jnp.float32),
                num_cls,
                gcfg,
                max_proposals=cfg.instance_head.max_proposals,
                using_set_aggr=(not train) and cfg.using_set_aggr)

        vx = vox_ops.clusters_voxelization(
            xyz.reshape(b * n, 3), pfeat,
            proposals.point_pid,
            num_proposals=cfg.instance_head.max_proposals,
            grid_size=cfg.instance_head.grid_size,
            rand_quantize=train, rng=rng)
        instance = InstanceHead(
            num_classes=num_cls,
            channels=vx.feats.shape[-1],
            grid_size=cfg.instance_head.grid_size,
            name="instance_head",
        )(vx.feats, vx.active, vx.entry_voxel, proposals.point_pid, train)

        return SoftGroupOutput(semantic_scores, pt_offsets, proposals, instance)
