"""The flagship GCANet-class model, TPU-native.

Assembles encoder + heads + offset module + grouping + instance head,
replicating ``PrimitivesEmbeddingDGCNGn`` / ``PrimitiveNet``
(models/dgcnn-hais-concat-direct-4.py:537-1499) as one jit-compilable
function of fixed-shape tensors.  Differences from the reference are purely
representational (channels-last layout, assignment-channel proposals instead
of CSR, dense masked voxel grids instead of spconv) — the math is the same.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import flax.linen as fnn
import jax
import jax.numpy as jnp

from gcanet_tpu.config import Config
from gcanet_tpu.models.dgcnn import DGCNNEncoderGn
from gcanet_tpu.models.instance_head import InstanceHead, InstanceHeadOutput
from gcanet_tpu.models.layers import ConvGNAct, DenseGN, MLP
from gcanet_tpu.models.offset import OffsetPredModule
from gcanet_tpu.ops import grouping as grouping_ops
from gcanet_tpu.ops import knn as knn_ops
from gcanet_tpu.ops import voxelize as vox_ops
from gcanet_tpu.ops.mathutil import safe_norm


class ModelOutput(NamedTuple):
    type_per_point: jnp.ndarray     # [B, N, cls] (log-softmax when 'r' in loss_class)
    param_per_point: jnp.ndarray    # [B, N, 22] canonicalised primitive params
    normal_per_point: jnp.ndarray   # [B, N, 3] (mode 3 only; zeros otherwise)
    semantic_scores: jnp.ndarray    # [B*N, cls] raw logits for grouping
    pt_offsets: jnp.ndarray         # [B*N, 3]
    embedding: jnp.ndarray          # [B, N, emb] "output_feats"
    proposals: grouping_ops.Proposals
    instance: InstanceHeadOutput


def canonicalize_params(raw: jnp.ndarray) -> jnp.ndarray:
    """Per-type parameter canonicalisation (dgcnn-4.py:663-676).

    Layout: sphere [0:4], plane [4:8] (normal normalised), cylinder [8:15]
    (axis normalised), cone [15:22] (axis normalised).
    """
    def unit(v):
        return v / (safe_norm(v, axis=-1, keepdims=True) + 1e-12)

    sphere = raw[..., 0:4]
    plane = jnp.concatenate([unit(raw[..., 4:7]), raw[..., 7:8]], axis=-1)
    cyl = jnp.concatenate([unit(raw[..., 8:11]), raw[..., 11:15]], axis=-1)
    cone = jnp.concatenate([unit(raw[..., 15:18]), raw[..., 18:22]], axis=-1)
    return jnp.concatenate([sphere, plane, cyl, cone], axis=-1)


class PrimitiveNet(fnn.Module):
    """Top-level model; ``apply`` with ``train=True/False`` selects the path."""

    cfg: Config

    @fnn.compact
    def __call__(self, xyz, normals, train: bool = True,
                 rng: Optional[jax.Array] = None):
        cfg = self.cfg
        b, n, _ = xyz.shape
        num_cls = cfg.num_primitives
        mode = cfg.mode

        points = jnp.concatenate([xyz, normals], axis=-1) if mode == 5 else xyz

        # --- shared neighbour index: encoder layer 1 & embedding normal feature ---
        if mode == 5:
            idx1 = knn_ops.knn_points_normals_indices(points, cfg.nn_nb, cfg.knn_impl)
        else:
            idx1 = knn_ops.knn_indices(points, cfg.nn_nb, cfg.knn_impl)

        nbr1 = knn_ops.gather_neighbors(points, idx1)   # shared: layer 1 + normals_g
        feats = DGCNNEncoderGn(mode=mode, nn_nb=cfg.nn_nb, knn_impl=cfg.knn_impl,
                               remat=cfg.remat,
                               compute_bf16=cfg.encoder_bf16,
                               edge_backward=cfg.edge_backward,
                               shared_graph=cfg.shared_graph,
                               nn_nb_inner=cfg.nn_nb_inner)(points, idx1, nbr1)  # [B, N, 1280]

        # trunk (dgcnn-4.py:644-645): conv1 1280->512 GN8, conv2 512->256 GN4
        x = fnn.relu(DenseGN(512, 8)(feats))
        x_all = fnn.relu(DenseGN(256, 4)(x))

        # type head (dgcnn-4.py:650-657)
        x_type = fnn.relu(DenseGN(256, 4)(x_all))
        type_logits = fnn.Dense(num_cls)(x_type)
        if "r" in cfg.loss_class:
            type_per_point = fnn.log_softmax(type_logits, axis=-1)
        else:
            type_per_point = type_logits
        semantic_scores = type_logits.reshape(b * n, num_cls)

        # param head (dgcnn-4.py:660-676)
        x_para = fnn.relu(DenseGN(256, 4)(x_all))
        param_per_point = canonicalize_params(fnn.Dense(22)(x_para))

        # normal head (mode 3, dgcnn-4.py:682-688)
        if mode == 3:
            x_nrm = fnn.relu(DenseGN(256, 4)(x_all))
            nrm = fnn.Dense(3)(x_nrm)
            normal_per_point = nrm / (safe_norm(nrm, axis=-1, keepdims=True) + 1e-12)
            points6 = jnp.concatenate([points, normal_per_point], axis=-1)
            idx_emb = knn_ops.knn_points_normals_indices(points6, cfg.nn_nb, cfg.knn_impl)
        else:
            normal_per_point = jnp.zeros((b, n, 3), xyz.dtype)
            points6 = points
            idx_emb = idx1                               # same metric, same input

        # embedding head (dgcnn-4.py:690-699); reuse the shared gather when the
        # source/metric coincide (mode 5: points6 == points, idx_emb == idx1)
        if mode == 3:
            nf = knn_ops.edge_feature_normals_g(points6, idx_emb)
        else:
            nf = knn_ops.edge_feature_normals_g_from_gathered(points6, nbr1)
        nf = (fnn.remat(ConvGNAct) if cfg.remat else ConvGNAct)(
            64, 2, dtype=jnp.bfloat16 if cfg.encoder_bf16 else None,
            name="ConvGNAct_0")(nf)
        normal_feature = jnp.max(nf, axis=2).astype(x_all.dtype)  # [B, N, 64]
        emb_in = jnp.concatenate([x_all, x_type, x_para, normal_feature], axis=-1)  # 832
        h = fnn.relu(DenseGN(256, 4)(emb_in))
        embedding = fnn.Dense(cfg.out_dim)(h)                     # [B, N, emb]

        # offset module input (dgcnn-4.py:710-716): conv3 (256+in_ch)->128 GN4
        opc = jnp.concatenate([x_all, points6], axis=-1)
        opc = fnn.relu(DenseGN(128, 4)(opc))
        if not cfg.ablation:
            if cfg.offset_variant == "dual":
                # dgcnn-hais-concat-direct-2 variant (dgcnn-2.py:739-741):
                # passes the type head's raw logits as the semantic feature
                from gcanet_tpu.models.offset_dual import OffsetPredModuleDual

                pt_offsets = OffsetPredModuleDual(60, cfg.offset_keypoints)(
                    xyz, opc, type_logits, embedding)
            else:
                OPM = fnn.remat(OffsetPredModule) if cfg.remat else OffsetPredModule
                pt_offsets = OPM(cfg.offset_knn, cfg.offset_keypoints,
                                 name="OffsetPredModule_0")(
                    xyz, opc, embedding)                          # [B, N, 3]
        else:
            pt_offsets = MLP(3, hidden_features=128)(opc)         # offset_linear
        pt_offsets_flat = pt_offsets.reshape(b * n, 3)

        # --- grouping (dgcnn-4.py:1122-1295) ---
        cls_argmax = jnp.argmax(semantic_scores.reshape(b, n, num_cls), axis=-1)
        shifted = xyz + pt_offsets
        using_set_aggr = (not train) and cfg.using_set_aggr
        proposals = grouping_ops.build_proposals(
            jax.lax.stop_gradient(shifted).astype(jnp.float32),
            cls_argmax.astype(jnp.int32),
            jax.lax.stop_gradient(embedding).astype(jnp.float32),
            jax.lax.stop_gradient(param_per_point).astype(jnp.float32),
            num_cls, cfg.grouping,
            max_proposals=cfg.instance_head.max_proposals,
            using_set_aggr=using_set_aggr)

        # --- per-proposal voxelisation (dgcnn-4.py:1300-1355) ---
        coords_flat = xyz.reshape(b * n, 3)
        emb_flat = embedding.reshape(b * n, -1)
        vx = vox_ops.clusters_voxelization(
            coords_flat, emb_flat, proposals.point_pid,
            num_proposals=cfg.instance_head.max_proposals,
            grid_size=cfg.instance_head.grid_size,
            rand_quantize=train, rng=rng,
        )

        # --- instance head (dgcnn-4.py:1379-1392) ---
        instance = InstanceHead(
            num_classes=num_cls,
            channels=cfg.instance_head.channels,
            grid_size=cfg.instance_head.grid_size,
        )(vx.feats, vx.active, vx.entry_voxel, proposals.point_pid, train)

        return ModelOutput(
            type_per_point=type_per_point,
            param_per_point=param_per_point,
            normal_per_point=normal_per_point,
            semantic_scores=semantic_scores,
            pt_offsets=pt_offsets_flat,
            embedding=embedding,
            proposals=proposals,
            instance=instance,
        )
