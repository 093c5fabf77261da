"""Proposal voxelisation for the instance head, plus a parity voxeliser.

Replaces:
  * ``clusters_voxelization`` (models/dgcnn-hais-concat-direct-4.py:1300-1355)
    — per-proposal rescale into a G^3 grid with optional random quantisation.
  * ``voxelize_idx`` / ``voxelize_fp`` (softgroup/ops/src/voxelize/voxelize.cpp:11-195)
    — hash-dedupe of integer coords + scatter-mean of features.  On TPU the
    dedupe is a linearised-coordinate segment reduction; no hash map needed.

The proposal membership comes in as the fixed-shape assignment channels
produced by :mod:`gcanet_tpu.ops.grouping` (channel 1 carries set-aggregation
absorptions, whose points the reference appends to the primary's CSR rows —
hierarchical_aggregation.cu:80-105).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gcanet_tpu.ops import segment as seg


class VoxelizedProposals(NamedTuple):
    """Dense per-proposal voxel grids and the entry->voxel map.

    feats:        [P, G^3, C]  scatter-mean features (zero at empty voxels)
    active:       [P, G^3]     bool occupancy
    entry_voxel:  [CH, B*N]    voxel id of each (channel, point) entry, -1 if
                               the entry is not in any proposal
    """

    feats: jnp.ndarray
    active: jnp.ndarray
    entry_voxel: jnp.ndarray


def clusters_voxelization(
    coords: jnp.ndarray,       # [B*N, 3] float xyz
    feats: jnp.ndarray,        # [B*N, C] point features
    point_pid: jnp.ndarray,    # [CH, B*N] proposal id per channel (-1 = none)
    num_proposals: int,
    grid_size: int,
    rand_quantize: bool = False,
    rng: jax.Array | None = None,
    scale: float | None = None,
) -> VoxelizedProposals:
    """dgcnn-4.py:1300-1355 semantics on dense fixed-shape grids.

    The reference clamps ``clusters_scale`` to ``scale`` (=64) with
    ``spatial_shape`` (=64); we keep the same rule with G in both roles unless
    ``scale`` is given.
    """
    ch, n_total = point_pid.shape
    g = grid_size
    g3 = g * g * g
    p = num_proposals
    if scale is None:
        scale = float(g)

    entry_pid = point_pid.reshape(-1)                      # [CH*B*N]
    entry_pt = jnp.tile(jnp.arange(n_total, dtype=jnp.int32), ch)
    entry_valid = entry_pid >= 0
    entry_coords = coords[entry_pt]                        # [E, 3]

    cmin = seg.segment_min(entry_coords, entry_pid, p)     # [P, 3]
    cmax = seg.segment_max(entry_coords, entry_pid, p)
    # clusters_scale = 1 / ((max-min)/G).max - 0.01, clamped to <= scale
    extent = jnp.max((cmax - cmin) / g, axis=1)
    clusters_scale = 1.0 / jnp.maximum(extent, 1e-12) - 0.01
    clusters_scale = jnp.minimum(clusters_scale, scale)    # [P]

    cmin = cmin * clusters_scale[:, None]
    cmax = cmax * clusters_scale[:, None]

    if rand_quantize:
        assert rng is not None
        # One rand(3) shared by every proposal, as in the reference
        # (torch.rand(3) at dgcnn-4.py:1341-1342).
        r1 = jax.random.uniform(rng, (2, 3))
        rng_range = cmax - cmin
        cmin = cmin - jnp.clip(g - rng_range - 0.001, 0.0, None) * r1[0]
        cmin = cmin - jnp.clip(g - rng_range + 0.001, None, 0.0) * r1[1]

    e_scale = jnp.where(entry_valid, clusters_scale[jnp.clip(entry_pid, 0, p - 1)], 0.0)
    e_min = cmin[jnp.clip(entry_pid, 0, p - 1)]
    rel = entry_coords * e_scale[:, None] - e_min          # in [0, G)
    vox = jnp.clip(rel.astype(jnp.int32), 0, g - 1)
    voxel_id = (vox[:, 0] * g + vox[:, 1]) * g + vox[:, 2]
    voxel_id = jnp.where(entry_valid, voxel_id, -1)

    combined = jnp.where(entry_valid, entry_pid * g3 + voxel_id, -1)
    entry_feats = feats[entry_pt]
    vfeats = seg.segment_mean(entry_feats, combined, p * g3)
    vcount = seg.segment_count(combined, p * g3)

    return VoxelizedProposals(
        feats=vfeats.reshape(p, g3, -1),
        active=(vcount > 0).reshape(p, g3),
        entry_voxel=voxel_id.reshape(ch, n_total),
    )


def voxelization_idx(coords: jnp.ndarray, max_voxels: int):
    """Parity op for softgroup voxelize_idx (voxelize.cpp:11-96, mode=4).

    ``coords [M, 4]`` int (batch, x, y, z) -> (out_coords [V,4], p2v [M], v2p
    validity) with V = ``max_voxels`` static.  Voxel order follows first
    occurrence, matching the reference's insertion-order hash map.
    """
    m = coords.shape[0]
    # lexicographic sort over the 4 columns (int64 bit-packing would silently
    # truncate under JAX's default x64-disabled mode)
    c = coords.astype(jnp.int32)
    order = jnp.lexsort((c[:, 3], c[:, 2], c[:, 1], c[:, 0]))
    sc = c[order]
    first = jnp.concatenate([
        jnp.array([True]),
        jnp.any(sc[1:] != sc[:-1], axis=1)])
    # voxel rank by first-occurrence position
    occ_pos = jnp.where(first, order, m)
    grp = jnp.cumsum(first.astype(jnp.int32)) - 1          # group per sorted row
    first_pos_per_grp = jax.ops.segment_min(occ_pos, grp, num_segments=max_voxels)
    rank_of_grp = jnp.argsort(jnp.argsort(first_pos_per_grp))
    p2v_sorted = rank_of_grp[grp]
    p2v = jnp.zeros((m,), jnp.int32).at[order].set(p2v_sorted.astype(jnp.int32))
    out_coords = jnp.zeros((max_voxels, coords.shape[1]), coords.dtype)
    out_coords = out_coords.at[p2v].set(coords)
    num_voxels = jnp.sum(first.astype(jnp.int32))
    return out_coords, p2v, num_voxels


def voxelize_mean(feats: jnp.ndarray, p2v: jnp.ndarray, max_voxels: int):
    """voxelize_fp mode=4 (scatter mean); differentiable via segment ops."""
    return seg.segment_mean(feats, p2v, max_voxels)
