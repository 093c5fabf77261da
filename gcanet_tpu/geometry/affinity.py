"""Geometric-consistency affinity construction + spectral helpers.

The "geometric consistency" machinery named in the paper title (HPNet
heritage; reference utils/abc_utils.py).  Not on the default forward path
(grouping replaced it — SURVEY.md §3.5) but part of the framework surface:
  * ``construction_affinity_matrix_type``   (abc_utils.py:218-304): per
    predicted type, analytic point-to-primitive distance (or a sampled-spline
    chamfer) -> Gaussian affinity -> D^-1/2 sym-normalisation.
  * ``construction_affinity_matrix_normal`` (abc_utils.py:427-490): kNN
    normal-angle affinity; the pykdtree query becomes the on-device kNN.
  * ``mean_shift`` (abc_utils.py:16-31): host sklearn, per batch item.
  * ``compute_entropy`` (abc_utils.py:492-547) vectorised (no 1000-pt chunking
    needed on TPU).
  * ``map_type_gt`` (abc_utils.py:9-14).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from gcanet_tpu.geometry import primitive_dis as pdis
from gcanet_tpu.ops import knn as knn_ops

PARAM_SLICES = {5: (0, 4), 1: (4, 8), 4: (8, 15), 3: (15, 22)}


def map_type_gt(t):
    t = jnp.where((t == 0) | (t == 6) | (t == 7), 9, t)
    return jnp.where(t == 8, 2, t)


def _sym_normalize(affinity):
    """exp already applied; D^-1/2 A D^-1/2 then symmetrise (abc_utils.py:296-302)."""
    d = jnp.sum(affinity, -1)
    dinv = 1.0 / jnp.sqrt(jnp.maximum(d, 1e-12))
    aff = affinity * dinv[..., :, None] * dinv[..., None, :]
    mask = (aff > 0).astype(aff.dtype)
    return (aff + jnp.swapaxes(aff, -1, -2)) / jnp.clip(
        mask + jnp.swapaxes(mask, -1, -2), 1.0, 2.0)


def construction_affinity_matrix_type(inputs_xyz, type_per_point, t_param_pred,
                                      sigma: float = 1.0, min_points: int = 30,
                                      spline_samples=None):
    """inputs_xyz [B, N, 3]; type_per_point [B, N, C] or [B, N]; params [B, N, 22].

    For analytic types (plane/sphere/cylinder/cone) each column j of the
    distance matrix is the distance of every point to point-j's predicted
    primitive.  Spline types need sampled surfaces: pass
    ``spline_samples = {2: [B, M, 3], 9: [B, M, 3]}`` (from SplineNet) or the
    columns stay background (matching the reference's try/except-skip).
    """
    if type_per_point.ndim == 3:
        t_pred = map_type_gt(jnp.argmax(type_per_point, -1))
    else:
        t_pred = map_type_gt(type_per_point)
    b, n = t_pred.shape

    dist = jnp.full((b, n, n), -1.0, jnp.float32)
    for typ, (lo, hi) in PARAM_SLICES.items():
        routine = pdis.ROUTINES[typ]

        def per_item(xyz, params, tp):
            d = routine(xyz, params[:, lo:hi])                 # [N, M=N]
            return d

        d_all = jax.vmap(per_item)(inputs_xyz, t_param_pred, t_pred)
        col_is_type = (t_pred == typ)
        counts = jnp.sum(col_is_type, -1)
        use = col_is_type & (counts >= min_points)[:, None]
        dist = jnp.where(use[:, None, :], d_all, dist)

    if spline_samples:
        for typ, samples in spline_samples.items():
            def per_item(xyz, smp):
                return pdis.distance_from_bspline(xyz, smp)    # [N]
            d_col = jax.vmap(per_item)(inputs_xyz, samples)    # [B, N]
            col_is_type = (t_pred == typ)
            counts = jnp.sum(col_is_type, -1)
            use = col_is_type & (counts >= min_points)[:, None]
            dist = jnp.where(use[:, None, :], d_col[:, :, None], dist)

    background = dist == -1.0
    aff = jnp.exp(-dist**2 / (2 * sigma * sigma))
    aff = jnp.where(background, 1e-12, aff)
    return _sym_normalize(aff)


def construction_affinity_matrix_normal(inputs_xyz, normals, sigma: float = 0.1,
                                        knn: int = 50):
    """abc_utils.py:427-490 with the kNN on device. [B, N, 3] x2 -> [B, N, N]."""
    b, n, _ = inputs_xyz.shape
    idx = knn_ops.knn_indices(inputs_xyz, knn)                 # [B, N, K]
    n_sub = knn_ops.gather_neighbors(normals, idx)             # [B, N, K, 3]
    ang = jnp.arccos(jnp.clip(jnp.sum(normals[:, :, None, :] * n_sub, -1),
                              -0.99, 0.99))
    dst = jnp.exp(-ang**2 / (2 * sigma * sigma))               # [B, N, K]

    aff = jnp.zeros((b, n, n), jnp.float32)
    bi = jnp.arange(b)[:, None, None]
    ri = jnp.arange(n)[None, :, None]
    aff = aff.at[bi, ri, idx].add(dst)
    aff = jnp.where(aff == 0, 1e-12, aff)
    aff = _sym_normalize(aff)

    # second normalisation pass of abc_utils.py:475-487
    eye = jnp.eye(n, dtype=bool)
    adj = jnp.where(eye, 0.0, aff)
    lo, hi = jnp.min(adj), jnp.max(adj)
    adj = (adj - lo) / jnp.maximum(hi - lo, 1e-12)
    adj = jnp.exp(-adj**2 / 2.0)
    return jnp.where(eye, 0.0, adj)


def mean_shift(x: np.ndarray, bandwidth: float) -> np.ndarray:
    """Host-side sklearn MeanShift per item (abc_utils.py:16-31). x [B, N, F]."""
    from sklearn.cluster import MeanShift

    b, n, _ = x.shape
    out = np.zeros((b, n), np.int64)
    ms = MeanShift(bandwidth=bandwidth, bin_seeding=False, n_jobs=8)
    for i in range(b):
        ms.fit(x[i])
        out[i] = ms.labels_
    return out


def compute_entropy(features: jnp.ndarray) -> jnp.ndarray:
    """abc_utils.py:492-547 vectorised. features [1, N, K] -> scalar."""
    feat = features[0]
    n, k = feat.shape
    diff = feat[:, None, :] - feat[None, :, :]
    interval = jnp.max(diff.reshape(-1, k), 0) - jnp.min(diff.reshape(-1, k), 0)
    dst = jnp.sqrt(jnp.clip(jnp.sum((diff / interval) ** 2, -1), min=1e-24))
    average_dst = jnp.sum(dst) / (n * n)
    alpha = -jnp.log(0.5) / average_dst
    s = jnp.exp(-alpha * dst)
    eps = 1e-7
    entropy = -s * jnp.log(s + eps) - (1 - s) * jnp.log(1 - s + eps)
    return jnp.sum(entropy) / (n * n)
