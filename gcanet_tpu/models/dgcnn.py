"""DGCNN edge-conv encoder (reference: dgcnn-hais-concat-direct-4.py:455-534).

Channels-last, fixed shapes, all three edge convolutions fused into one jit
region.  The neighbour search of the first layer (position-normal metric,
dgcnn-4.py:493) is shared with the embedding head's normal-angle feature
(dgcnn-4.py:691) by the caller.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as fnn
import jax.numpy as jnp

from gcanet_tpu.models.layers import ConvGNAct, DenseGN
from gcanet_tpu.ops import knn as knn_ops


class EdgeConv(fnn.Module):
    """One DGCNN edge conv: edge features -> 1x1 conv -> GN -> LeakyReLU -> max_k.

    The conv over ``[x_j - x_i ; x_i]`` is computed in decomposed form
    ``gather(x @ W1) + x @ (W2 - W1)`` — numerically identical (same [2C, Co]
    kernel, split) but the [B, N, K, 2C] edge tensor is never materialised:
    the per-neighbour matmul happens on [B, N, C] before the gather.
    """

    features: int
    groups: int
    k: int
    knn_impl: str = "xla"
    compute_bf16: bool = False
    edge_backward: str = "scatter"

    @fnn.compact
    def __call__(self, x, idx: Optional[jnp.ndarray] = None):
        if idx is None:
            idx = knn_ops.knn_indices(x, self.k, self.knn_impl)
        c_in = x.shape[-1]
        kernel = self.param("kernel", fnn.initializers.lecun_normal(),
                            (2 * c_in, self.features))
        w1, w2 = kernel[:c_in], kernel[c_in:]
        # compute_bf16: the [B, N, K, C] edge tensor (and its cotangent) is
        # HBM-traffic-bound; bf16 halves every elementwise/norm pass over it.
        # GroupNorm stats stay fp32 (flax computes half-precision stats in
        # fp32); the [B, N, C] output is cast back to fp32 for consumers.
        dt = jnp.bfloat16 if self.compute_bf16 else x.dtype
        a = jnp.einsum("bni,io->bno", x, w1).astype(dt)
        c = jnp.einsum("bni,io->bno", x, w2 - w1).astype(dt)
        h = knn_ops.gather_neighbors_impl(a, idx, self.edge_backward) \
            + c[:, :, None, :]
        h = fnn.GroupNorm(num_groups=self.groups, epsilon=1e-5,
                          dtype=dt if self.compute_bf16 else None)(h)
        h = fnn.leaky_relu(h, negative_slope=0.2)
        return jnp.max(h, axis=2).astype(x.dtype)            # [B, N, C']


class DGCNNEncoderGn(fnn.Module):
    """dgcnn-4.py:455-534; returns 1280-d per-point features.

    mode==5 consumes ``[B, N, 6]`` (xyz ++ normal) and uses the
    position-normal metric for the first neighbourhood.
    """

    mode: int = 5
    nn_nb: int = 80
    knn_impl: str = "xla"
    remat: bool = False
    compute_bf16: bool = False
    # "scatter" (exact XLA scatter-add VJP) or "revgather:M" — see
    # ops/knn.py::gather_neighbors_rev.  Applies to the 2nd/3rd edge convs
    # (the 1st gathers the non-differentiated input, so it has no scatter).
    edge_backward: str = "scatter"
    # Reuse the layer-1 (position-normal) graph for all three edge convs
    # instead of recomputing feature-space kNN per layer (the reference's
    # dynamic-graph semantics, dgcnn-4.py:497-503).  Saves two kNN searches
    # per step but REJECTED as a default — convergence degrades 3/3 A/B runs
    # (BASELINE.md 2026-08-19); kept as an opt-in speed/accuracy trade.
    shared_graph: bool = False
    # Graph degree for edge convs 2-3 (0 = nn_nb).  Neighbour lists are
    # nearest-first (top-k by -distance), so with shared_graph the layer-1
    # graph is sliced to its nearest nn_nb_inner entries; with per-layer
    # graphs the inner kNN simply runs at the lower k.
    nn_nb_inner: int = 0

    @fnn.compact
    def __call__(self, x, idx1: Optional[jnp.ndarray] = None,
                 nbr1: Optional[jnp.ndarray] = None):
        b, n, _ = x.shape
        k = self.nn_nb

        if idx1 is None:
            if self.mode == 5:
                idx1 = knn_ops.knn_points_normals_indices(x, k, self.knn_impl)
            else:
                idx1 = knn_ops.knn_indices(x, k, self.knn_impl)
        if nbr1 is None:
            nbr1 = knn_ops.gather_neighbors(x, idx1)
        ef = knn_ops.edge_feature_from_gathered(x, nbr1)
        Conv1 = fnn.remat(ConvGNAct) if self.remat else ConvGNAct
        # explicit names: lifted transforms auto-name as Checkpoint<Class>_N,
        # which would silently fork the param tree between remat on/off
        ef = Conv1(64, 2, dtype=jnp.bfloat16 if self.compute_bf16 else None,
                   name="ConvGNAct_0")(ef)
        x1 = jnp.max(ef, axis=2).astype(x.dtype)

        # optional remat: [B, N, K, C] edge tensors recomputed in the backward
        # pass instead of stored — gigabytes of activation memory for ~2x
        # step time; see Config.remat
        EC = fnn.remat(EdgeConv, static_argnums=()) if self.remat else EdgeConv
        # clamped to k: the knob only ever LOWERS the inner degree, so tiny
        # test/dryrun configs (nn_nb < the production default) are unaffected
        k2 = min(self.nn_nb_inner, k) if self.nn_nb_inner else k
        idx_shared = idx1[..., :k2] if self.shared_graph else None
        x2 = EC(64, 2, k2, self.knn_impl, self.compute_bf16,
                self.edge_backward, name="EdgeConv_0")(x1, idx_shared)
        x3 = EC(128, 2, k2, self.knn_impl, self.compute_bf16,
                self.edge_backward, name="EdgeConv_1")(x2, idx_shared)

        x_features = jnp.concatenate([x1, x2, x3], axis=-1)  # [B, N, 256]
        x4 = fnn.relu(DenseGN(1024, 8)(x_features))          # mlp1 + bnmlp1 (dgcnn-4.py:508)
        x4 = jnp.max(x4, axis=1, keepdims=True)              # global max over points
        x4 = jnp.broadcast_to(x4, (b, n, 1024))
        return jnp.concatenate([x4, x_features], axis=-1)    # [B, N, 1280]
