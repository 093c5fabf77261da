"""Soft-projection block (SampleNet): differentiable soft nearest neighbours.

Reference: models/search_knn.py:44-175 (``SoftProjection``).  The reference
vendors this alongside ``knn_point``/``group_points`` (the only two symbols
its models import); the block itself completes the search_knn API surface.

Semantics (search_knn.py:98-175): for each query point find its ``group_size``
nearest neighbours in the database cloud, form softmax weights over
``-||q - n||^2 / sigma`` with ``sigma = max(temperature^2, min_sigma)``
(search_knn.py:121-123), and return the weighted average of the neighbour
positions (``project``), of their features (``propagate``), or both
(``project_and_propagate``).

TPU-native notes: channels-last ``[B, N, 3]`` / ``[B, N, F]`` layout (the
reference is channels-first torch); the kNN is the shared MXU distance-matrix
top-k (ops/pointnet2.knn_point) instead of KNN_CUDA; the temperature is a
flax param (trainable exactly like the reference's ``nn.Parameter`` —
freezing it is an optimizer-mask concern, search_knn.py:73-80).
"""

from __future__ import annotations

import flax.linen as fnn
import jax.numpy as jnp

from gcanet_tpu.ops.pointnet2 import group_points, knn_point


class SoftProjection(fnn.Module):
    group_size: int
    initial_temperature: float = 1.0
    min_sigma: float = 1e-4

    def setup(self):
        self.temperature = self.param(
            "temperature",
            lambda rng: jnp.asarray(self.initial_temperature, jnp.float32))

    def sigma(self) -> jnp.ndarray:
        # search_knn.py:121-123
        return jnp.maximum(self.temperature ** 2,
                           jnp.asarray(self.min_sigma, jnp.float32))

    def _weights(self, point_cloud, query_cloud):
        """Soft-NN weights [B, Q, K] and the neighbour idx [B, Q, K]."""
        _, idx = knn_point(self.group_size, point_cloud, query_cloud)
        grouped = group_points(point_cloud, idx)            # [B, Q, K, 3]
        d2 = jnp.sum((grouped - query_cloud[:, :, None, :]) ** 2, -1)
        w = fnn.softmax(-d2 / self.sigma(), axis=-1)        # search_knn.py:132-135
        return w, idx

    def project(self, point_cloud, query_cloud):
        w, idx = self._weights(point_cloud, query_cloud)
        return jnp.sum(group_points(point_cloud, idx) * w[..., None], axis=2)

    def propagate(self, point_cloud, point_features, query_cloud):
        w, idx = self._weights(point_cloud, query_cloud)
        return jnp.sum(group_points(point_features, idx) * w[..., None], axis=2)

    def project_and_propagate(self, point_cloud, point_features, query_cloud):
        w, idx = self._weights(point_cloud, query_cloud)
        proj = jnp.sum(group_points(point_cloud, idx) * w[..., None], axis=2)
        prop = jnp.sum(group_points(point_features, idx) * w[..., None], axis=2)
        return proj, prop

    def __call__(self, point_cloud, query_cloud, point_features=None,
                 action: str = "project"):
        if action == "project":
            return self.project(point_cloud, query_cloud)
        if action == "propagate":
            return self.propagate(point_cloud, point_features, query_cloud)
        if action == "project_and_propagate":
            return self.project_and_propagate(point_cloud, point_features,
                                              query_cloud)
        raise ValueError(
            "action should be one of the following: 'project', 'propagate', "
            "'project_and_propagate'")
