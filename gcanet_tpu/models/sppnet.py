"""SPPNet — the HPNet-style baseline model (reference models/sppnet.py).

Embedding/type/param/normal heads on the DGCNN encoder, no grouping head.
The reference subsamples 7000 points inside forward (sppnet.py:283-297); here
the caller passes fixed-size clouds (the pipeline already subsamples), with an
optional ``subsample`` for parity with the in-forward shuffle.
Selectable via ``--model_dict gcanet_tpu.models.sppnet``.
"""

from __future__ import annotations

from typing import NamedTuple

import flax.linen as fnn
import jax.numpy as jnp

from gcanet_tpu.config import Config
from gcanet_tpu.models.dgcnn import DGCNNEncoderGn
from gcanet_tpu.models.layers import DenseGN
from gcanet_tpu.models.primitive_net import canonicalize_params
from gcanet_tpu.ops.mathutil import safe_norm


class SPPNetOutput(NamedTuple):
    embedding: jnp.ndarray        # [B, N, emb]
    type_per_point: jnp.ndarray   # [B, N, num_primitives]
    normal_per_point: jnp.ndarray  # [B, N, 3] (mode 5)
    param_per_point: jnp.ndarray  # [B, N, 22]


class PrimitiveNetSPP(fnn.Module):
    """sppnet.py:228-349 (mode 5: xyz+normal input, predicts normals too)."""

    cfg: Config
    num_primitives: int = 10
    emb_size: int = 50

    @fnn.compact
    def __call__(self, xyz, normals, train: bool = True):
        cfg = self.cfg
        points = jnp.concatenate([xyz, normals], axis=-1)

        feats = DGCNNEncoderGn(mode=5, nn_nb=cfg.nn_nb,
                               knn_impl=cfg.knn_impl)(points)   # [B, N, 1280]
        x = fnn.relu(DenseGN(512, 8)(feats))
        x_all = fnn.relu(DenseGN(256, 4)(x))

        h = fnn.relu(DenseGN(256, 4)(x_all))
        embedding = fnn.Dense(self.emb_size)(h)

        h = fnn.relu(DenseGN(256, 4)(x_all))
        type_logits = fnn.Dense(self.num_primitives)(h)
        if "r" in cfg.loss_class:
            type_per_point = fnn.log_softmax(type_logits, axis=-1)
        else:
            type_per_point = type_logits

        h = fnn.relu(DenseGN(256, 4)(x_all))
        nrm = fnn.Dense(3)(h)
        normal_per_point = nrm / (safe_norm(nrm, axis=-1, keepdims=True) + 1e-12)

        h = fnn.relu(DenseGN(256, 4)(x_all))
        param_per_point = canonicalize_params(fnn.Dense(22)(h))

        return SPPNetOutput(embedding, type_per_point, normal_per_point,
                            param_per_point)
