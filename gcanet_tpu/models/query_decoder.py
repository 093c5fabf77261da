"""Mask2Former-style learned-query decoder (reference models/query_decoder.py).

Not imported by the reference's default path (SURVEY.md §2.2) but part of the
model surface, paired with the Hungarian criterion in
:mod:`gcanet_tpu.losses.mask2former`.  TPU-native shape discipline: the
reference loops over batch items with variable point counts; here points are
a fixed ``[B, N, C]`` grid so the cross attention is one fused batched call.
"""

from __future__ import annotations

from typing import Dict, List

import flax.linen as fnn
import jax
import jax.numpy as jnp


class CrossAttentionLayer(fnn.Module):
    """query_decoder.py:5-45: queries attend to per-item point features."""

    d_model: int = 256
    nhead: int = 8

    @fnn.compact
    def __call__(self, source, query, attn_mask=None, pe=None):
        # source [B, N, D]; query [B, Q, D]; attn_mask [B, Q, N] True = blocked
        q_in = query if pe is None else query + pe
        b, qn, _ = q_in.shape
        dh = self.d_model // self.nhead

        def split(t):
            return t.reshape(b, t.shape[1], self.nhead, dh)

        q = split(fnn.Dense(self.d_model)(q_in))
        k = split(fnn.Dense(self.d_model)(source))
        v = split(fnn.Dense(self.d_model)(source))
        mask = None if attn_mask is None else ~attn_mask[:, None, :, :]
        out = jax.nn.dot_product_attention(q, k, v, mask=mask)
        out = fnn.Dense(self.d_model)(out.reshape(b, qn, self.d_model))
        # reference: residual add; the norm result is discarded (bug kept:
        # query_decoder.py:40-42 calls norm without assignment)
        return out + query


class SelfAttentionLayer(fnn.Module):
    d_model: int = 256
    nhead: int = 8

    @fnn.compact
    def __call__(self, x, pe=None):
        q_in = x if pe is None else x + pe
        b, n, _ = x.shape
        dh = self.d_model // self.nhead

        def split(t):
            return t.reshape(b, n, self.nhead, dh)

        q = split(fnn.Dense(self.d_model)(q_in))
        k = split(fnn.Dense(self.d_model)(q_in))
        v = split(fnn.Dense(self.d_model)(x))
        out = jax.nn.dot_product_attention(q, k, v)
        out = fnn.Dense(self.d_model)(out.reshape(b, n, self.d_model))
        return fnn.LayerNorm()(out + x)


class FFN(fnn.Module):
    d_model: int
    hidden_dim: int

    @fnn.compact
    def __call__(self, x):
        h = fnn.Dense(self.hidden_dim)(x)
        h = fnn.relu(h)
        h = fnn.Dense(self.d_model)(h)
        return fnn.LayerNorm()(h + x)


class QueryDecoder(fnn.Module):
    """query_decoder.py:104-239 with iterative mask-guided attention."""

    num_layer: int = 6
    num_query: int = 100
    num_class: int = 18
    in_channel: int = 32
    d_model: int = 256
    nhead: int = 8
    hidden_dim: int = 1024
    iter_pred: bool = True
    attn_mask: bool = True
    use_pe: bool = False

    def _heads(self):
        def head(out):
            return fnn.Sequential([fnn.Dense(self.d_model), fnn.relu,
                                   fnn.Dense(out)])
        return head

    @fnn.compact
    def __call__(self, x: jnp.ndarray) -> Dict:
        """x [B, N, in_channel] point features -> prediction dict."""
        b, n, _ = x.shape
        inst_feats = fnn.Sequential([
            fnn.Dense(self.d_model), fnn.LayerNorm(), fnn.relu])(x)
        mask_feats = fnn.Sequential([
            fnn.Dense(self.d_model), fnn.relu, fnn.Dense(self.d_model)])(x)

        query0 = self.param("query", fnn.initializers.normal(1.0),
                            (self.num_query, self.d_model))
        query = jnp.broadcast_to(query0[None], (b, self.num_query, self.d_model))
        pe = None
        if self.use_pe:
            pe0 = self.param("pe", fnn.initializers.normal(1.0),
                             (self.num_query, self.d_model))
            pe = jnp.broadcast_to(pe0[None], (b, self.num_query, self.d_model))

        out_norm = fnn.LayerNorm()
        head = self._heads()
        out_cls = head(self.num_class)
        out_score = head(1)
        out_paras = head(22)

        def predict(q):
            qn = out_norm(q)
            masks = jnp.einsum("bqd,bnd->bqn", qn, mask_feats)
            am = None
            if self.attn_mask:
                am = jax.nn.sigmoid(masks) < 0.5
                empty = jnp.all(am, axis=-1, keepdims=True)
                am = jnp.where(empty, False, am)
                am = jax.lax.stop_gradient(am)
            return (out_cls(qn), out_score(qn), masks, out_paras(qn), am)

        aux: List[Dict] = []
        labels, scores, masks, paras, am = predict(query)
        for i in range(self.num_layer):
            if self.iter_pred:
                aux.append({"labels": labels, "masks": masks,
                            "scores": scores, "parameters": paras})
            query = CrossAttentionLayer(self.d_model, self.nhead)(
                inst_feats, query, am if self.iter_pred else None, pe)
            query = SelfAttentionLayer(self.d_model, self.nhead)(query, pe)
            query = FFN(self.d_model, self.hidden_dim)(query)
            labels, scores, masks, paras, am = predict(query)

        return {"labels": labels, "masks": masks, "scores": scores,
                "parameters": paras, "aux_outputs": aux}
