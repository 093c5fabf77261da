"""Pre-norm transformer / ViT blocks (reference models/transformer.py).

Instantiated only in commented-out code on the reference's default path
(dgcnn-4.py:384-386) but part of the model-zoo surface.  Uses
``jax.nn.dot_product_attention`` so XLA lowers to the fused TPU attention
path.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as fnn
import jax
import jax.numpy as jnp


class FeedForward(fnn.Module):
    dim: int
    hidden_dim: int

    @fnn.compact
    def __call__(self, x):
        x = fnn.Dense(self.hidden_dim)(x)
        x = fnn.gelu(x)
        return fnn.Dense(self.dim)(x)


class Attention(fnn.Module):
    """transformer.py:36-76; note the reference scales by dim**-0.5 (the model
    dim, not head dim) — replicated for parity."""

    dim: int
    heads: int = 8
    dim_head: int = 64

    @fnn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None):
        b, n, _ = x.shape
        inner = self.heads * self.dim_head
        qkv = fnn.Dense(3 * inner, use_bias=False)(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(b, n, self.heads, self.dim_head)

        scale = self.dim ** -0.5
        # fold the non-standard scale in: fused attention applies dh**-0.5
        q = heads(q) * (scale * self.dim_head ** 0.5)
        attn_mask = None
        if mask is not None:
            m = mask[:, None, :] & mask[:, :, None]
            attn_mask = m[:, None, :, :]
        out = jax.nn.dot_product_attention(q, heads(k), heads(v), mask=attn_mask)
        return fnn.Dense(self.dim)(out.reshape(b, n, inner))


class Transformer(fnn.Module):
    """transformer.py:78-91: depth x (prenorm attn + prenorm FF, residual)."""

    dim: int
    depth: int
    heads: int
    dim_head: int
    mlp_dim: int

    @fnn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None):
        for _ in range(self.depth):
            x = x + Attention(self.dim, self.heads, self.dim_head)(
                fnn.LayerNorm()(x), mask)
            x = x + FeedForward(self.dim, self.mlp_dim)(fnn.LayerNorm()(x))
        return x


class ViT(fnn.Module):
    """transformer.py:93-136."""

    image_size: int
    patch_size: int
    num_classes: int
    dim: int
    depth: int
    heads: int
    mlp_dim: int
    pool: str = "cls"
    channels: int = 3
    dim_head: int = 64

    @fnn.compact
    def __call__(self, img):
        p = self.patch_size
        b, c, h, w = img.shape
        x = img.reshape(b, c, h // p, p, w // p, p)
        x = x.transpose(0, 2, 4, 3, 5, 1).reshape(b, (h // p) * (w // p), -1)
        x = fnn.Dense(self.dim)(x)
        n = x.shape[1]

        cls_token = self.param("cls_token", fnn.initializers.normal(1.0),
                               (1, 1, self.dim))
        pos = self.param("pos_embedding", fnn.initializers.normal(1.0),
                         (1, n + 1, self.dim))
        x = jnp.concatenate([jnp.broadcast_to(cls_token, (b, 1, self.dim)), x], 1)
        x = x + pos[:, :n + 1]
        x = Transformer(self.dim, self.depth, self.heads, self.dim_head,
                        self.mlp_dim)(x)
        x = x.mean(1) if self.pool == "mean" else x[:, 0]
        return fnn.Dense(self.num_classes)(fnn.LayerNorm()(x))
