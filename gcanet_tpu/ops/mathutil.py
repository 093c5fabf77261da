"""Numerically-safe primitives.

``jnp.linalg.norm`` has a NaN gradient at exactly zero (unlike torch, which
special-cases the subgradient to 0).  Singleton embedding clusters and the
diagonal of center-distance matrices hit zero exactly, so every norm on a
differentiable path uses ``safe_norm``.
"""

import jax.numpy as jnp


def safe_norm(x, axis=-1, keepdims=False, eps=1e-12):
    """sqrt(sum(x^2)) with a zero (not NaN) gradient at x == 0."""
    sq = jnp.sum(x * x, axis=axis, keepdims=keepdims)
    return jnp.sqrt(jnp.maximum(sq, eps * eps))


def safe_unit(x, axis=-1, eps=1e-12):
    """x / ||x|| with torch-like behaviour near zero."""
    return x / (safe_norm(x, axis=axis, keepdims=True, eps=eps) + eps)
