"""Segment reductions over proposal/instance assignments.

TPU-native replacements for the reference CUDA kernels:
  * ``sec_min/sec_max/sec_mean`` (softgroup/ops/src/sec_mean/sec_mean.cu:13-93)
  * ``global_avg_pool``          (softgroup/ops/src/roipool/roipool.cu:12-71)

The reference represents proposals as a CSR (idx, offset) pair with dynamic
sizes; here membership is a per-element integer segment id (-1 = unassigned),
which keeps every shape static under jit.  ``jax.ops.segment_*`` lowers to
XLA scatter reductions which are efficient on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_BIG = 1e30


def _sanitize(seg_ids: jnp.ndarray, num_segments: int):
    """Map invalid ids (<0 or >= num_segments) to an overflow bucket."""
    valid = (seg_ids >= 0) & (seg_ids < num_segments)
    return jnp.where(valid, seg_ids, num_segments), valid


def segment_sum(data: jnp.ndarray, seg_ids: jnp.ndarray, num_segments: int) -> jnp.ndarray:
    ids, valid = _sanitize(seg_ids, num_segments)
    data = jnp.where(valid[..., None] if data.ndim > seg_ids.ndim else valid, data, 0)
    out = jax.ops.segment_sum(data, ids, num_segments=num_segments + 1)
    return out[:num_segments]


def segment_count(seg_ids: jnp.ndarray, num_segments: int) -> jnp.ndarray:
    ids, valid = _sanitize(seg_ids, num_segments)
    out = jax.ops.segment_sum(valid.astype(jnp.int32), ids, num_segments=num_segments + 1)
    return out[:num_segments]


def segment_mean(data: jnp.ndarray, seg_ids: jnp.ndarray, num_segments: int) -> jnp.ndarray:
    """Per-segment feature mean; zero for empty segments (roipool.cu semantics)."""
    s = segment_sum(data, seg_ids, num_segments)
    n = segment_count(seg_ids, num_segments)
    return s / jnp.maximum(n, 1)[:, None].astype(s.dtype)


def segment_min(data: jnp.ndarray, seg_ids: jnp.ndarray, num_segments: int) -> jnp.ndarray:
    ids, valid = _sanitize(seg_ids, num_segments)
    data = jnp.where(valid[..., None], data, _BIG)
    out = jax.ops.segment_min(data, ids, num_segments=num_segments + 1)
    return out[:num_segments]


def segment_max(data: jnp.ndarray, seg_ids: jnp.ndarray, num_segments: int) -> jnp.ndarray:
    ids, valid = _sanitize(seg_ids, num_segments)
    data = jnp.where(valid[..., None], data, -_BIG)
    out = jax.ops.segment_max(data, ids, num_segments=num_segments + 1)
    return out[:num_segments]
