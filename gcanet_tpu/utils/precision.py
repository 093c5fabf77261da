"""Precision policy utilities.

Equivalent of the reference's fp16 helpers (softgroup/util/fp16.py:30-66
``force_fp32`` — cast listed args half -> float and disable autocast around
numerically sensitive blocks).  On TPU the analogue is bf16 storage/compute
with fp32 islands: ``force_f32`` casts float arrays up, ``to_compute_dtype``
casts down, and ``matmul_precision`` scopes the XLA matmul precision.
"""

from __future__ import annotations

import contextlib
import functools
from typing import Any

import jax
import jax.numpy as jnp


def _map_floats(tree: Any, dtype) -> Any:
    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree.map(cast, tree)


def force_f32(fn):
    """Decorator: run ``fn`` with all floating args cast to fp32 (the
    force_fp32 analogue for bf16 pipelines)."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        args = _map_floats(args, jnp.float32)
        kwargs = _map_floats(kwargs, jnp.float32)
        return fn(*args, **kwargs)

    return wrapped


def to_compute_dtype(tree: Any, precision: str) -> Any:
    """Cast float leaves to the configured compute dtype ('fp32' | 'bf16')."""
    if precision == "bf16":
        return _map_floats(tree, jnp.bfloat16)
    return tree


@contextlib.contextmanager
def matmul_precision(kind: str = "default"):
    """Scope XLA matmul precision: 'default' (fast bf16 passes), 'float32'
    (exact, 3-6x slower on MXU), 'tensorfloat32'."""
    with jax.default_matmul_precision(None if kind == "default" else kind):
        yield


def get_max_memory() -> int:
    """Peak device memory in MB (softgroup/util/utils.py:144-150 analogue)."""
    try:
        stats = jax.devices()[0].memory_stats()
        return int(stats.get("peak_bytes_in_use", 0) // (1024 * 1024))
    except Exception:
        return 0
