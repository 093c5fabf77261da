"""Benchmark timing utilities.

The experimental axon TPU plugin's ``block_until_ready`` returns without
waiting, so every measurement here forces completion by fetching a scalar
from the result tree (device -> host copy of one element cannot complete
before the computation does).
"""

import time

import jax
import numpy as np


def force_ready(tree):
    """Force actual completion of a pytree computation (axon-safe)."""
    leaf = jax.tree.leaves(tree)[0]
    np.asarray(leaf.ravel()[0] if hasattr(leaf, "ravel") else leaf)
    return tree


def time_fn(fn, *args, iters: int = 10, warmup: int = 2):
    """Median-free simple wall timing with forced completion per-iter chain."""
    for _ in range(warmup):
        r = fn(*args)
    force_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    force_ready(r)
    return (time.perf_counter() - t0) / iters
