"""Profiling / tracing helpers.

Replaces the reference's ad-hoc instrumentation (``cuda_time`` sync timers at
trainer_new.py:19-21, the ``@timing`` decorator at utils/main_utils.py:29-38,
``parameter_count`` :19-21) with jax.profiler-based tracing plus axon-safe
wall timers (see gcanet_tpu/utils/timing.py for why plain block_until_ready
is not enough on this backend).
"""

from __future__ import annotations

import contextlib
import functools
import time

import jax

from gcanet_tpu.utils.timing import force_ready


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a profiler trace viewable in TensorBoard / xprof."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_time(tree=None) -> float:
    """Wall clock after forcing all pending device work observable via tree."""
    if tree is not None:
        force_ready(tree)
    return time.time()


def timing(fn):
    """utils/main_utils.py:29-38 equivalent."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        t0 = time.perf_counter()
        r = fn(*args, **kwargs)
        force_ready(r) if r is not None else None
        print(f"{fn.__module__}.{fn.__name__} : {time.perf_counter() - t0}")
        return r

    return wrapper


def parameter_count(params) -> float:
    """Million-parameter count (utils/main_utils.py:19-21)."""
    n = sum(x.size for x in jax.tree.leaves(params))
    print(f"parameters number: {n / 1e6} M")
    return n / 1e6
