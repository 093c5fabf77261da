"""Int32 proposal-rank bound (ops/grouping.py build_proposals).

The global proposal ordering encodes (batch, class, kept<primary, root idx)
into one int32 rank: ((b*C + c)*2 + primary) * B*N + idx.  The code asserts
the bound at trace time; these tests pin it at the production shape
(B=10, N=8192, C=7 — bench_config's workload) and check the device-side
formula against an int64 oracle at the extreme corner.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


PROD_B, PROD_N, PROD_C = 10, 8192, 7


def _max_rank(b, n, c):
    n_total = b * n
    return ((b * c) * 2 + 1) * n_total + n_total - 1


def test_production_shape_within_int32():
    assert _max_rank(PROD_B, PROD_N, PROD_C) < 2**31
    # headroom: the whole B*N sweep up to the driver's largest mesh batch
    assert _max_rank(80, 8192, 7) < 2**31   # 8-chip global batch 80


def test_rank_formula_int32_matches_int64_at_corner():
    """The int32 arithmetic must equal an int64 oracle at the worst-case
    corner values of the production shape (no silent wraparound)."""
    b, n, c = PROD_B, PROD_N, PROD_C
    n_total = b * n
    g_batch = jnp.asarray([0, b - 1, b - 1], jnp.int32)
    g_cls = jnp.asarray([0, c - 1, c - 1], jnp.int32)
    g_primary = jnp.asarray([0, 1, 1], jnp.int32)
    g_idx = jnp.asarray([0, 0, n_total - 1], jnp.int32)

    r32 = ((g_batch * c + g_cls) * 2 + g_primary) * n_total + g_idx
    # int64 oracle on the host (jnp would silently stay int32 without x64)
    oracle = ((np.asarray(g_batch, np.int64) * c + np.asarray(g_cls))
              * 2 + np.asarray(g_primary)) * n_total + np.asarray(g_idx)
    np.testing.assert_array_equal(np.asarray(r32, dtype=np.int64), oracle)
    # true attained max is ((b-1)c + c-1)*2 + 1 = 2bc-1 leading blocks;
    # the trace-time assert uses the looser (2bc+1) bound
    assert int(oracle[-1]) == (2 * b * c - 1) * n_total + n_total - 1
    assert int(oracle[-1]) < 2**31
    assert int(oracle[-1]) <= _max_rank(b, n, c)


def test_overflow_shape_rejected():
    """Absurd B*N*C must trip the trace-time assert, not wrap silently."""
    from gcanet_tpu.config import GroupingConfig
    from gcanet_tpu.ops import grouping as G

    b, n, c = 8, 8192, 4096      # bound (2bc+1)*BN ~= 4.3e9 > 2^31
    xyz = jnp.zeros((b, n, 3))
    cls = jnp.zeros((b, n), jnp.int32)
    emb = jnp.zeros((b, n, 4))
    par = jnp.zeros((b, n, 22))
    with pytest.raises(AssertionError, match="rank overflows int32"):
        G.build_proposals(xyz, cls, emb, par, c,
                          GroupingConfig(), max_proposals=8)
