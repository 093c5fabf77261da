"""Pallas CC sweep (ops/cc_pallas.py) vs the XLA implementation and the
numpy BFS oracle.  On the CPU test backend the kernel runs in interpreter
mode; the TPU compile/perf A/B is a queue step (GCA_BENCH_CC_PALLAS=1)."""

import jax.numpy as jnp
import numpy as np
import pytest

from gcanet_tpu.ops import cc_pallas
from gcanet_tpu.ops.grouping import connected_components


def _random_graph(n, p, seed):
    rng = np.random.default_rng(seed)
    a = rng.random((n, n)) < p
    a = np.triu(a, 1)
    a = a | a.T                      # symmetric, zero diagonal
    return a


def _oracle_labels(a):
    n = a.shape[0]
    labels = -np.ones(n, np.int64)
    for i in range(n):
        if labels[i] >= 0:
            continue
        stack, comp = [i], []
        labels[i] = i
        while stack:
            cur = stack.pop()
            comp.append(cur)
            for j in np.nonzero(a[cur])[0]:
                if labels[j] < 0:
                    labels[j] = i
                    stack.append(j)
    return labels


@pytest.mark.parametrize("n,p,seed", [
    (10, 0.3, 0),       # tiny (pads 10 -> 256)
    (300, 0.02, 1),     # non-multiple of 256
    (257, 0.0, 2),      # no edges: identity labels
    (512, 0.01, 3),     # exact multiple, two row tiles
    (600, 0.02, 4),     # n_pad=768: ADVICE r3 tail-tile drop regression
    (2100, 0.005, 5),   # n_pad=2304: budget tile 512 does not divide
])
def test_pallas_cc_matches_oracle(n, p, seed):
    a = _random_graph(n, p, seed)
    want = _oracle_labels(a)
    got = np.asarray(cc_pallas.connected_components_pallas(jnp.asarray(a)))
    np.testing.assert_array_equal(got, want)


def test_pallas_cc_chain_worst_case():
    # 300-point chain: the adversarial case for label propagation depth.
    n = 300
    a = np.zeros((n, n), bool)
    idx = np.arange(n - 1)
    a[idx, idx + 1] = True
    a = a | a.T
    got = np.asarray(cc_pallas.connected_components_pallas(jnp.asarray(a)))
    np.testing.assert_array_equal(got, np.zeros(n, np.int64))


def test_row_tiles_divide_n_pad():
    # The grid is n_pad // tm with no boundary handling: tm MUST divide
    # n_pad for every reachable padded size (multiples of 256).
    for m in range(1, 64):
        n_pad = 256 * m
        tm = cc_pallas._row_tile(n_pad)
        assert n_pad % tm == 0 and tm % 32 == 0, (n_pad, tm)


def test_impl_dispatch_equivalence():
    a = _random_graph(400, 0.015, 7)
    via_xla = np.asarray(connected_components(jnp.asarray(a), impl="xla"))
    via_pallas = np.asarray(connected_components(jnp.asarray(a), impl="pallas"))
    np.testing.assert_array_equal(via_xla, via_pallas)


def test_masked_min_sweep_values():
    # Direct sweep check incl. the no-neighbour sentinel.
    n = 256
    a = np.zeros((n, n), np.int8)
    a[0, 10] = a[0, 20] = 1
    a[5, 255] = 1
    labels = jnp.arange(n, dtype=jnp.int32) * 3
    out = np.asarray(cc_pallas.masked_min_sweep(
        jnp.asarray(a), labels, interpret=True))
    assert out[0] == 30                     # min(10*3, 20*3)
    assert out[5] == 255 * 3
    assert out[1] == cc_pallas._BIG_I       # no neighbours
