"""Pallas TPU kernel for the connected-components masked min-label sweep.

The CC while-loop's hot op (ops/grouping.py::connected_components) is

    nbr_min[i] = min_j { labels[j] : nbr[i, j] }

— a dense [N, N]-masked reduction swept once per label-propagation
iteration.  The pure-XLA form reads the boolean matrix and runs a
select+min reduce per sweep; this kernel streams [TM, N] int8 row-tiles
through VMEM with the label vector resident, so each iteration's HBM
traffic is exactly the mask bytes (N*N int8) with no intermediate
materialisation and no re-broadcast of the labels.

Grouping is stop-gradient (dgcnn-4.py:1122 runs under torch.no_grad
semantics), so the kernel is forward-only — no VJP needed.

Replaces: the sweep inside our device CC, which itself replaces the
reference's host BFS (hierarchical_aggregation.cpp:11-42).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG_I = 2**30
# Row-tile budget: keep an input block around ~2 MB so the pipeline can
# double-buffer comfortably inside the ~16 MB VMEM.
_BLOCK_BYTES = 2 * 1024 * 1024
# Pad N to a multiple of 256: satisfies both the int8 sublane tile (32) for
# rows and the 128-lane tile for columns at any split.
_PAD = 256


def _divisor_tile(n_pad: int, budget: int, step: int) -> int:
    """Largest multiple of ``step`` <= budget that DIVIDES n_pad.

    grid=(n_pad // tm,) silently drops the tail row-tile when tm does not
    divide n_pad (ADVICE r3: at N=600, n_pad=768, tm=512 the last 256 rows
    were never written).  n_pad is always a multiple of _PAD=256, so a
    divisor that is a multiple of ``step`` (32 for int8 sublanes, 8 for
    int32) always exists down at ``step`` itself.
    """
    budget = max(step, min(budget, n_pad))
    budget -= budget % step
    for tm in range(budget, step - 1, -step):
        if n_pad % tm == 0:
            return tm
    return step


def _row_tile(n_pad: int) -> int:
    return _divisor_tile(n_pad, min(512, _BLOCK_BYTES // n_pad), 32)


def _sweep_kernel(nbr_ref, lab_ref, out_ref):
    # Arithmetic select instead of jnp.where: a [TM, Np] i1 mask vector
    # trips a Mosaic relayout bug on v5e ("Invalid relayout: Non-singleton
    # logical dimension is replicated in destination but not in source",
    # observed 2026-08-20 at vector<256x8192xi1>); int32 0/1 arithmetic
    # lowers cleanly and costs one extra VPU multiply per element.
    v = nbr_ref[...].astype(jnp.int32)                    # [TM, Np] 0/1
    lab = lab_ref[...]                                    # [1, Np] int32
    masked = v * lab + (1 - v) * _BIG_I
    out_ref[...] = jnp.min(masked, axis=1, keepdims=True)  # [TM, 1]


@functools.partial(jax.jit, static_argnames=("interpret",))
def masked_min_sweep(nbr_i8: jnp.ndarray, labels: jnp.ndarray,
                     interpret: bool = False) -> jnp.ndarray:
    """min over j of labels[j] where nbr[i, j] != 0; _BIG_I where no neighbour.

    nbr_i8: [Np, Np] int8 (Np a multiple of 256), labels: [Np] int32.
    """
    n_pad = nbr_i8.shape[0]
    tm = _row_tile(n_pad)
    out = pl.pallas_call(
        _sweep_kernel,
        grid=(n_pad // tm,),
        in_specs=[
            pl.BlockSpec((tm, n_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
        interpret=interpret,
    )(nbr_i8, labels[None, :])
    return out[:, 0]


def _use_interpret() -> bool:
    # Compiled Mosaic kernels exist only on TPU; tests run on the virtual
    # CPU mesh where the interpreter lowers to plain XLA ops.
    return jax.default_backend() != "tpu"


def connected_components_pallas(nbr: jnp.ndarray,
                                max_iters: int = 64) -> jnp.ndarray:
    """Drop-in for grouping.connected_components with the Pallas sweep.

    Pads the graph once to a 256-multiple (int8), iterates min-label
    propagation + pointer jumping in the padded domain (padded points have
    no neighbours so they stay self-labelled and never flip ``changed``),
    and slices the result back.
    """
    n = nbr.shape[0]
    n_pad = -(-max(n, _PAD) // _PAD) * _PAD
    nbr_i8 = nbr.astype(jnp.int8)
    if n_pad != n:
        nbr_i8 = jnp.zeros((n_pad, n_pad), jnp.int8).at[:n, :n].set(nbr_i8)
    interpret = _use_interpret()
    idx = jnp.arange(n_pad, dtype=jnp.int32)

    def body(state):
        labels, _, it = state
        nbr_min = masked_min_sweep(nbr_i8, labels, interpret=interpret)
        new = jnp.minimum(labels, nbr_min)
        new = jnp.minimum(new, new[new])
        new = jnp.minimum(new, new[new])
        changed = jnp.any(new != labels)
        return new, changed, it + 1

    def cond(state):
        _, changed, it = state
        return changed & (it < max_iters)

    labels, _, _ = jax.lax.while_loop(cond, body, (idx, jnp.bool_(True), 0))
    return labels[:n]


# ---------------------------------------------------------------------------
# Tombstone: a bit-packed int32 sweep variant (cc_impl="pallas32", 1/8 the
# mask HBM traffic) was built and REJECTED round 4 — the sweep is not
# mask-byte-bound at production N, so the unpack ALU (32 shift+and+select
# per word) cost more than the saved bytes (isolated 52.6 ms vs 40.9 ms
# int8; e2e -2.6%).  Full numbers: BASELINE.md round-4 rows; code removed
# round 5 per the non-adopted-perf-code convention (git history has it).
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# Tombstone 2: a FUSED MULTI-CLASS sweep for soft grouping (one pass over
# the shared geo mask propagating all C class label vectors, membership
# encoded in the label init) was built and REJECTED in-round (2026-08-21):
# paired e2e at B=8/grid 64 it measured 20.45 vs 21.95 clouds/s for the
# per-class path (-6.8%) — the sweep is ALU-bound, not mask-byte-bound
# (the same lesson as the pallas32 reject), and the fused while_loop loses
# the per-class early exit.  Two Mosaic constraints were also learned and
# are worth keeping: scoped-VMEM must budget the kernel's int32 promoted
# temporaries (~8-9 B/elem live; 17.15M > 16M at tm=256/N=8192), and the
# OUT block's lane dim must divide by 128.  BASELINE.md round-5 rows keep
# the record; git history (b70abae..) has the code.
# ---------------------------------------------------------------------------
