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
# Multi-class sweep for the scene family's SOFT grouping: C independent
# per-class label vectors propagate over ONE shared geometric radius graph
# (class membership is encoded in the label init — non-members carry the
# _BIG_I sentinel, which a min can never select, so propagation runs exactly
# along member->member edges of each class).  The per-class-sequential form
# streams the [N, N] mask from HBM once PER CLASS; this kernel streams it
# ONCE and does the C masked-min reductions while the tile is in VMEM —
# C x less sweep HBM traffic, which is the soft path's measured overhead
# (BASELINE.md round-5: soft 17.05 vs argmax 19.67 clouds/s at B=4,
# hbm_util 0.93 — the step is HBM-bound).
# ---------------------------------------------------------------------------


def _sweep_kernel_multi(nbr_ref, lab_ref, out_ref):
    v = nbr_ref[...].astype(jnp.int32)                    # [TM, Np] 0/1
    labs = lab_ref[...]                                   # [C, Np] int32
    c = labs.shape[0]
    outs = []
    for ci in range(c):                                   # static unroll
        masked = v * labs[ci][None, :] + (1 - v) * _BIG_I
        outs.append(jnp.min(masked, axis=1))              # [TM]
    out_ref[...] = jnp.stack(outs, axis=0)                # [C, TM]


@functools.partial(jax.jit, static_argnames=("interpret",))
def masked_min_sweep_multi(nbr_i8: jnp.ndarray, labels: jnp.ndarray,
                           interpret: bool = False) -> jnp.ndarray:
    """For each class c: min over j of labels[c, j] where nbr[i, j] != 0.

    nbr_i8: [Np, Np] int8 (Np a multiple of 256), labels: [C, Np] int32.
    Returns [C, Np] int32 with _BIG_I where a row has no contributing
    neighbour.  One pass over the mask serves all C classes (the lane axis
    of every block is the point axis — C is tiny and lives on sublanes).
    """
    n_pad = nbr_i8.shape[0]
    c = labels.shape[0]
    # VMEM budget must count the kernel's INT32 temporaries, not just the
    # int8 input tile: the unrolled class loop holds the promoted mask and
    # a masked-select intermediate (~8-9 bytes/elem live at once, measured
    # 17.15M scoped at tm=256/N=8192 against the 16M limit).  Budget ~6MB
    # of temporaries; step 128 because the OUT block's lane dim is tm
    # (Mosaic requires the last block dim divisible by 128) — the step
    # floor keeps tm=128 (~8.6M scoped at N=8192, fits).
    tm = _divisor_tile(n_pad, min(512, (6 * 1024 * 1024) // (12 * n_pad)),
                       128)
    out = pl.pallas_call(
        _sweep_kernel_multi,
        grid=(n_pad // tm,),
        in_specs=[
            pl.BlockSpec((tm, n_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, n_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((c, tm), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, n_pad), jnp.int32),
        interpret=interpret,
    )(nbr_i8, labels)
    return out


def connected_components_multi(geo: jnp.ndarray, member: jnp.ndarray,
                               max_iters: int = 64,
                               impl: str = "auto") -> jnp.ndarray:
    """Per-class connected components over one shared geometric graph.

    geo: [N, N] bool symmetric radius graph (no class gating).
    member: [C, N] bool per-class soft membership.
    Returns labels [C, N] int32: for member points, the min member index of
    the point's class-c component (propagation strictly along edges whose
    BOTH endpoints are class-c members); _BIG_I sentinel for non-members.

    Equivalent to running ``connected_components(geo & m & m.T)`` per class
    (oracle-tested), at 1/C the sweep HBM traffic on TPU via the fused
    multi-class kernel; the XLA fallback vmaps the per-class sweep.
    """
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    c, n = member.shape
    idx = jnp.arange(n, dtype=jnp.int32)
    init = jnp.where(member, idx[None, :], _BIG_I)        # [C, N]

    if impl == "pallas":
        n_pad = -(-max(n, _PAD) // _PAD) * _PAD
        geo_i8 = geo.astype(jnp.int8)
        if n_pad != n:
            geo_i8 = jnp.zeros((n_pad, n_pad), jnp.int8
                               ).at[:n, :n].set(geo_i8)
            init = jnp.concatenate(
                [init, jnp.full((c, n_pad - n), _BIG_I, jnp.int32)], axis=1)
        interpret = _use_interpret()

        def sweep(labels):
            return masked_min_sweep_multi(geo_i8, labels,
                                          interpret=interpret)
        n_eff = n_pad
    else:
        def sweep(labels):
            # [C, N] labels against the shared [N, N] graph, per class:
            # min_j geo[i, j] ? labels[c, j] : BIG  (vmapped over classes)
            return jax.vmap(lambda lab: jnp.min(
                jnp.where(geo, lab[None, :], _BIG_I), axis=1))(labels)
        n_eff = n

    memb = init < _BIG_I                                  # padded member mask

    def body(state):
        labels, _, it = state
        nbr_min = sweep(labels)
        new = jnp.minimum(labels, nbr_min)
        # non-members must stay at the sentinel: a geo edge from a member
        # neighbour would otherwise label them and create phantom bridges
        new = jnp.where(memb, new, _BIG_I)
        # pointer jumping per class (gather indices clamped off the sentinel)
        safe = jnp.minimum(new, n_eff - 1)
        new = jnp.minimum(new, jnp.take_along_axis(new, safe, axis=1))
        safe = jnp.minimum(new, n_eff - 1)
        new = jnp.minimum(new, jnp.take_along_axis(new, safe, axis=1))
        new = jnp.where(memb, new, _BIG_I)
        changed = jnp.any(new != labels)
        return new, changed, it + 1

    def cond(state):
        _, changed, it = state
        return changed & (it < max_iters)

    labels, _, _ = jax.lax.while_loop(cond, body, (init, jnp.bool_(True), 0))
    return labels[:, :n]
