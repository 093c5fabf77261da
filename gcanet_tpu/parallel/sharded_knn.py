"""Point-axis-sharded kNN — the framework's "sequence parallelism".

The reference bounds O(N^2) point interactions with host-side tricks
(per-item python loops, 1000-point tiles, per-class subsetting —
SURVEY.md §5 "long-context").  The TPU-native analogue shards the *point
axis* across the device mesh and streams key blocks around the ring with
``ppermute`` (the ring pattern of the scaling-book / pallas guide §18):

  * queries stay resident, sharded [N/d, C] per device;
  * each of d steps computes an [N/d, N/d] distance tile against the
    resident key block, merges it into the running top-k, then rotates the
    key block one hop along the ring;
  * peak memory per device is O(N^2/d^2) instead of O(N^2).

Exact (lax.top_k merge per step).  Validated on the virtual CPU mesh in
tests/test_sharded_knn.py; on hardware the ppermute rides ICI.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from gcanet_tpu.ops import knn as knn_ops


def ring_knn_local(xq: jnp.ndarray, k: int, d: int, axis: str = "data",
                   metric=None):
    """The ring body, callable INSIDE an existing shard_map region.

    ``xq`` is this device's query shard [N/d, C]; ``d`` the ring size;
    ``metric(q_block, key_block) -> [nq, nk]`` pairwise distances (default
    euclidean; pass :func:`posnormal_metric` for the encoder's layer-1
    position-normal metric).  Returns GLOBAL top-k indices [N/d, k].
    """
    if metric is None:
        metric = knn_ops.pairwise_sqdist
    nl = xq.shape[0]
    me = jax.lax.axis_index(axis)
    keys = xq
    best_d = jnp.full((nl, k), jnp.inf, jnp.float32)
    best_i = jnp.zeros((nl, k), jnp.int32)

    def step(s, carry):
        keys, best_d, best_i = carry
        src_shard = (me - s) % d                   # whose block we hold now
        d2 = metric(xq, keys).astype(jnp.float32)           # [nl, nl]
        gidx = src_shard * nl + jnp.arange(nl, dtype=jnp.int32)
        cat_d = jnp.concatenate([best_d, d2], axis=1)
        cat_i = jnp.concatenate([best_i,
                                 jnp.broadcast_to(gidx[None, :], d2.shape)],
                                axis=1)
        neg, pos = jax.lax.top_k(-cat_d, k)
        best_d = -neg
        best_i = jnp.take_along_axis(cat_i, pos, axis=1)
        keys = jax.lax.ppermute(keys, axis,
                                [(i, (i + 1) % d) for i in range(d)])
        return keys, best_d, best_i

    keys, best_d, best_i = jax.lax.fori_loop(
        0, d, step, (keys, best_d, best_i))
    return best_i


def ring_gather_local(vals: jnp.ndarray, gidx: jnp.ndarray, d: int,
                      axis: str = "data") -> jnp.ndarray:
    """Gather point-sharded rows at GLOBAL indices, inside a shard_map.

    ``vals`` [N/d, C] this device's value shard; ``gidx`` [..., K] global row
    ids.  Streams the value blocks around the ring; each step fills the
    entries whose source block is currently resident.  Returns [..., K, C].
    """
    nl = vals.shape[0]
    me = jax.lax.axis_index(axis)
    out = jnp.zeros(gidx.shape + (vals.shape[-1],), vals.dtype)

    def step(s, carry):
        keys, out = carry
        src_shard = (me - s) % d
        sel = (gidx // nl) == src_shard
        loc = jnp.clip(gidx - src_shard * nl, 0, nl - 1)
        g = keys[loc]                               # [..., K, C]
        out = jnp.where(sel[..., None], g, out)
        keys = jax.lax.ppermute(keys, axis,
                                [(i, (i + 1) % d) for i in range(d)])
        return keys, out

    _, out = jax.lax.fori_loop(0, d, step, (vals, out))
    return out


def ring_knn(x: jnp.ndarray, k: int, mesh: Mesh, axis: str = "data"):
    """x [N, C] sharded along N over ``axis`` -> global top-k indices [N, k].

    Call under shard_map / jit with ``x`` partitioned as P(axis); returns
    indices into the GLOBAL point numbering.
    """
    return ring_knn_local(x, k, mesh.shape[axis], axis)


def make_sharded_knn(mesh: Mesh, k: int, axis: str = "data"):
    """Jitted end-to-end sharded kNN: global x [N, C] -> global idx [N, k]."""

    fn = jax.shard_map(
        functools.partial(ring_knn, k=k, mesh=mesh, axis=axis),
        mesh=mesh, in_specs=P(axis), out_specs=P(axis), check_vma=False)
    return jax.jit(fn)
