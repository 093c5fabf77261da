"""Point-axis-sharded trunk forward — ring-kNN's production consumer.

Serves clouds LARGER than a single chip's working set (the [N, K, C] edge
tensors and [N, N] distance tiles) by sharding the POINT axis of one cloud
over the device mesh: the framework's sequence parallelism (SURVEY §5
long-context row).  Per device the resident state is the [N/d, ...] shard;
neighbour search runs as ring kNN (distance tiles of [N/d, N/d]) and
neighbour-feature gathers stream the value blocks around the same ring
(``ppermute`` over ICI; parallel/sharded_knn.py).

Covers the full per-point half of the flagship model with the REAL trained
parameters (reused flax submodules, exact math):

  encoder (dgcnn-4.py:455-534: 3 edge convs + global-max MLP, the global
  max taken with ``lax.pmax`` over the mesh axis) -> trunk conv1/conv2 ->
  type head -> param head -> normal-angle embedding head (dgcnn-4.py:
  644-699).

Grouping/instance extraction stay single-chip paths (their N^2 class-gated
graph is bounded by per-class subsets in the reference too); the sharded
surface is per-point semantics for big clouds — type logits, primitive
parameters and embeddings — exposed in serving as
:meth:`gcanet_tpu.serve.Predictor.predict_type_sharded`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gcanet_tpu.config import Config
from gcanet_tpu.models.layers import ConvGNAct, DenseGN
from gcanet_tpu.ops import knn as knn_ops
from gcanet_tpu.parallel.sharded_knn import ring_gather_local, ring_knn_local

import flax.linen as fnn


def posnormal_metric(xq: jnp.ndarray, xk: jnp.ndarray) -> jnp.ndarray:
    """Two-block form of the position-normal metric (dgcnn-4.py:50-90):
    d_pos^2 * (1 + (2 - 2 n_i.n_j)) on [.., 6] (xyz ++ normal) blocks."""
    pd = knn_ops.pairwise_sqdist(xq[..., :3], xk[..., :3])
    nd = 2.0 - 2.0 * jnp.einsum("nc,mc->nm", xq[..., 3:6], xk[..., 3:6],
                                preferred_element_type=jnp.float32)
    return pd * (1.0 + nd)


def _gn_sharded(p, x, groups, axis, d, eps=1e-5):
    """GroupNorm with statistics over the GLOBAL point axis.

    flax/torch GroupNorm on [B, N(, K), C] normalises each batch item over
    ALL spatial positions and the group's channels — the statistics couple
    every point of the cloud, so the sharded forward must psum the moments
    over the mesh axis (one [2, groups] collective; E[x^2]-E[x]^2 form).
    ``x`` here is the batchless local shard [nl(, K), C].
    """
    c = x.shape[-1]
    xg = x.reshape(x.shape[:-1] + (groups, c // groups))
    red = tuple(i for i in range(xg.ndim) if i != xg.ndim - 2)
    cnt = 1.0
    for i in red:
        cnt *= xg.shape[i]
    mom = jnp.stack([jnp.sum(xg, axis=red), jnp.sum(xg * xg, axis=red)])
    mom = jax.lax.psum(mom, axis)                       # [2, groups]
    n_tot = cnt * d
    mean = mom[0] / n_tot
    var = jnp.maximum(mom[1] / n_tot - mean * mean, 0.0)
    shape = (1,) * (xg.ndim - 2) + (groups, 1)
    xn = (xg - mean.reshape(shape)) * jax.lax.rsqrt(var + eps).reshape(shape)
    xn = xn.reshape(x.shape)
    return xn * p["scale"] + p["bias"]


def _dense_gn(p, x, groups, axis, d):
    """DenseGN (Dense with bias + GroupNorm) with sharded-global GN stats."""
    h = x @ p["Dense_0"]["kernel"] + p["Dense_0"]["bias"]
    return _gn_sharded(p["GroupNorm_0"], h, groups, axis, d)


# (mesh, axis, cfg knobs the traced program reads) -> jitted fn.  Without
# this every serving request re-built a fresh jit-wrapped shard_map closure,
# re-tracing and re-querying the compilation cache through the slow TPU
# tunnel per request while holding the server's dispatch lock (ADVICE r4
# medium); with it, repeated N hit jit's own in-memory shape cache.
_type_fn_cache: dict = {}


def make_sharded_type_fn(cfg: Config, mesh: Mesh, axis: str = "data"):
    """Build ``fn(params, x6) -> (type_per_point, param_per_point, emb)``
    with ``x6 [N, 6]`` sharded along N over ``mesh``'s ``axis``.

    ``params`` is the PrimitiveNet param tree (the same one the Predictor
    restores); only the encoder/trunk/head subtrees are read.  N must be a
    multiple of the mesh size.  Exact math (exact ring kNN — the approx
    search is a single-chip layout optimisation).  Memoized per
    (mesh, axis, traced cfg knobs); repeated calls return the same jitted
    callable.
    """
    # The traced program hard-codes the mode==5 param layout (DenseGN_4
    # embedding head, posnormal layer-1 metric, 6-wide input) and per-layer
    # dynamic graphs; other configs would silently read the wrong param
    # subtrees and return wrong outputs (ADVICE r4).
    assert cfg.mode == 5 and not cfg.shared_graph, (
        "sharded trunk supports only mode==5 without shared_graph "
        f"(got mode={cfg.mode}, shared_graph={cfg.shared_graph})")
    key = (mesh, axis, cfg.nn_nb, cfg.nn_nb_inner, cfg.loss_class)
    cached = _type_fn_cache.get(key)
    if cached is not None:
        return cached
    d = mesh.shape[axis]
    k = cfg.nn_nb
    k2 = min(cfg.nn_nb_inner, k) if cfg.nn_nb_inner else k

    def local(params, x):                       # x: [N/d, 6] local shard
        enc = params["DGCNNEncoderGn_0"]

        idx1 = ring_knn_local(x, k, d, axis, metric=posnormal_metric)
        nbr1 = ring_gather_local(x, idx1, d, axis)          # [nl, K, 6]
        ctr = x[:, None, :]
        ef = jnp.concatenate(
            [nbr1 - ctr, jnp.broadcast_to(ctr, nbr1.shape)], axis=-1)

        def conv_gn_act(p, t, groups):
            # ConvGNAct: Dense (no bias) + GroupNorm (global stats) + leaky
            h = t @ p["Dense_0"]["kernel"]
            h = _gn_sharded(p["GroupNorm_0"], h, groups, axis, d)
            return fnn.leaky_relu(h, negative_slope=0.2)

        x1 = jnp.max(conv_gn_act(enc["ConvGNAct_0"], ef, 2), axis=1)

        def edge_conv(pe, xi, groups):
            idx = ring_knn_local(xi, k2, d, axis)
            c_in = xi.shape[-1]
            kern = pe["kernel"]
            a = xi @ kern[:c_in]
            c = xi @ (kern[c_in:] - kern[:c_in])
            hh = ring_gather_local(a, idx, d, axis) + c[:, None, :]
            hh = _gn_sharded(pe["GroupNorm_0"], hh, groups, axis, d)
            hh = fnn.leaky_relu(hh, negative_slope=0.2)
            return jnp.max(hh, axis=1)

        x2 = edge_conv(enc["EdgeConv_0"], x1, 2)
        x3 = edge_conv(enc["EdgeConv_1"], x2, 2)
        xf = jnp.concatenate([x1, x2, x3], axis=-1)         # [nl, 256]
        x4 = fnn.relu(_dense_gn(enc["DenseGN_0"], xf, 8, axis, d))
        gmax = jax.lax.pmax(jnp.max(x4, axis=0), axis)      # [1024] global
        feats = jnp.concatenate(
            [jnp.broadcast_to(gmax[None, :], (xf.shape[0], 1024)), xf], -1)

        # trunk + heads (primitive_net.py:85-103)
        t = fnn.relu(_dense_gn(params["DenseGN_0"], feats, 8, axis, d))
        x_all = fnn.relu(_dense_gn(params["DenseGN_1"], t, 4, axis, d))
        x_type = fnn.relu(_dense_gn(params["DenseGN_2"], x_all, 4, axis, d))
        logits = x_type @ params["Dense_0"]["kernel"] \
            + params["Dense_0"]["bias"]
        type_pp = (fnn.log_softmax(logits, axis=-1)
                   if "r" in cfg.loss_class else logits)
        x_para = fnn.relu(_dense_gn(params["DenseGN_3"], x_all, 4, axis, d))
        from gcanet_tpu.models.primitive_net import canonicalize_params

        param_pp = canonicalize_params(
            x_para @ params["Dense_1"]["kernel"] + params["Dense_1"]["bias"])

        # embedding head, normal-angle feature from the shared layer-1 gather
        nf = knn_ops.edge_feature_normals_g_from_gathered(
            x[None], nbr1[None])[0]
        nf = conv_gn_act(params["ConvGNAct_0"], nf, 2)
        normal_feature = jnp.max(nf, axis=1)
        emb_in = jnp.concatenate([x_all, x_type, x_para, normal_feature], -1)
        he = fnn.relu(_dense_gn(params["DenseGN_4"], emb_in, 4, axis, d))
        emb = he @ params["Dense_2"]["kernel"] + params["Dense_2"]["bias"]
        return type_pp, param_pp, emb

    sharded = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(axis)),
        out_specs=(P(axis), P(axis), P(axis)),
        check_vma=False)
    fn = jax.jit(sharded)
    _type_fn_cache[key] = fn
    return fn


def predict_type_sharded(cfg: Config, params, xyz, normals,
                         mesh: Mesh | None = None):
    """Per-point type/param/embedding for ONE large cloud sharded over the
    mesh (all local devices by default).  xyz/normals [N, 3] numpy; N must
    divide by the device count."""
    import numpy as np

    if mesh is None:
        devs = np.array(jax.devices())
        mesh = Mesh(devs, ("data",))
    n = xyz.shape[0]
    d = mesh.devices.size
    assert n % d == 0, f"N={n} must divide over {d} devices"
    x6 = jnp.asarray(np.concatenate([xyz, normals], axis=-1,
                                    dtype=np.float32))
    x6 = jax.device_put(x6, NamedSharding(mesh, P("data")))
    fn = make_sharded_type_fn(cfg, mesh)
    type_pp, param_pp, emb = fn(params, x6)
    return (np.asarray(type_pp), np.asarray(param_pp), np.asarray(emb))
