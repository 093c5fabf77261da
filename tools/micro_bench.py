"""Per-stage timing of the flagship pipeline at the bench workload.

Replaces trace-based attribution when jax.profiler is unavailable on the
tunnel (the trace collection can wedge the relay): every stage is jitted and
timed in isolation with forced value-fetch completion (utils/timing.py).

Usage: python tools/micro_bench.py [stage,stage,...]
Stages: knn, encoder, model_fwd, graph, cc, grouping, voxelize, head,
        losses, step  (default: all).  Honours the GCA_BENCH_* knobs via
        config.bench_config().
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from gcanet_tpu.runtime_setup import enable_compilation_cache

enable_compilation_cache()

from gcanet_tpu.config import bench_config
from gcanet_tpu.data.synthetic import synth_batch
from gcanet_tpu.models.primitive_net import PrimitiveNet
from gcanet_tpu.ops import grouping as grouping_ops
from gcanet_tpu.ops import knn as knn_ops
from gcanet_tpu.ops import voxelize as vox_ops
from gcanet_tpu.train import step as step_lib
from gcanet_tpu.utils.timing import time_fn

STAGES = sys.argv[1].split(",") if len(sys.argv) > 1 else [
    "knn", "encoder", "model_fwd", "graph", "cc", "grouping", "voxelize",
    "head", "losses", "step"]
# extra opt-in stages (not in the default list): edgebwd — scatter vs
# reverse-gather backward of the neighbour gather, plus the argsort that
# builds the reverse index (the decision input for Config.edge_backward).

cfg = bench_config()
model = PrimitiveNet(cfg)
tx = step_lib.make_optimizer(cfg)
rng = jax.random.PRNGKey(0)
state = step_lib.init_state(cfg, model, tx, rng)
batch = {k: jnp.asarray(v)
         for k, v in synth_batch(cfg, cfg.batch_size, seed=0).items()
         if k != "index"}
b, n = batch["T_gt"].shape
K = cfg.nn_nb


def report(name, secs):
    print(f"{name:28s} {secs * 1e3:9.2f} ms", flush=True)


# one full forward to harvest representative intermediates for stage inputs
fwd = jax.jit(functools.partial(
    model.apply, train=True, rng=rng, mutable=["batch_stats"]))
out, _ = fwd({"params": state.params, "batch_stats": state.batch_stats},
             batch["gt_pc"], batch["gt_normal"])
points = jnp.concatenate([batch["gt_pc"], batch["gt_normal"]], axis=-1)
emb = out.embedding
param = out.param_per_point
cls_argmax = jnp.argmax(out.semantic_scores.reshape(b, n, -1), -1).astype(jnp.int32)
shifted = (batch["gt_pc"] + out.pt_offsets.reshape(b, n, 3)).astype(jnp.float32)
pid = out.proposals.point_pid

if "knn" in STAGES:
    f = jax.jit(lambda p: knn_ops.knn_points_normals_indices(p, K, cfg.knn_impl))
    report("knn points+normals (x1)", time_fn(f, points))
    feat64 = jnp.asarray(jax.random.normal(rng, (b, n, 64)))
    f2 = jax.jit(lambda p: knn_ops.knn_indices(p, K, cfg.knn_impl))
    report("knn feature-64 (x2/step)", time_fn(f2, feat64))

if "encoder" in STAGES:
    from gcanet_tpu.models.dgcnn import DGCNNEncoderGn

    enc = DGCNNEncoderGn(mode=cfg.mode, nn_nb=K, knn_impl=cfg.knn_impl)
    evars = enc.init(rng, points)

    def enc_loss(v, p):
        return jnp.sum(enc.apply(v, p) ** 2)

    report("encoder fwd", time_fn(jax.jit(lambda v, p: enc.apply(v, p)), evars, points))
    report("encoder fwd+bwd", time_fn(jax.jit(jax.grad(enc_loss)), evars, points))

if "model_fwd" in STAGES:
    report("model fwd (full)", time_fn(
        fwd, {"params": state.params, "batch_stats": state.batch_stats},
        batch["gt_pc"], batch["gt_normal"]))

graph_fn = jax.jit(lambda args: jax.lax.map(
    lambda a: grouping_ops.gated_neighbor_mask(
        a[0], a[1], a[2], a[3], cfg.num_primitives, cfg.grouping)[0],
    args))

if "graph" in STAGES:
    report("grouping: gated graph", time_fn(
        graph_fn, (shifted, cls_argmax, emb, param)))

if "cc" in STAGES:
    nbr_all = graph_fn((shifted, cls_argmax, emb, param))
    cc_fn = jax.jit(lambda nb: jax.lax.map(
        lambda m: grouping_ops.connected_components(
            m, cfg.grouping.cc_max_iters, cfg.grouping.cc_impl),
        nb))
    report(f"grouping: CC ({cfg.grouping.cc_impl})", time_fn(cc_fn, nbr_all))

if "grouping" in STAGES:
    gp = jax.jit(lambda s, c, e, pp: grouping_ops.build_proposals(
        s, c, e, pp, cfg.num_primitives, cfg.grouping,
        max_proposals=cfg.instance_head.max_proposals))
    report("grouping: total", time_fn(gp, shifted, cls_argmax, emb, param))

if "voxelize" in STAGES:
    vx_fn = jax.jit(lambda co, fe, pp: vox_ops.clusters_voxelization(
        co, fe, pp, num_proposals=cfg.instance_head.max_proposals,
        grid_size=cfg.instance_head.grid_size))
    report("cluster voxelization", time_fn(
        vx_fn, batch["gt_pc"].reshape(b * n, 3), emb.reshape(b * n, -1), pid))

if "head" in STAGES:
    from gcanet_tpu.models.instance_head import InstanceHead

    vx = vox_ops.clusters_voxelization(
        batch["gt_pc"].reshape(b * n, 3), emb.reshape(b * n, -1), pid,
        num_proposals=cfg.instance_head.max_proposals,
        grid_size=cfg.instance_head.grid_size)
    head = InstanceHead(num_classes=cfg.num_primitives,
                        channels=cfg.instance_head.channels,
                        grid_size=cfg.instance_head.grid_size)
    hvars = head.init(rng, vx.feats, vx.active, vx.entry_voxel, pid, True)

    def head_loss(v, f):
        o = head.apply(v, f, vx.active, vx.entry_voxel, pid, True,
                       mutable=["batch_stats"])[0]
        return jnp.sum(o.cls_scores ** 2) + jnp.sum(o.mask_scores ** 2) \
            + jnp.sum(o.iou_scores ** 2)

    report("instance head fwd+bwd", time_fn(
        jax.jit(jax.grad(head_loss, argnums=1)), hvars, vx.feats))

if "edgebwd" in STAGES:
    # the two real backward scatters are [B,N,K]-edge cotangents into
    # [B*N, 64] and [B*N, 128] (edge convs 2 and 3 at the bench shapes)
    feat = jnp.asarray(jax.random.normal(rng, (b, n, 64)))
    idx = knn_ops.knn_indices(feat, K, cfg.knn_impl)
    for c_out in (64, 128):
        gcot = jnp.asarray(jax.random.normal(rng, (b, n, K, c_out)))
        xin = jnp.asarray(jax.random.normal(rng, (b, n, c_out)))

        def bwd(kind):
            def f(x_, g_):
                _, vjp = jax.vjp(
                    lambda xx: knn_ops.gather_neighbors_impl(xx, idx, kind), x_)
                return vjp(g_)[0]
            return jax.jit(f)

        report(f"edge bwd scatter C={c_out}", time_fn(bwd("scatter"), xin, gcot))
        for m in (48, 64, 96):
            report(f"edge bwd revgather:{m} C={c_out}",
                   time_fn(bwd(f"revgather:{m}"), xin, gcot))
    sort_fn = jax.jit(lambda i: jnp.argsort(i.reshape(b, n * K), axis=1))
    report("argsort edges (rev index)", time_fn(sort_fn, idx))

if "losses" in STAGES:
    loss_fn = jax.jit(lambda o, bt: step_lib.compute_losses(cfg, o, bt)[0])
    report("losses fwd", time_fn(loss_fn, out, batch))

if "step" in STAGES:
    train_step = step_lib.make_train_step(cfg, model, tx, None, donate=False)
    report("full train step", time_fn(
        train_step, state, batch, rng, iters=5, warmup=1))
