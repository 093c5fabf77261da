"""Jit-compiled train/eval steps with data-parallel sharding.

Loss orchestration mirrors ``MyTrainer.process_batch`` (train_new.py:22-137):
the 'f'/'r'/'p'/'n' characters of ``loss_class`` select embedding, type+offset+
instance, parameter and normal losses with the reference's exact weights
(train_new.py:104-128).

Parallelism: ``shard_map`` over a 1-D ``data`` mesh axis — each device runs
the full model on its sub-batch (with its own proposal cap, exactly like the
reference's ``nn.DataParallel`` per-GPU sub-batches, trainer_new.py:94-96) and
gradients are psum-averaged over ICI.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, PartitionSpec as P

from gcanet_tpu.config import Config
from gcanet_tpu.losses import losses as L
from gcanet_tpu.models.primitive_net import ModelOutput, PrimitiveNet


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def compute_losses(cfg: Config, out: ModelOutput, batch: Dict[str, jnp.ndarray]
                   ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """train_new.py:104-137 semantics."""
    loss_dict: Dict[str, jnp.ndarray] = {}
    b, n = batch["T_gt"].shape

    if "f" in cfg.loss_class:
        feat_loss, pull, push = L.compute_embedding_loss(
            out.embedding, batch["I_gt"], cfg.max_instances)
        loss_dict["feat_loss"] = feat_loss * 2.0
        loss_dict["pull_loss"] = pull
        loss_dict["push_loss"] = push
    if cfg.mode == 3:
        loss_dict["normal_loss"] = cfg.normal_weight * L.compute_normal_loss(
            out.normal_per_point, batch["gt_normal"])
    if "p" in cfg.loss_class:
        loss_dict["param_loss"] = 5.0 * cfg.param_weight * L.compute_param_loss(
            out.param_per_point, batch["T_gt"], batch["T_param"])
    if "r" in cfg.loss_class:
        loss_dict["nnl_loss"] = cfg.type_weight * L.compute_nnl_loss(
            out.type_per_point, batch["T_gt"])
        inst_flat = batch["I_gt_global"].reshape(b * n)
        loss_dict["offset_loss"] = 10.0 * L.offset_loss(
            out.pt_offsets, inst_flat,
            batch["pt_offset_label"].reshape(b * n, 3))
        inst_total, aux = L.instance_loss(
            out.instance.cls_scores, out.instance.mask_scores,
            out.instance.iou_scores, out.proposals.point_pid,
            out.proposals.valid, inst_flat,
            batch["instance_pointnum"], batch["instance_cls"],
            batch["inst_valid"], cfg.num_primitives)
        loss_dict["inst_loss"] = inst_total * 1.0
        loss_dict["num_pos"] = aux.num_pos

    total = jnp.asarray(0.0)
    for key, v in loss_dict.items():
        if "loss" in key and key not in ("pull_loss", "push_loss"):
            total = total + v
    return total, loss_dict


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    """Adam/SGD with the reference's piecewise-constant decay
    (trainer_new.py:98-117, 144-155); the schedule is applied per-epoch by the
    trainer through ``optax.inject_hyperparams``-style scaling."""
    if cfg.optimizer.lower() == "adam":
        opt = optax.inject_hyperparams(optax.adamw)(
            learning_rate=cfg.learning_rate, weight_decay=cfg.weight_decay) \
            if cfg.weight_decay else \
            optax.inject_hyperparams(optax.adam)(learning_rate=cfg.learning_rate)
    else:
        opt = optax.inject_hyperparams(optax.sgd)(
            learning_rate=cfg.learning_rate, momentum=cfg.momentum, nesterov=True)
    return opt


def lr_for_epoch(cfg: Config, epoch: int) -> float:
    """trainer_new.py:144-150."""
    lr = cfg.learning_rate
    for step_epoch, rate in zip(cfg.lr_decay_step_list, cfg.lr_decay_rate_list):
        if epoch >= step_epoch:
            lr *= rate
    return lr


def init_state(cfg: Config, model: PrimitiveNet, tx, rng) -> TrainState:
    b = max(cfg.batch_size // _mesh_size(cfg), 1)
    xyz = jnp.zeros((b, cfg.num_points, 3))
    nrm = jnp.zeros((b, cfg.num_points, 3))
    variables = model.init({"params": rng}, xyz, nrm, train=True, rng=rng)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(params, batch_stats, tx.init(params), jnp.asarray(0))


def _mesh_size(cfg: Config) -> int:
    if jax.process_count() > 1:
        # multi-host: the data mesh always spans every process's devices
        # (the reference's DDP world, softgroup/util/dist.py:51-112)
        return jax.device_count()
    return int(cfg.mesh_shape) if str(cfg.mesh_shape).isdigit() else 1


def make_mesh(cfg: Config) -> Mesh | None:
    n = _mesh_size(cfg)
    if n <= 1:
        return None
    # Explicit (process_index, id) order — NOT mesh_utils.create_device_mesh,
    # which may reorder devices by physical topology.  The host-side instance
    # id rebase (rebase_local_batch: + rank*local_b*max_instances) and the
    # in-step unrebase (local_step: - axis_index('data')*shard_rows) cancel
    # only if process r's devices occupy mesh slots [r*dpp, (r+1)*dpp); the
    # explicit order guarantees that.  A 1-D data axis loses nothing: XLA
    # ring-schedules the psum over ICI regardless of logical order.
    devices = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    if len(devices) < n:
        raise ValueError(
            f"mesh_shape={n} but only {len(devices)} device(s) visible — "
            f"refusing to silently train on a smaller mesh")
    return Mesh(np.array(devices[:n]), ("data",))


def rebase_local_batch(batch: Dict[str, Any], rank: int, world: int,
                       max_instances: int) -> Dict[str, Any]:
    """Make a per-process collated batch globally consistent.

    Each process collates only its own chunk, so its ``I_gt_global`` ids live
    in ``[0, local_b * max_instances)``; the in-step rebase
    (``local_step``: ``axis_index('data') * shard_rows``) assumes ids indexed
    into the GLOBAL instance table.  Shift this process's ids by its chunk
    offset so the two compose."""
    if world <= 1 or rank == 0:
        return batch
    # works for both families: ABC batches lead with gt_pc, scenes with xyz
    local_b = batch["gt_pc" if "gt_pc" in batch else "xyz"].shape[0]
    base = rank * local_b * max_instances
    ig = np.asarray(batch["I_gt_global"])
    return dict(batch, I_gt_global=np.where(ig >= 0, ig + base, -1))


def replicate_to_mesh(tree: Any, mesh: Mesh) -> Any:
    """Replicate a host-identical pytree onto every device of the mesh.

    Works single- and multi-host: each process contributes its (identical)
    local value and the result is a fully-replicated global jax.Array —
    required because a jit over a multi-host mesh only accepts global arrays.
    """
    from jax.sharding import NamedSharding

    sharding = NamedSharding(mesh, P())
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)), tree)


def make_global_batch(mesh: Mesh, batch: Dict[str, Any]) -> Dict[str, Any]:
    """Assemble per-process local arrays into global jax.Arrays on the mesh.

    Every entry is batch-sharded along its leading axis (the collate emits
    everything either [B, ...] or [B*max_instances, ...])."""
    from jax.sharding import NamedSharding

    sharding = NamedSharding(mesh, P("data"))
    return {k: jax.make_array_from_process_local_data(sharding, np.asarray(v))
            for k, v in batch.items()}


def make_train_step(cfg: Config, model: PrimitiveNet, tx,
                    mesh: Mesh | None = None, donate: bool = False):
    """Returns jitted ``step(state, batch, rng) -> (state, metrics)``.

    ``donate=True`` donates the input TrainState so XLA aliases the param /
    optimizer buffers in place (saves one params+opt_state copy of HBM and
    the copy itself).  Callers must then treat the passed state as consumed
    (``state, m = step(state, ...)``) — the trainer and bench do; it stays
    opt-in because several tests deliberately re-run one state."""

    def loss_fn(params, batch_stats, batch, rng):
        if cfg.precision == "bf16":
            # bf16 storage/compute with fp32 params in the optimizer: cast at
            # the step boundary (grad of cast = cast back, so gradients return
            # fp32).  Losses run in fp32 on the (small) head outputs.
            from gcanet_tpu.utils.precision import _map_floats

            apply_params = _map_floats(params, jnp.bfloat16)
            apply_batch = dict(batch,
                               gt_pc=batch["gt_pc"].astype(jnp.bfloat16),
                               gt_normal=batch["gt_normal"].astype(jnp.bfloat16))
        else:
            apply_params, apply_batch = params, batch
        out, mut = model.apply(
            {"params": apply_params, "batch_stats": batch_stats},
            apply_batch["gt_pc"], apply_batch["gt_normal"], train=True, rng=rng,
            mutable=["batch_stats"])
        if cfg.precision == "bf16":
            from gcanet_tpu.utils.precision import _map_floats

            out = _map_floats(out, jnp.float32)
        total, ld = compute_losses(cfg, out, batch)
        return total, (ld, mut.get("batch_stats", batch_stats))

    def local_step(state: TrainState, batch, rng):
        # Derive the per-step key on device: callers pass the SAME base key
        # every call.  A host-side jax.random.split between dispatches is a
        # tiny tunnelled device program that stalls the dispatch pipeline
        # (measured 615 -> 1757 ms/step at B=8 on the tunnelled v5e).
        rng = jax.random.fold_in(rng, state.step)
        if mesh is not None:
            # collate emits batch-GLOBAL instance ids; the instance tables
            # shard with the batch as contiguous chunks, so rebase ids to
            # this shard's local table or every id on shards > 0 falls
            # outside the table and the instance loss silently zeroes
            base = (jax.lax.axis_index("data")
                    * batch["instance_pointnum"].shape[0])
            ig = batch["I_gt_global"]
            batch = dict(batch, I_gt_global=jnp.where(ig >= 0, ig - base, -1))
        (total, (ld, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch, rng)
        if mesh is not None:
            grads = jax.lax.pmean(grads, "data")
            total = jax.lax.pmean(total, "data")
            ld = jax.lax.pmean(ld, "data")
            new_bs = jax.lax.pmean(new_bs, "data")
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(ld, total_loss=total)
        return TrainState(params, new_bs, opt_state, state.step + 1), metrics

    donate_kw = {"donate_argnums": (0,)} if donate else {}
    if mesh is None:
        return jax.jit(local_step, **donate_kw)

    shard_map = jax.shard_map

    sharded = shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P("data"), P()),
        out_specs=(P(), P()),
        check_vma=False)
    return jax.jit(sharded, **donate_kw)


def make_eval_step(cfg: Config, model: PrimitiveNet):
    """Eval forward (batch 1, postprocess path) returning the full ModelOutput
    plus device-side merged instance labels (get_instances + merge_masks run
    inside the jit so eval fetches [N] ints instead of [CH, N, C] masks)."""
    from gcanet_tpu.train import instances as inst_utils

    @jax.jit
    def step(params, batch_stats, batch):
        out = model.apply({"params": params, "batch_stats": batch_stats},
                          batch["gt_pc"], batch["gt_normal"], train=False,
                          rng=jax.random.PRNGKey(0))
        total, ld = compute_losses(cfg, out, batch)
        merged, _, _, _, _ = inst_utils.merged_labels_device(
            out.proposals.point_pid, out.instance.cls_scores,
            out.instance.iou_scores, out.instance.mask_scores,
            out.proposals.valid, cfg.num_primitives)
        return out, merged, total, ld

    return step
