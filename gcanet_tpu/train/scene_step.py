"""Jit-compiled train step for the scene-level SoftGroup model family.

Loss orchestration mirrors the reference's ``SoftGroup.forward_train`` +
``point_wise_loss`` + ``instance_loss`` (softgroup/model/softgroup.py:113-150,
152-172, 175-255) with its ``parse_losses`` plain sum (softgroup.py:257-281):

  * semantic cross-entropy, ignore_index -100       (softgroup.py:158-160)
  * offset L1 summed over non-ignore instance points / count (:163-169)
  * SoftGroup instance loss with ignore_label -100 as the background
    instance class (:198-200) — shared with the ABC path
    (gcanet_tpu/losses/losses.py::instance_loss, bg_cls=-100 here).

Consumes the fixed-shape batches of ``data/scene_dataset.py``.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from gcanet_tpu.config import Config
from gcanet_tpu.losses import losses as L
from gcanet_tpu.train.step import TrainState


def compute_scene_losses(cfg: Config, out, batch: Dict[str, jnp.ndarray]
                         ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    sem_gt = batch["semantic"].reshape(-1)                    # [B*N]
    inst_gt = batch["I_gt_global"].reshape(-1)                # [B*N], -1 ignore
    ld: Dict[str, jnp.ndarray] = {}

    # semantic CE with ignore (softgroup.py:158-160)
    valid = sem_gt >= 0
    logp = jax.nn.log_softmax(out.semantic_scores, axis=-1)
    tgt = jnp.clip(sem_gt, 0, logp.shape[-1] - 1)
    ce = -jnp.take_along_axis(logp, tgt[:, None], axis=1)[:, 0]
    ld["semantic_loss"] = (jnp.sum(jnp.where(valid, ce, 0.0))
                           / jnp.maximum(jnp.sum(valid), 1))

    # offset L1 over points with a (non-ignore) instance (softgroup.py:163-169)
    ld["offset_loss"] = L.offset_loss(
        out.pt_offsets, inst_gt, batch["pt_offset_label"].reshape(-1, 3))

    # semantic_only stage: point-wise losses only (softgroup.py:126-129 —
    # the `if not self.semantic_only` guard around the instance branch)
    if cfg.semantic_only:
        return ld["semantic_loss"] + ld["offset_loss"], ld

    inst_total, aux = L.instance_loss(
        out.instance.cls_scores, out.instance.mask_scores,
        out.instance.iou_scores, out.proposals.point_pid,
        out.proposals.valid, inst_gt,
        batch["instance_pointnum"],
        batch["instance_cls"], batch["inst_valid"],
        cfg.num_primitives, bg_cls=-100)
    ld["cls_loss"] = aux.cls_loss
    ld["mask_loss"] = aux.mask_loss
    ld["iou_score_loss"] = aux.iou_score_loss
    ld["num_pos"] = aux.num_pos

    total = ld["semantic_loss"] + ld["offset_loss"] + inst_total
    return total, ld


def fixed_module_names(cfg: Config) -> tuple:
    """Parsed ``--fixed_modules`` top-level param groups (strip + drop
    empties so "a, b," round-trips)."""
    return tuple(m.strip() for m in str(cfg.fixed_modules or "").split(",")
                 if m.strip())


def freeze_fixed_modules(fixed: tuple, grads, new_bs, old_bs):
    """TPU-native analogue of the reference's fixed_modules freeze
    (softgroup.py:83-86 requires_grad=False + :100-105 BN pinned to eval):
    zero the frozen subtrees' grads and keep their running batch stats.
    Zeroed grads alone are exact for adam (m=v=0 stays 0) but not for
    decoupled weight decay (torch skips grad=None params entirely, so the
    reference's frozen modules never decay) — the train step additionally
    restores frozen param subtrees after ``apply_updates``.
    Operates on top-level param-tree keys (the scene model names its
    modules after the reference: input_conv/unet/output_layer/
    semantic_linear/offset_linear/instance_head)."""
    if not fixed:
        return grads, new_bs
    grads = {k: (jax.tree.map(jnp.zeros_like, v) if k in fixed else v)
             for k, v in grads.items()}
    new_bs = {k: (old_bs[k] if k in fixed and k in old_bs else v)
              for k, v in new_bs.items()}
    return grads, new_bs


def make_scene_train_step(cfg: Config, model, tx, mesh: Mesh | None = None,
                          donate: bool = False):
    """Returns jitted ``step(state, batch, rng) -> (state, metrics)``; the
    per-step key folds in on device from ``state.step`` (same dispatch-
    pipelining rule as the flagship step).  ``donate=True`` aliases the
    TrainState buffers in place (see train/step.py::make_train_step)."""
    fixed = fixed_module_names(cfg)

    def loss_fn(params, batch_stats, batch, rng):
        out, mut = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["xyz"], batch["feats"], train=True, rng=rng,
            mutable=["batch_stats"])
        total, ld = compute_scene_losses(cfg, out, batch)
        return total, (ld, mut.get("batch_stats", batch_stats))

    def local_step(state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        if mesh is not None:
            # rebase batch-global instance ids to this shard's local table
            # (see train/step.py::local_step for the failure mode)
            base = (jax.lax.axis_index("data")
                    * batch["instance_pointnum"].shape[0])
            ig = batch["I_gt_global"]
            batch = dict(batch, I_gt_global=jnp.where(ig >= 0, ig - base, -1))
        (total, (ld, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, batch, rng)
        grads, new_bs = freeze_fixed_modules(fixed, grads, new_bs,
                                             state.batch_stats)
        if mesh is not None:
            grads = jax.lax.pmean(grads, "data")
            total = jax.lax.pmean(total, "data")
            ld = jax.lax.pmean(ld, "data")
            new_bs = jax.lax.pmean(new_bs, "data")
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        if fixed:  # exact freeze under any optimizer (e.g. adamw decay)
            params = {k: (state.params[k] if k in fixed else v)
                      for k, v in params.items()}
        metrics = dict(ld, total_loss=total)
        return TrainState(params, new_bs, opt_state, state.step + 1), metrics

    donate_kw = {"donate_argnums": (0,)} if donate else {}
    if mesh is None:
        return jax.jit(local_step, **donate_kw)
    sharded = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P("data"), P()),
        out_specs=(P(), P()),
        check_vma=False)
    return jax.jit(sharded, **donate_kw)


def init_scene_state(cfg: Config, model, tx, rng) -> TrainState:
    xyz = jnp.zeros((cfg.batch_size, cfg.num_points, 3))
    feats = jnp.zeros((cfg.batch_size, cfg.num_points, 3))
    variables = model.init({"params": rng}, xyz, feats, train=True, rng=rng)
    params = variables["params"]
    return TrainState(params, variables.get("batch_stats", {}),
                      tx.init(params), jnp.zeros((), jnp.int32))
