"""Scene train step: losses drop over repeated steps on a fixed batch,
ignore-label semantics, data-parallel mesh variant."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gcanet_tpu.config import Config, GroupingConfig, InstanceHeadConfig
from gcanet_tpu.data import scene_dataset as sd
from gcanet_tpu.models.softgroup_scene import SoftGroupNet
from gcanet_tpu.train import scene_step, step as step_lib


def _cfg(batch_size=2):
    return Config(num_points=256, batch_size=batch_size, max_instances=8,
                  grouping=GroupingConfig(radius=0.1, min_npoint=5,
                                          cc_max_iters=8),
                  instance_head=InstanceHeadConfig(grid_size=8,
                                                   max_proposals=8))


def _scene_batch(cfg, seed=0):
    from gcanet_tpu.data.synthetic import synth_scene_batch

    batch = synth_scene_batch(cfg, cfg.batch_size, seed=seed)
    return {k: jnp.asarray(v) for k, v in batch.items() if k != "index"}


def test_scene_step_loss_decreases():
    cfg = _cfg()
    model = SoftGroupNet(cfg, scene_grid=16, channels=16)
    tx = step_lib.make_optimizer(cfg)
    state = scene_step.init_scene_state(cfg, model, tx, jax.random.PRNGKey(0))
    train = scene_step.make_scene_train_step(cfg, model, tx)
    batch = _scene_batch(cfg)
    rng = jax.random.PRNGKey(1)
    losses = []
    for _ in range(5):
        state, metrics = train(state, batch, rng)
        losses.append(float(metrics["total_loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    for k in ("semantic_loss", "offset_loss", "cls_loss", "mask_loss",
              "iou_score_loss"):
        assert k in metrics


def test_scene_losses_ignore_semantics():
    cfg = _cfg()
    model = SoftGroupNet(cfg, scene_grid=16, channels=16)
    tx = step_lib.make_optimizer(cfg)
    state = scene_step.init_scene_state(cfg, model, tx, jax.random.PRNGKey(0))
    batch = _scene_batch(cfg)
    # all semantic labels ignored + no valid instances -> zero sem/instance
    batch2 = dict(batch,
                  semantic=jnp.full_like(batch["semantic"], -100),
                  I_gt_global=jnp.full_like(batch["I_gt_global"], -1),
                  inst_valid=jnp.zeros_like(batch["inst_valid"]),
                  instance_cls=jnp.full_like(batch["instance_cls"], -100))
    out, _ = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        batch2["xyz"], batch2["feats"], train=True, rng=jax.random.PRNGKey(2),
        mutable=["batch_stats"])
    total, ld = scene_step.compute_scene_losses(cfg, out, batch2)
    assert float(ld["semantic_loss"]) == 0.0
    assert float(ld["offset_loss"]) == 0.0
    assert float(ld["cls_loss"]) == 0.0
    assert np.isfinite(float(total))


def test_scene_step_on_mesh():
    n_dev = min(len(jax.devices()), 2)
    if n_dev < 2:
        pytest.skip("needs multiple (virtual) devices")
    cfg = _cfg(batch_size=n_dev).replace(mesh_shape=str(n_dev))
    model = SoftGroupNet(cfg, scene_grid=16, channels=16)
    tx = step_lib.make_optimizer(cfg)
    state = scene_step.init_scene_state(cfg, model, tx, jax.random.PRNGKey(0))
    mesh = step_lib.make_mesh(cfg)
    assert mesh is not None
    train = scene_step.make_scene_train_step(cfg, model, tx, mesh)
    batch = _scene_batch(cfg, seed=3)
    state, metrics = train(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["total_loss"]))
