"""End-to-end train-step tests, after the Pointnet2 ``_test_loop`` pattern
(reference models/Pointnet2_PyTorch-master/tests/conftest.py:27-40): build the
model, run a few optimizer steps on random data, assert the loss goes down and
never blows up; plus the multichip sharding dry-run."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gcanet_tpu.config import Config, GroupingConfig, InstanceHeadConfig
from gcanet_tpu.data.synthetic import synth_batch
from gcanet_tpu.models.primitive_net import PrimitiveNet
from gcanet_tpu.train import step as step_lib


def tiny_config(batch_size=2, mesh="1"):
    return Config(
        num_points=192, batch_size=batch_size, nn_nb=12, offset_knn=6,
        offset_keypoints=24, max_instances=16, mesh_shape=mesh,
        grouping=GroupingConfig(radius=0.1, min_npoint=5, cc_max_iters=32),
        instance_head=InstanceHeadConfig(grid_size=8, max_proposals=24),
    )


def _arrays(batch):
    return {k: jnp.asarray(v) for k, v in batch.items() if k != "index"}


def test_five_steps_loss_decreases():
    cfg = tiny_config()
    model = PrimitiveNet(cfg)
    tx = step_lib.make_optimizer(cfg)
    rng = jax.random.PRNGKey(0)
    state = step_lib.init_state(cfg, model, tx, rng)
    train_step = step_lib.make_train_step(cfg, model, tx)

    batch = _arrays(synth_batch(cfg, cfg.batch_size, seed=0))
    losses = []
    for i in range(5):
        rng, sub = jax.random.split(rng)
        state, metrics = train_step(state, batch, sub)
        losses.append(float(metrics["total_loss"]))
    assert np.isfinite(losses).all()
    # overfitting a fixed batch must reduce the loss
    assert losses[-1] < losses[0]


def test_donated_step_matches_undonated():
    """donate=True (trainer/bench path) aliases the TrainState buffers in
    place; it must produce the same numbers as the default step and the
    returned state must chain into the next call."""
    cfg = tiny_config()
    model = PrimitiveNet(cfg)
    tx = step_lib.make_optimizer(cfg)
    batch = _arrays(synth_batch(cfg, cfg.batch_size, seed=0))
    ref_state = step_lib.init_state(cfg, model, tx, jax.random.PRNGKey(0))
    don_state = step_lib.init_state(cfg, model, tx, jax.random.PRNGKey(0))
    ref_step = step_lib.make_train_step(cfg, model, tx)
    don_step = step_lib.make_train_step(cfg, model, tx, donate=True)
    for _ in range(2):
        ref_state, ref_m = ref_step(ref_state, batch, jax.random.PRNGKey(1))
        don_state, don_m = don_step(don_state, batch, jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(don_m["total_loss"]),
                               float(ref_m["total_loss"]), rtol=1e-5)


def test_eval_step_and_instances():
    cfg = tiny_config(batch_size=1)
    model = PrimitiveNet(cfg)
    tx = step_lib.make_optimizer(cfg)
    state = step_lib.init_state(cfg, model, tx, jax.random.PRNGKey(0))
    eval_step = step_lib.make_eval_step(cfg, model)
    batch = _arrays(synth_batch(cfg, 1, seed=1))
    out, merged_dev, total, ld = eval_step(state.params, state.batch_stats,
                                           batch)
    assert np.isfinite(float(total))

    from gcanet_tpu.train import instances as I
    from gcanet_tpu.train import metrics as M

    preds = I.get_instances(
        np.asarray(out.proposals.point_pid), np.asarray(out.semantic_scores),
        np.asarray(out.instance.cls_scores), np.asarray(out.instance.iou_scores),
        np.asarray(out.instance.mask_scores), np.asarray(out.proposals.valid),
        cfg.num_primitives, min_npoint=5)
    n = cfg.num_points
    merged = I.merge_masks(preds) if preds else np.zeros(n, np.int32)

    # the in-jit extraction must agree with the host pair at eval thresholds
    merged_dev2, _, _, _, _ = I.merged_labels_device(
        np.asarray(out.proposals.point_pid),
        np.asarray(out.instance.cls_scores),
        np.asarray(out.instance.iou_scores),
        np.asarray(out.instance.mask_scores),
        np.asarray(out.proposals.valid), cfg.num_primitives, min_npoint=5)
    np.testing.assert_array_equal(np.asarray(merged_dev2), merged)
    i_gt = np.asarray(batch["I_gt"][0])
    miou = M.compute_miou(merged, i_gt)
    tmiou = M.compute_type_miou_abc(np.asarray(out.type_per_point[0]),
                                    np.asarray(batch["T_gt"][0]), merged, i_gt)
    assert 0.0 <= miou <= 1.0
    assert 0.0 <= tmiou <= 1.0


def test_multichip_dryrun():
    n_dev = min(len(jax.devices()), 4)
    if n_dev < 2:
        pytest.skip("needs multiple (virtual) devices")
    cfg = tiny_config(batch_size=n_dev, mesh=str(n_dev))
    model = PrimitiveNet(cfg)
    tx = step_lib.make_optimizer(cfg)
    state = step_lib.init_state(cfg, model, tx, jax.random.PRNGKey(0))
    mesh = step_lib.make_mesh(cfg)
    assert mesh is not None
    train_step = step_lib.make_train_step(cfg, model, tx, mesh)
    batch = _arrays(synth_batch(cfg, cfg.batch_size, seed=2))
    state, metrics = train_step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["total_loss"]))


def test_metrics_perfect_prediction():
    from gcanet_tpu.train import metrics as M

    i_gt = np.array([0, 0, 1, 1, 2, 2, -1, -1])
    pred = np.array([1, 1, 0, 0, 2, 2, 3, 3])
    assert M.compute_miou(pred, i_gt) > 0.7  # 3 instances perfectly matched
    t = np.array([1, 1, 4, 4, 5, 5, 0, 0])
    assert M.compute_type_miou_abc(t, t, pred, i_gt) == 1.0


def test_eval_with_set_aggregation():
    cfg = tiny_config(batch_size=1).replace(using_set_aggr=True)
    model = PrimitiveNet(cfg)
    tx = step_lib.make_optimizer(cfg)
    state = step_lib.init_state(cfg, model, tx, jax.random.PRNGKey(0))
    eval_step = step_lib.make_eval_step(cfg, model)
    batch = _arrays(synth_batch(cfg, 1, seed=3))
    out, _, total, ld = eval_step(state.params, state.batch_stats, batch)
    assert np.isfinite(float(total))
    # channel 1 (absorptions) may be active at eval with set aggr; it must
    # only reference valid proposals
    pid = np.asarray(out.proposals.point_pid)
    valid = np.asarray(out.proposals.valid)
    absorbed = pid[1][pid[1] >= 0]
    if absorbed.size:
        assert valid[absorbed].all()


def test_train_metrics_keys():
    cfg = tiny_config()
    model = PrimitiveNet(cfg)
    tx = step_lib.make_optimizer(cfg)
    state = step_lib.init_state(cfg, model, tx, jax.random.PRNGKey(0))
    train_step = step_lib.make_train_step(cfg, model, tx)
    batch = _arrays(synth_batch(cfg, cfg.batch_size, seed=4))
    _, metrics = train_step(state, batch, jax.random.PRNGKey(1))
    for key in ("feat_loss", "nnl_loss", "param_loss", "offset_loss",
                "inst_loss", "total_loss"):
        assert key in metrics and np.isfinite(float(metrics[key]))


def test_bf16_precision_policy_trains():
    cfg = tiny_config().replace(precision="bf16")
    model = PrimitiveNet(cfg)
    tx = step_lib.make_optimizer(cfg)
    state = step_lib.init_state(cfg, model, tx, jax.random.PRNGKey(0))
    train_step = step_lib.make_train_step(cfg, model, tx)
    batch = _arrays(synth_batch(cfg, cfg.batch_size, seed=5))
    losses = []
    for i in range(10):
        state, metrics = train_step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["total_loss"]))
    assert np.isfinite(losses).all()
    # Adam warms up with a transient spike around step 2 in both precisions;
    # require overall descent over 10 steps
    assert losses[-1] < losses[0]
    # params stay fp32 in the optimizer
    assert all(x.dtype == jnp.float32 for x in jax.tree.leaves(state.params)
               if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating))


def test_mesh_instance_ids_rebase_to_local_tables():
    """Regression: under shard_map the collate's batch-global instance ids
    must be rebased per shard or shards > 0 lose their instance loss.  The
    sharded per-shard-mean losses must match the unsharded per-item math."""
    n_dev = min(len(jax.devices()), 2)
    if n_dev < 2:
        pytest.skip("needs multiple (virtual) devices")
    cfg = tiny_config(batch_size=n_dev, mesh=str(n_dev))
    model = PrimitiveNet(cfg)
    tx = step_lib.make_optimizer(cfg)
    batch = _arrays(synth_batch(cfg, cfg.batch_size, seed=7))

    state_m = step_lib.init_state(cfg, model, tx, jax.random.PRNGKey(0))
    mesh = step_lib.make_mesh(cfg)
    step_m = step_lib.make_train_step(cfg, model, tx, mesh)
    _, metrics_m = step_m(state_m, batch, jax.random.PRNGKey(1))

    # single-device runs per item (batch 1) to reproduce the per-shard math
    cfg1 = dataclasses.replace(cfg, batch_size=1, mesh_shape="1")
    state_1 = step_lib.init_state(cfg1, model, tx, jax.random.PRNGKey(0))
    step_1 = step_lib.make_train_step(cfg1, model, tx)
    i_max = cfg.max_instances
    offs = []
    for bi in range(n_dev):
        sub = {k: v[bi:bi + 1] if v.ndim >= 1 and v.shape[0] == n_dev
               else v for k, v in batch.items()}
        sub["instance_pointnum"] = batch["instance_pointnum"][
            bi * i_max:(bi + 1) * i_max]
        sub["instance_cls"] = batch["instance_cls"][bi * i_max:(bi + 1) * i_max]
        sub["inst_valid"] = batch["inst_valid"][bi * i_max:(bi + 1) * i_max]
        ig = batch["I_gt_global"][bi:bi + 1]
        sub["I_gt_global"] = jnp.where(ig >= 0, ig - bi * i_max, -1)
        _, m1 = step_1(state_1, sub, jax.random.PRNGKey(1))
        offs.append(float(m1["offset_loss"]))
    # pmean of the per-item offset losses == the sharded metric
    np.testing.assert_allclose(float(metrics_m["offset_loss"]),
                               np.mean(offs), rtol=1e-4)
    assert np.isfinite(float(metrics_m["inst_loss"]))
