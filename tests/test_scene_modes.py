"""Scene-family secondary modes: semantic_only staged training, fixed-module
freezing, and the S3DIS x4 test split (softgroup/model/softgroup.py:24,72,93
for semantic_only; :83-86,100-105 for fixed_modules; :380-411 for
forward_4_parts/merge_4_parts)."""

import jax
import jax.numpy as jnp
import numpy as np

from gcanet_tpu.config import Config, GroupingConfig, InstanceHeadConfig
from gcanet_tpu.data.synthetic import synth_scene_batch
from gcanet_tpu.models.softgroup_scene import SoftGroupNet
from gcanet_tpu.train import scene_step
from gcanet_tpu.train import step as step_lib


def _cfg(**kw):
    base = dict(num_points=256, batch_size=2, max_instances=16,
                grouping=GroupingConfig(radius=0.1, min_npoint=5,
                                        cc_max_iters=16),
                instance_head=InstanceHeadConfig(grid_size=8,
                                                 max_proposals=16))
    base.update(kw)
    return Config(**base)


def _batch(cfg, seed=0):
    return {k: jnp.asarray(v)
            for k, v in synth_scene_batch(cfg, cfg.batch_size,
                                          seed=seed).items()
            if k != "index"}


def test_semantic_only_stage():
    """Stage-1 model has NO instance branch (softgroup.py:72-77 only builds
    tiny_unet/cls/mask/iou when not semantic_only) and trains on point-wise
    losses only (softgroup.py:126-129)."""
    cfg = _cfg(semantic_only=True)
    model = SoftGroupNet(cfg, scene_grid=16, channels=16, semantic_only=True)
    rng = jax.random.PRNGKey(0)
    tx = step_lib.make_optimizer(cfg)
    state = scene_step.init_scene_state(cfg, model, tx, rng)

    # named modules; no instance head / grouping params in stage 1
    keys = set(state.params.keys())
    assert {"input_conv", "unet", "output_layer", "semantic_linear",
            "offset_linear"} <= keys
    assert "instance_head" not in keys

    train_step = scene_step.make_scene_train_step(cfg, model, tx)
    state2, metrics = train_step(state, _batch(cfg), rng)
    assert np.isfinite(float(metrics["total_loss"]))
    assert "cls_loss" not in metrics          # instance losses not computed
    np.testing.assert_allclose(
        float(metrics["total_loss"]),
        float(metrics["semantic_loss"]) + float(metrics["offset_loss"]),
        rtol=1e-6)


def test_staged_resume_key_intersection():
    """Stage-1 params drop into the full model by name (the reference loads
    the stage-1 checkpoint with load_checkpoint's key intersection,
    trainer_new.py:120-142): every stage-1 param name exists in the stage-2
    tree with the same shape."""
    cfg = _cfg()
    rng = jax.random.PRNGKey(0)
    xyz = jax.random.uniform(rng, (2, 256, 3))
    feats = jax.random.normal(rng, (2, 256, 6))
    m1 = SoftGroupNet(cfg, scene_grid=16, channels=16, semantic_only=True)
    m2 = SoftGroupNet(cfg, scene_grid=16, channels=16)
    v1 = m1.init({"params": rng}, xyz, feats, train=True, rng=rng)
    v2 = m2.init({"params": rng}, xyz, feats, train=True, rng=rng)
    flat1 = jax.tree_util.tree_flatten_with_path(v1["params"])[0]
    flat2 = dict(jax.tree_util.tree_flatten_with_path(v2["params"])[0])
    for path, leaf in flat1:
        assert path in flat2, f"stage-1 param {path} missing from full model"
        assert flat2[path].shape == leaf.shape


def test_fixed_modules_freeze():
    """fixed_modules zeroes grads + pins batch stats for the listed groups
    (softgroup.py:83-86 requires_grad=False, :100-105 BN eval)."""
    fixed = "input_conv,unet,output_layer,semantic_linear,offset_linear"
    cfg = _cfg(fixed_modules=fixed)
    model = SoftGroupNet(cfg, scene_grid=16, channels=16)
    rng = jax.random.PRNGKey(0)
    tx = step_lib.make_optimizer(cfg)
    state = scene_step.init_scene_state(cfg, model, tx, rng)
    train_step = scene_step.make_scene_train_step(cfg, model, tx)
    state2, _ = train_step(state, _batch(cfg), rng)

    frozen = scene_step.fixed_module_names(cfg)
    assert frozen == tuple(fixed.split(","))
    for name in frozen:
        before = jax.tree.leaves(state.params[name])
        after = jax.tree.leaves(state2.params[name])
        for b, a in zip(before, after):
            np.testing.assert_array_equal(np.asarray(b), np.asarray(a))
        if name in state.batch_stats:
            for b, a in zip(jax.tree.leaves(state.batch_stats[name]),
                            jax.tree.leaves(state2.batch_stats[name])):
                np.testing.assert_array_equal(np.asarray(b), np.asarray(a))
    # the instance head (not listed) must still learn
    moved = any(
        not np.array_equal(np.asarray(b), np.asarray(a))
        for b, a in zip(jax.tree.leaves(state.params["instance_head"]),
                        jax.tree.leaves(state2.params["instance_head"])))
    assert moved


def test_x4_split_matches_per_part_backbone():
    """x4_split parity oracle: the batched 4-part backbone equals running
    each interleaved subset [p::4] through the plain path as its own scene
    (what forward_4_parts does with its python loop, softgroup.py:380-391),
    with outputs re-interleaved (merge_4_parts, :393-411)."""
    cfg = _cfg(batch_size=1)
    model = SoftGroupNet(cfg, scene_grid=16, channels=16)
    rng = jax.random.PRNGKey(0)
    n = cfg.num_points
    xyz = jax.random.uniform(rng, (1, n, 3))
    feats = jax.random.normal(jax.random.PRNGKey(1), (1, n, 6))
    variables = model.init({"params": rng}, xyz, feats, train=True, rng=rng)

    out_x4 = model.apply(variables, xyz, feats, train=False, rng=rng,
                         x4_split=True)
    sem_x4 = np.asarray(out_x4.semantic_scores)         # [N, C]
    assert sem_x4.shape == (n, cfg.num_primitives)

    for p in range(4):
        part_xyz = xyz[:, p::4]
        part_feats = feats[:, p::4]
        out_p = model.apply(variables, part_xyz, part_feats, train=False,
                            rng=rng)
        np.testing.assert_allclose(sem_x4[p::4],
                                   np.asarray(out_p.semantic_scores),
                                   rtol=1e-5, atol=1e-5)
