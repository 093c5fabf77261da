"""SceneUNet remat knob: identical math, same param tree, close grads.

Remat exists to lift the scene family's B=4 OOM ceiling (BASELINE.md
2026-08-19: B=10 at grid 64 OOMs) — the [B, G^3, C] block activations are
recomputed in backward instead of stored.  TPU memory effects are measured
by the queue's scene_perf step; this pins the semantics.
"""

import jax
import jax.numpy as jnp
import numpy as np

from gcanet_tpu.config import Config, GroupingConfig, InstanceHeadConfig
from gcanet_tpu.models.softgroup_scene import SoftGroupNet
from gcanet_tpu.data.synthetic import synth_scene_batch


def _cfg():
    return Config(num_points=192, batch_size=2, nn_nb=8, max_instances=8,
                  grouping=GroupingConfig(radius=0.1, min_npoint=5,
                                          cc_max_iters=8),
                  instance_head=InstanceHeadConfig(grid_size=8,
                                                   max_proposals=8))


def test_scene_remat_identical_forward_and_grads():
    cfg = _cfg()
    batch = synth_scene_batch(cfg, cfg.batch_size, seed=0)
    xyz = jnp.asarray(batch["xyz"])
    feats = jnp.asarray(batch["feats"])

    base = SoftGroupNet(cfg, scene_grid=16, channels=8)
    rem = SoftGroupNet(cfg, scene_grid=16, channels=8, remat=True)
    variables = base.init({"params": jax.random.PRNGKey(0)}, xyz, feats,
                          train=False)
    # remat is a lifted transform: the param tree must be IDENTICAL so
    # checkpoints swap freely between the two
    v2 = rem.init({"params": jax.random.PRNGKey(0)}, xyz, feats, train=False)
    assert jax.tree_util.tree_structure(variables) == \
        jax.tree_util.tree_structure(v2)

    out_a = base.apply(variables, xyz, feats, train=False)
    out_b = rem.apply(variables, xyz, feats, train=False)
    np.testing.assert_allclose(np.asarray(out_a.semantic_scores),
                               np.asarray(out_b.semantic_scores),
                               atol=1e-6, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out_a.pt_offsets),
                               np.asarray(out_b.pt_offsets),
                               atol=1e-6, rtol=1e-6)

    def loss(model, params):
        out = model.apply({"params": params,
                           "batch_stats": variables.get("batch_stats", {})},
                          xyz, feats, train=False)
        return jnp.sum(out.semantic_scores ** 2) * 1e-3

    ga = jax.grad(lambda p: loss(base, p))(variables["params"])
    gb = jax.grad(lambda p: loss(rem, p))(variables["params"])
    flat_a = jax.tree_util.tree_leaves(ga)
    flat_b = jax.tree_util.tree_leaves(gb)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


def test_abc_remat_param_tree_compatible():
    """Config.remat must not fork the flagship param tree either (lifted
    transforms auto-name children Checkpoint<Class>_N without explicit
    names — a checkpoint written with remat off must load with remat on)."""
    from gcanet_tpu.models.primitive_net import PrimitiveNet

    cfg = _cfg().replace(num_points=96, nn_nb=8)
    xyz = jnp.zeros((1, cfg.num_points, 3))
    nrm = jnp.ones((1, cfg.num_points, 3)) / jnp.sqrt(3.0)
    va = PrimitiveNet(cfg).init({"params": jax.random.PRNGKey(0)}, xyz, nrm,
                                train=False, rng=jax.random.PRNGKey(1))
    vb = PrimitiveNet(cfg.replace(remat=True)).init(
        {"params": jax.random.PRNGKey(0)}, xyz, nrm,
        train=False, rng=jax.random.PRNGKey(1))
    assert jax.tree_util.tree_structure(va) == jax.tree_util.tree_structure(vb)
