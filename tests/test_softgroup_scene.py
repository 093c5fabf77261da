"""Scene-level SoftGroup model family: forward shapes, grad flow."""

import jax
import jax.numpy as jnp
import numpy as np

from gcanet_tpu.config import Config, GroupingConfig, InstanceHeadConfig
from gcanet_tpu.models.softgroup_scene import SoftGroupNet


def test_softgroup_scene_forward_and_grad():
    cfg = Config(num_points=256, batch_size=2, max_instances=16,
                 grouping=GroupingConfig(radius=0.1, min_npoint=5, cc_max_iters=16),
                 instance_head=InstanceHeadConfig(grid_size=8, max_proposals=16))
    model = SoftGroupNet(cfg, scene_grid=16, channels=16)
    rng = jax.random.PRNGKey(0)
    xyz = jax.random.uniform(rng, (2, 256, 3))
    feats = jax.random.normal(rng, (2, 256, 6))
    variables = model.init({"params": rng}, xyz, feats, train=True, rng=rng)
    out, _ = model.apply(variables, xyz, feats, train=True, rng=rng,
                         mutable=["batch_stats"])
    assert out.semantic_scores.shape == (512, cfg.num_primitives)
    assert out.pt_offsets.shape == (512, 3)
    assert np.isfinite(np.asarray(out.semantic_scores)).all()

    def loss(params):
        o, _ = model.apply({"params": params,
                            "batch_stats": variables.get("batch_stats", {})},
                           xyz, feats, train=True, rng=rng,
                           mutable=["batch_stats"])
        return (jnp.mean(o.semantic_scores**2) + jnp.mean(o.pt_offsets**2)
                + jnp.mean(o.instance.cls_scores**2))

    g = jax.grad(loss)(variables["params"])
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(g))
