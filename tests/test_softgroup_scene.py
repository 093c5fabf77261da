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


def test_softgroup_scene_bf16_matches_fp32():
    """compute_bf16 runs the scene U-Net convs in bf16 (the scene family is
    dense-conv FLOP/HBM-bound, unlike the ABC edge path); same params must
    give fp32-path outputs within bf16 rounding, and grads must stay finite."""
    cfg = Config(num_points=256, batch_size=2, max_instances=16,
                 grouping=GroupingConfig(radius=0.1, min_npoint=5, cc_max_iters=16),
                 instance_head=InstanceHeadConfig(grid_size=8, max_proposals=16))
    rng = jax.random.PRNGKey(0)
    xyz = jax.random.uniform(rng, (2, 256, 3))
    feats = jax.random.normal(rng, (2, 256, 6))

    m32 = SoftGroupNet(cfg, scene_grid=16, channels=16)
    m16 = SoftGroupNet(cfg, scene_grid=16, channels=16, compute_bf16=True)
    variables = m32.init({"params": rng}, xyz, feats, train=True, rng=rng)
    o32, _ = m32.apply(variables, xyz, feats, train=True, rng=rng,
                       mutable=["batch_stats"])
    o16, _ = m16.apply(variables, xyz, feats, train=True, rng=rng,
                       mutable=["batch_stats"])
    assert o16.semantic_scores.dtype == jnp.float32  # outputs cast back
    s32 = np.asarray(o32.semantic_scores)
    s16 = np.asarray(o16.semantic_scores)
    # bf16 carries ~2-3 decimal digits through a 3-level U-Net
    scale = np.abs(s32).max() + 1e-6
    assert np.abs(s32 - s16).max() / scale < 0.1
    assert np.isfinite(s16).all()

    def loss(params):
        o, _ = m16.apply({"params": params,
                          "batch_stats": variables.get("batch_stats", {})},
                         xyz, feats, train=True, rng=rng,
                         mutable=["batch_stats"])
        return jnp.mean(o.semantic_scores**2) + jnp.mean(o.pt_offsets**2)

    g = jax.grad(loss)(variables["params"])
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(g))


def test_scene_predictor_and_stream():
    """ScenePredictor serving surface: predict / predict_batch /
    predict_stream agree and emit well-formed scene dicts."""
    from gcanet_tpu.data.synthetic import synth_scene_batch
    from gcanet_tpu.serve import ScenePredictor

    cfg = Config(num_points=256, batch_size=2, max_instances=16,
                 grouping=GroupingConfig(radius=0.1, min_npoint=5,
                                         cc_max_iters=16),
                 instance_head=InstanceHeadConfig(grid_size=8,
                                                  max_proposals=16))
    pred = ScenePredictor(cfg, scene_grid=16)
    batch = synth_scene_batch(cfg, 2, seed=5)
    xyz = np.asarray(batch["xyz"], np.float32)
    feats = np.asarray(batch["feats"], np.float32)

    outs = pred.predict_batch(xyz, feats)
    assert len(outs) == 2
    bg_label = (cfg.num_primitives - 1) + pred.cls_offset
    for o in outs:
        assert o["semantic_preds"].shape == (cfg.num_points,)
        assert o["pt_offsets"].shape == (cfg.num_points, 3)
        for inst in o["instances"]:
            assert pred.cls_offset <= inst["label_id"] < bg_label
            assert inst["pred_mask"]["length"] == cfg.num_points

    one = pred.predict(xyz[0], feats[0])
    assert one["semantic_preds"].shape == (cfg.num_points,)

    streamed = list(pred.predict_stream([(xyz, feats), (xyz, feats)]))
    assert len(streamed) == 4
    for g, w in zip(streamed[:2], outs):
        np.testing.assert_array_equal(g["semantic_preds"],
                                      w["semantic_preds"])
        np.testing.assert_array_equal(g["instance_labels"],
                                      w["instance_labels"])
