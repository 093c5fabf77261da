"""Torch-checkpoint -> flax converter (tools/import_reference_ckpt.py).

The reference checkpoints ``{epoch, model_state_dict, optimizer_state_dict}``
(trainer_new.py:420-445); ``make_synthetic_state_dict`` builds a state_dict
with exactly the documented mode-5 flagship shapes so the mapping is testable
without a trained reference checkpoint.
"""

import jax
import jax.numpy as jnp
import numpy as np

from gcanet_tpu.config import Config
from gcanet_tpu.models.primitive_net import PrimitiveNet
from gcanet_tpu.train import step as step_lib
from gcanet_tpu.utils.import_torch import (convert_state_dict,
                                           make_synthetic_state_dict)


def _small_cfg():
    return Config(num_points=256, batch_size=1, nn_nb=16,
                  num_primitives=7, out_dim=64)


def test_convert_covers_all_reference_keys():
    cfg = _small_cfg()
    model = PrimitiveNet(cfg)
    tx = step_lib.make_optimizer(cfg)
    state = step_lib.init_state(cfg, model, tx, jax.random.PRNGKey(0))
    sd = make_synthetic_state_dict()
    params, batch_stats, report = convert_state_dict(
        sd, state.params, state.batch_stats, mode=cfg.mode)
    # every reference tensor either maps or is a documented dead/dup key
    assert not report.unmatched, report.unmatched
    assert len(report.mapped) > 100
    # a converted weight actually landed (not the template init)
    ref = sd["affinitynet.cls_linear.weight"]
    got = np.asarray(params["InstanceHead_0"]["Dense_0"]["kernel"])
    np.testing.assert_allclose(got, ref.T, rtol=1e-6)
    # batch_stats carried running stats
    bs = np.asarray(
        batch_stats["InstanceHead_0"]["MaskedBatchNorm_0"]["mean"])
    np.testing.assert_allclose(
        bs, sd["affinitynet.tiny_unet_outputlayer.0.running_mean"], rtol=1e-6)


def test_converted_model_forward_runs():
    cfg = _small_cfg()
    model = PrimitiveNet(cfg)
    tx = step_lib.make_optimizer(cfg)
    state = step_lib.init_state(cfg, model, tx, jax.random.PRNGKey(0))
    params, batch_stats, report = convert_state_dict(
        make_synthetic_state_dict(), state.params, state.batch_stats,
        mode=cfg.mode)
    assert not report.unmatched
    rng = jax.random.PRNGKey(0)
    xyz = jax.random.uniform(rng, (1, cfg.num_points, 3))
    nrm = jax.random.normal(rng, (1, cfg.num_points, 3))
    nrm = nrm / jnp.linalg.norm(nrm, axis=-1, keepdims=True)
    out = model.apply({"params": params, "batch_stats": batch_stats},
                      xyz, nrm, train=False, rng=rng)
    assert out.type_per_point.shape == (1, cfg.num_points, cfg.num_primitives)
    assert np.isfinite(np.asarray(out.pt_offsets)).all()
