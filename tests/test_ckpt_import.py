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


def test_export_round_trip_bit_exact():
    """flax -> torch export inverts the importer exactly: every mapped
    tensor survives import(export(import(sd))) bit-for-bit, at the exact
    reference storage shapes (tools/export_reference_ckpt.py)."""
    from gcanet_tpu.utils.import_torch import export_state_dict

    cfg = _small_cfg()
    model = PrimitiveNet(cfg)
    tx = step_lib.make_optimizer(cfg)
    state = step_lib.init_state(cfg, model, tx, jax.random.PRNGKey(0))
    ref_sd = make_synthetic_state_dict()
    params, batch_stats, _ = convert_state_dict(
        ref_sd, state.params, state.batch_stats, mode=cfg.mode)

    sd, report = export_state_dict(params, batch_stats)
    assert not report.missing, report.missing
    assert len(report.mapped) > 100
    # exact reference storage shapes for EVERY checkpointed key
    assert set(sd) == set(ref_sd)
    for k in ref_sd:
        assert sd[k].shape == np.asarray(ref_sd[k]).shape, k
    # mapped tensors round-trip bit-exact
    for k in report.mapped:
        np.testing.assert_array_equal(
            sd[k], np.asarray(ref_sd[k], np.float32), err_msg=k)
    # dead weights / counters ship as neutral defaults
    assert sd["affinitynet.mlp_squeeze_output_feature.weight"].sum() == 0
    assert sd["affinitynet.tiny_unet_outputlayer.0.num_batches_tracked"] == 0


def test_export_torch_payload_loads():
    """save_reference_checkpoint writes the exact trainer_new.py:420-445
    payload and torch.load restores it."""
    import os
    import tempfile

    import torch

    from gcanet_tpu.utils.import_torch import save_reference_checkpoint

    cfg = _small_cfg()
    model = PrimitiveNet(cfg)
    tx = step_lib.make_optimizer(cfg)
    state = step_lib.init_state(cfg, model, tx, jax.random.PRNGKey(0))
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "checkpoint_eval3.tar")
        save_reference_checkpoint(path, state.params, state.batch_stats,
                                  epoch=3)
        payload = torch.load(path, map_location="cpu", weights_only=False)
    assert payload["epoch"] == 3
    assert payload["optimizer_state_dict"] == {}
    sd = payload["model_state_dict"]
    ref_shapes = make_synthetic_state_dict()
    assert set(sd) == set(ref_shapes)
    w = sd["affinitynet.cls_linear.weight"]
    assert isinstance(w, torch.Tensor) and w.dtype == torch.float32
    np.testing.assert_allclose(
        w.numpy(),
        np.asarray(state.params["InstanceHead_0"]["Dense_0"]["kernel"]).T,
        rtol=1e-6)
