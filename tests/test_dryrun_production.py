"""Production-ratio multichip dryrun (round-2 verdict item 6).

The driver's dryrun artifact runs tiny shapes (N=160, nn_nb=12) — that
validates the sharding algebra but not shape-dependent sharding bugs.  This
slow test jits the FULL flagship train step over the conftest's 8-device
virtual CPU mesh at production ratios (N=2048, K=48/inner-32, full offset
module, p=100) and runs one step.  ~10 min on a 1-core host; the int32
proposal-rank bound is asserted inside build_proposals at these shapes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

N_DEV = 8


@pytest.mark.skipif(jax.device_count() < N_DEV,
                    reason="needs the 8-device virtual CPU mesh")
def test_production_shape_mesh_step():
    import __graft_entry__ as ge
    from gcanet_tpu.data.synthetic import synth_batch
    from gcanet_tpu.models.primitive_net import PrimitiveNet
    from gcanet_tpu.train import step as step_lib

    cfg = ge.dryrun_config(N_DEV, tier="production")
    assert cfg.num_points >= 2048 and cfg.nn_nb == 48
    model = PrimitiveNet(cfg)
    tx = step_lib.make_optimizer(cfg)
    state = step_lib.init_state(cfg, model, tx, jax.random.PRNGKey(0))
    mesh = step_lib.make_mesh(cfg)
    assert mesh is not None and mesh.devices.size == N_DEV
    train_step = step_lib.make_train_step(cfg, model, tx, mesh)
    batch = {k: jnp.asarray(v) for k, v in
             synth_batch(cfg, cfg.batch_size, seed=0).items()
             if k != "index"}
    state, metrics = train_step(state, batch, jax.random.PRNGKey(1))
    total = float(metrics["total_loss"])
    assert np.isfinite(total)
