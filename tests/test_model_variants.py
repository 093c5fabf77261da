"""Training smoke for the non-flagship model families: the dual-attention
variant trains through the standard step; SPPNet trains with its head-only
losses; dist helpers behave single-process."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gcanet_tpu.config import Config, GroupingConfig, InstanceHeadConfig
from gcanet_tpu.data.synthetic import synth_batch
from gcanet_tpu.losses import losses as L
from gcanet_tpu.train import step as step_lib


def _cfg(**kw):
    base = dict(num_points=160, batch_size=2, nn_nb=10, offset_knn=6,
                offset_keypoints=20, max_instances=16,
                grouping=GroupingConfig(radius=0.1, min_npoint=5, cc_max_iters=16),
                instance_head=InstanceHeadConfig(grid_size=8, max_proposals=16))
    base.update(kw)
    return Config(**base)


def test_dual_variant_trains():
    from gcanet_tpu.models.registry import build_model

    cfg = _cfg(model_dict="models.dgcnn-hais-concat-direct-2")
    model = build_model(cfg)
    tx = step_lib.make_optimizer(cfg.replace(offset_variant="dual"))
    state = step_lib.init_state(cfg.replace(offset_variant="dual"), model, tx,
                                jax.random.PRNGKey(0))
    step = step_lib.make_train_step(cfg.replace(offset_variant="dual"), model, tx)
    batch = {k: jnp.asarray(v) for k, v in synth_batch(cfg, 2, seed=0).items()
             if k != "index"}
    losses = []
    for i in range(3):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["total_loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_sppnet_trains_with_head_losses():
    from gcanet_tpu.models.sppnet import PrimitiveNetSPP

    cfg = _cfg(mode=5)
    model = PrimitiveNetSPP(cfg, num_primitives=cfg.num_primitives)
    rng = jax.random.PRNGKey(0)
    batch = synth_batch(cfg, 2, seed=1)
    xyz = jnp.asarray(batch["gt_pc"])
    nrm = jnp.asarray(batch["gt_normal"])
    variables = model.init({"params": rng}, xyz, nrm, train=True)
    params = variables["params"]
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    t_gt = jnp.asarray(batch["T_gt"])
    t_param = jnp.asarray(batch["T_param"])
    i_gt = jnp.asarray(batch["I_gt"])
    n_gt = nrm

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            out = model.apply({"params": p}, xyz, nrm, train=True)
            feat, _, _ = L.compute_embedding_loss(out.embedding, i_gt, 16)
            nll = L.compute_nnl_loss(out.type_per_point, t_gt)
            par = L.compute_param_loss(out.param_per_point, t_gt, t_param)
            nrm_l = L.compute_normal_loss(out.normal_per_point, n_gt)
            return 2.0 * feat + 2.0 * nll + 0.5 * par + nrm_l

        loss, g = jax.value_and_grad(loss_fn)(params)
        upd, opt_state = tx.update(g, opt_state, params)
        return optax.apply_updates(params, upd), opt_state, loss

    losses = []
    for _ in range(4):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_dist_helpers_single_process():
    from gcanet_tpu.parallel.dist import (AverageMeter, collect_results,
                                          get_dist_info, is_main_process)

    assert get_dist_info() == (0, 1)
    assert is_main_process()
    assert collect_results([1, 2, 3]) == [1, 2, 3]
    m = AverageMeter()
    m.update(2.0)
    m.update(4.0, n=3)
    assert abs(m.get_avg() - 3.5) < 1e-9
    assert m.get_val() == 4.0
