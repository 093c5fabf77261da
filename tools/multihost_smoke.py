#!/usr/bin/env python
"""Real multi-process smoke of the multi-host training path.

Launch N copies of this script (one per "host"), each with:
  GCA_COORDINATOR=127.0.0.1:<port>  GCA_NUM_PROCESSES=N  GCA_PROCESS_ID=i
  XLA_FLAGS=--xla_force_host_platform_device_count=<devices per process>

Each process then exercises exactly what a multi-host trainer run does —
jax.distributed init from env, a global (process, id)-ordered mesh over ALL
processes' devices, per-process shard loading + instance-id rebase, a
shard_map train step with psum'd grads over global arrays, collect_results
and the count-weighted AverageMeter — and prints MULTIHOST_SMOKE_OK.

This is the one path the single-process test suite can only simulate
(tests/test_multihost.py checks the rank algebra); here the gRPC coordinator,
make_array_from_process_local_data and the cross-process allgathers actually
run.  tests/test_multihost_real.py drives it as subprocesses.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # ad-hoc script: pin explicitly

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    family = sys.argv[1] if len(sys.argv) > 1 else "abc"
    from gcanet_tpu.parallel.dist import (AverageMeter, collect_results,
                                          get_dist_info, maybe_init_from_env)

    assert maybe_init_from_env(), "GCA_* env not set"
    rank, world = get_dist_info()
    assert world == int(os.environ["GCA_NUM_PROCESSES"])

    from gcanet_tpu.config import Config, GroupingConfig, InstanceHeadConfig
    from gcanet_tpu.data.synthetic import synth_batch, synth_scene_batch
    from gcanet_tpu.train import scene_step, step as step_lib

    n_dev = jax.device_count()              # global, across processes
    cfg = Config(num_points=96, batch_size=n_dev, nn_nb=8, offset_knn=4,
                 offset_keypoints=12, max_instances=8, mesh_shape=str(n_dev),
                 grouping=GroupingConfig(radius=0.1, min_npoint=5,
                                         cc_max_iters=8),
                 instance_head=InstanceHeadConfig(grid_size=8,
                                                  max_proposals=8))
    if family == "scene_trainer":
        # full SceneTrainer.train(): scene shard loading, mesh'd scene steps,
        # rank-strided eval whose merged scene set feeds ScanNet AP/PQ
        # matching identically on every process
        import tempfile

        from gcanet_tpu.train.scene_trainer import SceneTrainer

        log_dir = os.path.join(
            tempfile.gettempdir(),
            f"mh_scenetr_{os.environ['GCA_COORDINATOR'].split(':')[1]}")
        cfg = cfg.replace(log_dir=log_dir, max_epoch=1, eval_interval=1,
                          save_interval=1, data_path="/nonexistent",
                          model_dict="softgroup.model.softgroup")
        trainer = SceneTrainer(cfg)
        # trim the synthetic epoch (32 batches) to 4 — the smoke validates the
        # cross-process machinery, not throughput; keep every rank symmetric
        import itertools

        orig = trainer._train_batches
        trainer._train_batches = \
            lambda epoch: itertools.islice(orig(epoch), 4)
        trainer.train()
        assert os.path.isdir(os.path.join(trainer.ckpt_dir, "latest"))
        if rank == 0:
            assert os.path.exists(os.path.join(log_dir, "output_results.csv"))
        print(f"MULTIHOST_SMOKE_OK family=scene_trainer rank={rank}/{world} "
              f"devices={n_dev}", flush=True)
        return
    if family == "trainer":
        # the FULL Trainer.train() for one epoch: per-process shard loading,
        # mesh'd train steps, rank-strided eval + merged metrics, and every
        # orbax checkpoint tag (latest/eval0/max_*) saved with ALL processes
        # participating (orbax coordinates global-array writes), plus
        # main-process-only pruning/CSV/meta.json
        import tempfile

        from gcanet_tpu.train.trainer import Trainer

        log_dir = os.path.join(tempfile.gettempdir(),
                               f"mh_trainer_{os.environ['GCA_COORDINATOR'].split(':')[1]}")
        cfg = cfg.replace(log_dir=log_dir, max_epoch=1, eval_interval=1,
                          save_interval=1, data_path="/nonexistent")
        trainer = Trainer(cfg)
        trainer.train()
        for tag in ("latest", "eval0", "max_miou"):
            assert os.path.isdir(os.path.join(trainer.ckpt_dir, tag)), tag
        if rank == 0:
            assert os.path.exists(os.path.join(log_dir, "output_results.csv"))
        print(f"MULTIHOST_SMOKE_OK family=trainer rank={rank}/{world} "
              f"devices={n_dev}", flush=True)
        return
    tx = step_lib.make_optimizer(cfg)
    mesh = step_lib.make_mesh(cfg)
    assert mesh is not None and mesh.devices.size == n_dev
    local_bs = cfg.batch_size // world
    if family == "scene":
        # mirrors SceneTrainer: scene model/step + scene synthetic shards
        from gcanet_tpu.models.softgroup_scene import SoftGroupNet

        model = SoftGroupNet(cfg, scene_grid=8, channels=8)
        state = scene_step.init_scene_state(cfg, model, tx,
                                            jax.random.PRNGKey(0))
        train_step = scene_step.make_scene_train_step(cfg, model, tx, mesh)
        local = {k: np.asarray(v) for k, v in
                 synth_scene_batch(cfg, local_bs, seed=100 + rank).items()
                 if k != "index"}
    else:
        from gcanet_tpu.models.primitive_net import PrimitiveNet

        model = PrimitiveNet(cfg)
        state = step_lib.init_state(cfg, model, tx, jax.random.PRNGKey(0))
        train_step = step_lib.make_train_step(cfg, model, tx, mesh)
        # per-process shard: same slicing the Trainer does (_train_batches)
        local = {k: np.asarray(v) for k, v in
                 synth_batch(cfg, local_bs, seed=100 + rank).items()
                 if k != "index"}
    local = step_lib.rebase_local_batch(local, rank, world, cfg.max_instances)

    state = step_lib.replicate_to_mesh(state, mesh)
    rng = step_lib.replicate_to_mesh(jax.random.PRNGKey(1), mesh)
    batch = step_lib.make_global_batch(mesh, local)

    losses = []
    for _ in range(2):
        state, metrics = train_step(state, batch, rng)
        losses.append(float(metrics["total_loss"]))
    assert all(l == l for l in losses), f"NaN loss: {losses}"

    # cross-process result gather (pickle-pad allgather) with asymmetric
    # payloads per rank
    merged = collect_results([{"rank": rank, "pad": "x" * (10 + 97 * rank)}])
    assert sorted(m["rank"] for m in merged) == list(range(world)), merged

    # count-weighted average: rank r contributes value r with count (r+1)
    meter = AverageMeter(apply_dist_reduce=True)
    meter.update(float(rank), n=rank + 1)
    expect = (sum(r * (r + 1) for r in range(world))
              / sum(r + 1 for r in range(world)))
    got = meter.get_avg()
    assert abs(got - expect) < 1e-6, (got, expect)

    print(f"MULTIHOST_SMOKE_OK family={family} rank={rank}/{world} "
          f"devices={n_dev} losses={losses[0]:.4f},{losses[1]:.4f}",
          flush=True)


if __name__ == "__main__":
    main()
