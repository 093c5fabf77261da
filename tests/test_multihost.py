"""Multi-host data-feed wiring tests (single-process, virtual 8-CPU mesh).

The real multi-process path cannot run under one pytest process, but every
piece of it can: per-rank shard selection (the DistributedSampler replacement,
softgroup/util/dist.py:51-76), instance-id rebasing so per-rank collation
composes with the in-step axis_index rebase, the pickle-pad-allgather result
collection, and global-array assembly for a mesh-jit.
"""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gcanet_tpu.config import Config, GroupingConfig, InstanceHeadConfig
from gcanet_tpu.data.abc_dataset import ABCDataset
from gcanet_tpu.parallel import dist
from gcanet_tpu.train import step as step_lib

from tests.test_data_pipeline import _write_fake_abc


def test_shard_bounds_partition():
    # chunks tile [0, B) exactly, in rank order
    spans = [dist.shard_bounds(8, r, 4) for r in range(4)]
    assert spans == [(0, 2), (2, 4), (4, 6), (6, 8)]
    with pytest.raises(ValueError):
        dist.shard_bounds(6, 0, 4)


def test_collect_results_roundtrip_padded():
    # simulate world=3 with different-size pickles: pad to max, gather, decode
    parts = [[{"scan": "a", "miou": 0.5}], [("b", 1, 2), ("c", 3, 4)], []]
    encoded = [dist._encode_part(p) for p in parts]
    sizes = np.asarray([[e.size] for e in encoded], np.int64)
    maxlen = int(sizes.max())
    rows = np.zeros((3, maxlen), np.uint8)
    for i, e in enumerate(encoded):
        rows[i, : e.size] = e
    merged = dist._decode_rows(rows, sizes)
    assert merged == parts[0] + parts[1] + parts[2]


def test_collect_results_single_process_identity():
    part = [1, "two", {"three": 3}]
    assert dist.collect_results(part) is part


def _mk_cfg(root, batch_size):
    return Config(num_points=128, batch_size=batch_size, max_instances=8,
                  nn_nb=8, offset_knn=6, offset_keypoints=16, data_path=root,
                  grouping=GroupingConfig(radius=0.1, min_npoint=5,
                                          cc_max_iters=8),
                  instance_head=InstanceHeadConfig(grid_size=8,
                                                   max_proposals=8))


def test_sharded_batches_compose_to_global(tmp_path):
    """Per-rank loading + rebase must reproduce the single-process global
    batch exactly (same seed -> same order on every rank)."""
    root = str(tmp_path)
    _write_fake_abc(root, [f"{i:05d}" for i in range(1, 9)])
    cfg = _mk_cfg(root, batch_size=4)
    ds = ABCDataset(root, "train_data.txt", cfg, training=False)

    world = 2
    full = list(ds.batches(4, shuffle=True, seed=3))
    parts = [list(ds.batches(4, shuffle=True, seed=3, shard=(r, world)))
             for r in range(world)]
    assert len(parts[0]) == len(full)
    for bi, g in enumerate(full):
        locs = [step_lib.rebase_local_batch(parts[r][bi], r, world,
                                            cfg.max_instances)
                for r in range(world)]
        for key in g:
            if key == "index":
                assert sum((p["index"] for p in locs), []) == g["index"]
                continue
            cat = np.concatenate([np.asarray(p[key]) for p in locs])
            np.testing.assert_array_equal(cat, np.asarray(g[key]), err_msg=key)


def test_eval_stride_partitions_batches(tmp_path):
    root = str(tmp_path)
    _write_fake_abc(root, [f"{i:05d}" for i in range(1, 7)])
    cfg = _mk_cfg(root, batch_size=1)
    ds = ABCDataset(root, "train_data.txt", cfg, training=False)
    full = [b["index"][0] for b in ds.batches(1, shuffle=False)]
    strided = [[b["index"][0]
                for b in ds.batches(1, shuffle=False, stride=(r, 2))]
               for r in range(2)]
    assert strided[0] == full[0::2] and strided[1] == full[1::2]


def test_global_batch_assembly_matches_plain_arrays():
    """A mesh train step fed via make_global_batch/replicate_to_mesh must give
    the same metrics as plain device arrays (single-process equivalence of the
    multi-host feed path)."""
    from gcanet_tpu.data.synthetic import synth_batch
    from gcanet_tpu.models.primitive_net import PrimitiveNet

    n_dev = min(len(jax.devices()), 2)
    if n_dev < 2:
        pytest.skip("needs multiple (virtual) devices")
    cfg = Config(num_points=96, batch_size=n_dev, max_instances=8, nn_nb=8,
                 offset_knn=6, offset_keypoints=16, mesh_shape=str(n_dev),
                 grouping=GroupingConfig(radius=0.1, min_npoint=5,
                                         cc_max_iters=8),
                 instance_head=InstanceHeadConfig(grid_size=8, max_proposals=8))
    model = PrimitiveNet(cfg)
    tx = step_lib.make_optimizer(cfg)
    mesh = step_lib.make_mesh(cfg)
    assert mesh is not None
    step = step_lib.make_train_step(cfg, model, tx, mesh)
    raw = synth_batch(cfg, cfg.batch_size, seed=11)
    raw.pop("index", None)

    state_a = step_lib.init_state(cfg, model, tx, jax.random.PRNGKey(0))
    plain = {k: jnp.asarray(v) for k, v in raw.items()}
    _, m_plain = step(state_a, plain, jax.random.PRNGKey(1))

    state_b = step_lib.replicate_to_mesh(
        step_lib.init_state(cfg, model, tx, jax.random.PRNGKey(0)), mesh)
    gbatch = step_lib.make_global_batch(mesh, raw)
    for v in gbatch.values():
        assert v.sharding.spec == jax.sharding.PartitionSpec("data")
    rng = step_lib.replicate_to_mesh(jax.random.PRNGKey(1), mesh)
    state_b, m_global = step(state_b, gbatch, rng)

    for k in m_plain:
        np.testing.assert_allclose(np.asarray(m_plain[k]),
                                   np.asarray(m_global[k]),
                                   rtol=1e-5, atol=1e-6, err_msg=k)
    # and the updated state stays consumable by the next step
    _, m2 = step(state_b, gbatch, rng)
    assert np.isfinite(float(m2["total_loss"]))


def test_rebase_local_batch_rank0_and_negative_ids():
    batch = {"gt_pc": np.zeros((2, 4, 3)),
             "I_gt_global": np.array([[0, 5, -1, 3], [8, -1, 2, 0]])}
    same = step_lib.rebase_local_batch(batch, 0, 2, 8)
    np.testing.assert_array_equal(same["I_gt_global"], batch["I_gt_global"])
    shifted = step_lib.rebase_local_batch(batch, 1, 2, 8)
    expect = np.where(batch["I_gt_global"] >= 0,
                      batch["I_gt_global"] + 16, -1)
    np.testing.assert_array_equal(shifted["I_gt_global"], expect)


def _mk_scene_root(tmp_path, n_scenes=8):
    from tests.test_scene_dataset import _write_scene

    d = tmp_path / "train"
    d.mkdir()
    for i in range(n_scenes):
        _write_scene(d / f"scene{i:04d}.npz", seed=i)
    return str(tmp_path)


def _scene_cfg(root):
    return Config(num_points=256, batch_size=4, max_instances=8,
                  data_path=root,
                  grouping=GroupingConfig(radius=0.1, min_npoint=5,
                                          cc_max_iters=8),
                  instance_head=InstanceHeadConfig(grid_size=8,
                                                   max_proposals=8))


def test_scene_sharded_batches_compose_to_global(tmp_path):
    """Scene-family per-rank loading + rebase reproduces the single-process
    global batch (same fixed windows, slot-deterministic crop RNG)."""
    from gcanet_tpu.data import scene_dataset as sd

    root = _mk_scene_root(tmp_path)
    cfg = _scene_cfg(root)
    ds = sd.SceneDataset(root, "train", ".npz", cfg, training=True,
                         max_npoint=10000, min_npoint=10)

    world = 2
    full = list(ds.batches(4, shuffle=True, seed=3))
    parts = [list(ds.batches(4, shuffle=True, seed=3, shard=(r, world)))
             for r in range(world)]
    assert len(full) >= 1
    assert all(len(p) == len(full) for p in parts)  # aligned counts
    for bi, g in enumerate(full):
        locs = [step_lib.rebase_local_batch(parts[r][bi], r, world,
                                            cfg.max_instances)
                for r in range(world)]
        for key in g:
            if key == "index":
                assert sum((p["index"] for p in locs), []) == g["index"]
                continue
            cat = np.concatenate([np.asarray(p[key]) for p in locs])
            np.testing.assert_array_equal(cat, np.asarray(g[key]), err_msg=key)


def test_scene_eval_stride_partitions_batches(tmp_path):
    from gcanet_tpu.data import scene_dataset as sd

    root = _mk_scene_root(tmp_path, n_scenes=6)
    cfg = _scene_cfg(root)
    ds = sd.SceneDataset(root, "train", ".npz", cfg, training=False,
                         max_npoint=10000, min_npoint=10)
    full = [b["index"][0] for b in ds.batches(1, shuffle=False)]
    strided = [[b["index"][0]
                for b in ds.batches(1, shuffle=False, stride=(r, 2))]
               for r in range(2)]
    assert strided[0] == full[0::2] and strided[1] == full[1::2]
