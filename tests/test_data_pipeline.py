"""Real-data-path tests: h5 round trip through the full ABC pipeline, CLI
parsing, augmentations, and exact-kNN parity mode."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from gcanet_tpu.config import Config, GroupingConfig, InstanceHeadConfig, build_option
from gcanet_tpu.data import process_abc
from gcanet_tpu.data.abc_dataset import ABCDataset, collate, load_h5_object, process_object


def _write_fake_abc(root, names, n_raw=900, seed=0):
    rng = np.random.RandomState(seed)
    os.makedirs(root, exist_ok=True)
    for name in names:
        pts = rng.rand(n_raw, 3).astype(np.float32)
        normals = rng.randn(n_raw, 3).astype(np.float32)
        normals /= np.linalg.norm(normals, axis=1, keepdims=True)
        labels = rng.randint(0, 4, n_raw)          # instances, some small
        labels[labels == 3] = rng.randint(5, 8, (labels == 3).sum())  # tiny ones
        prim = rng.choice([1, 4, 5, 7, 8, 9], n_raw)
        t_param = rng.randn(n_raw, 22).astype(np.float32)
        process_abc.pack_h5(os.path.join(root, f"{name}.h5"),
                            pts, labels, normals, prim, t_param)
    with open(os.path.join(root, "train_data.txt"), "w") as f:
        f.write("\n".join(names) + "\n")


def test_h5_roundtrip_and_processing(tmp_path):
    root = str(tmp_path)
    _write_fake_abc(root, ["00001", "00002"])
    cfg = Config(num_points=256, max_instances=16, num_primitives=7)
    raw = load_h5_object(os.path.join(root, "00001.h5"))
    assert raw["points"].shape == (900, 3)
    item = process_object(raw, cfg, training=False, rng=np.random.RandomState(0))
    assert item["gt_pc"].shape == (256, 3)
    # class folding applied: no 7/8/9 labels survive in T_gt
    assert not np.isin(item["T_gt"], [7, 8, 9]).any()
    # background instances marked -1, kept ids compact
    kept = item["I_gt"][item["I_gt"] >= 0]
    if kept.size:
        assert kept.max() == len(np.unique(kept)) - 1
    # offsets point to instance centroids
    for i in np.unique(kept):
        idx = item["I_gt"] == i
        np.testing.assert_allclose(
            item["pt_offset_label"][idx],
            item["gt_pc"][idx].mean(0) - item["gt_pc"][idx], atol=1e-4)


def test_dataset_batches_and_train_step(tmp_path):
    from gcanet_tpu.data.synthetic import synth_batch  # noqa: F401 (env warm)
    from gcanet_tpu.models.primitive_net import PrimitiveNet
    from gcanet_tpu.train import step as step_lib

    root = str(tmp_path)
    _write_fake_abc(root, ["00001", "00002", "00003", "00004"])
    cfg = Config(num_points=192, batch_size=2, max_instances=16, nn_nb=10,
                 offset_knn=6, offset_keypoints=20, data_path=root,
                 grouping=GroupingConfig(radius=0.1, min_npoint=5, cc_max_iters=16),
                 instance_head=InstanceHeadConfig(grid_size=8, max_proposals=16))
    ds = ABCDataset(root, "train_data.txt", cfg, training=True)
    batches = list(ds.batches(2, shuffle=True, seed=0))
    assert len(batches) == 2
    b = batches[0]
    assert b["gt_pc"].shape == (2, 192, 3)
    assert b["instance_pointnum"].shape == (32,)

    model = PrimitiveNet(cfg)
    tx = step_lib.make_optimizer(cfg)
    state = step_lib.init_state(cfg, model, tx, jax.random.PRNGKey(0))
    train_step = step_lib.make_train_step(cfg, model, tx)
    arrays = {k: jnp.asarray(v) for k, v in b.items() if k != "index"}
    state, metrics = train_step(state, arrays, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["total_loss"]))


def test_cli_build_option_reference_flags():
    cfg = build_option([
        "--num_primitives", "7", "--mode", "5", "--batch_size", "3",
        "--loss_class", "frpn", "--learning_rate", "0.001",
        "--lr_decay_steps", "20,30,40", "--model_dict",
        "models.dgcnn-hais-concat-direct-4", "--eval"])
    assert cfg.num_primitives == 7 and cfg.batch_size == 3
    assert cfg.eval is True
    assert cfg.lr_decay_step_list == (20, 30, 40)
    from gcanet_tpu.models.registry import build_model

    assert build_model(cfg) is not None


def test_cli_max_proposals_flag():
    # TPU default is 100 (A/B-validated, BASELINE.md); reference parity cap
    # (dgcnn-4.py:575) stays one flag away.
    assert build_option([]).instance_head.max_proposals == 100
    cfg = build_option(["--max_proposals", "200"])
    assert cfg.instance_head.max_proposals == 200


def test_augmentations_shapes():
    from gcanet_tpu.data.augment import AUGMENT_ROUTINES

    pts = np.random.RandomState(0).rand(1, 100, 3).astype(np.float32)
    for fn in AUGMENT_ROUTINES:
        out = fn(pts)
        assert out.shape == pts.shape and np.isfinite(out).all()


def test_exact_knn_parity_mode():
    from gcanet_tpu.models.primitive_net import PrimitiveNet
    from gcanet_tpu.train import step as step_lib

    cfg = Config(num_points=128, batch_size=1, nn_nb=8, offset_knn=4,
                 offset_keypoints=16, max_instances=8, knn_impl="xla",
                 grouping=GroupingConfig(radius=0.1, min_npoint=5, cc_max_iters=16),
                 instance_head=InstanceHeadConfig(grid_size=8, max_proposals=8))
    model = PrimitiveNet(cfg)
    rng = jax.random.PRNGKey(0)
    xyz = jax.random.uniform(rng, (1, 128, 3))
    nrm = jax.random.normal(rng, (1, 128, 3))
    nrm = nrm / jnp.linalg.norm(nrm, axis=-1, keepdims=True)
    v = model.init({"params": rng}, xyz, nrm, train=False, rng=rng)
    out = model.apply(v, xyz, nrm, train=False, rng=rng)
    assert np.isfinite(np.asarray(out.type_per_point)).all()
