"""End-to-end trainer smoke: one tiny epoch on synthetic data, checkpoint
save/restore round-trip, eval path, serving predictor."""

import os

import jax
import numpy as np
import pytest

from gcanet_tpu.config import Config, GroupingConfig, InstanceHeadConfig


def tiny_cfg(tmp, **kw):
    base = dict(
        num_points=160, batch_size=2, nn_nb=10, offset_knn=6, offset_keypoints=20,
        max_instances=16, log_dir=os.path.join(tmp, "log"), max_epoch=1,
        eval_interval=1, save_interval=1,
        grouping=GroupingConfig(radius=0.1, min_npoint=5, cc_max_iters=16),
        instance_head=InstanceHeadConfig(grid_size=8, max_proposals=16))
    base.update(kw)
    return Config(**base)


def test_trainer_one_epoch_and_resume(tmp_path):
    from gcanet_tpu.train.trainer import Trainer

    cfg = tiny_cfg(str(tmp_path))
    tr = Trainer(cfg)
    tr.build_dataloaders()
    tr._train_batches = lambda epoch: _synth_iter(cfg, 3)   # short epoch
    tr.train_one_epoch(0)
    miou, type_miou = tr.test_one_epoch(0)
    assert 0.0 <= miou <= 1.0
    tr.save_checkpoint(1, tag="latest", metrics={"miou": miou})

    # results CSV written
    assert os.path.exists(os.path.join(cfg.log_dir, "output_results.csv"))

    # resume picks up the epoch
    tr2 = Trainer(cfg)
    assert tr2.start_epoch == 1


def _synth_iter(cfg, n=3):
    from gcanet_tpu.data.synthetic import synth_batch

    for i in range(n):
        yield synth_batch(cfg, cfg.batch_size, seed=i)


def test_predictor(tmp_path):
    from gcanet_tpu.data.synthetic import synth_object
    from gcanet_tpu.serve import Predictor

    cfg = tiny_cfg(str(tmp_path), batch_size=1)
    pred = Predictor(cfg)
    obj = synth_object(cfg, np.random.RandomState(0))
    out = pred.predict(obj["gt_pc"], obj["gt_normal"])
    assert out["type_per_point"].shape == (cfg.num_points, cfg.num_primitives)
    assert out["instance_labels"].shape == (cfg.num_points,)
    assert np.isfinite(out["param_per_point"]).all()
    assert out["embedding"] is None                  # fast path skips the fetch

    # panoptic fusion surface (dgcnn-4.py:1001-1037): packed cls | id<<16
    out_p = pred.predict(obj["gt_pc"], obj["gt_normal"], panoptic=True)
    pan = out_p["panoptic"]
    assert pan.shape == (cfg.num_points,)
    assert pan.dtype == np.uint32
    ids = pan >> 16
    assert (ids[ids > 0] <= len(out_p["instances"])).all()

    # embedding fetched on request
    out_e = pred.predict(obj["gt_pc"], obj["gt_normal"], return_embedding=True)
    assert out_e["embedding"].shape == (cfg.num_points, cfg.out_dim)


def test_predictor_meanshift_mode(tmp_path):
    from gcanet_tpu.data.synthetic import synth_object
    from gcanet_tpu.serve import Predictor

    cfg = tiny_cfg(str(tmp_path), batch_size=1)
    pred = Predictor(cfg, cluster_mode="meanshift")
    obj = synth_object(cfg, np.random.RandomState(1))
    out = pred.predict(obj["gt_pc"], obj["gt_normal"])
    assert out["instance_labels"].shape == (cfg.num_points,)
    assert out["instance_labels"].min() >= 0


def test_scalar_logger_histogram(tmp_path):
    from gcanet_tpu.train.trainer import ScalarLogger
    import json as _json

    lg = ScalarLogger(str(tmp_path), "t")
    lg.log_histogram("grads", np.random.RandomState(0).randn(1000), step=3)
    rec = _json.loads(open(lg.path).read().strip())
    assert rec["histogram"] == "grads" and len(rec["counts"]) == 16


def test_predictor_batch(tmp_path):
    from gcanet_tpu.data.synthetic import synth_object
    from gcanet_tpu.serve import Predictor

    cfg = tiny_cfg(str(tmp_path), batch_size=2)
    pred = Predictor(cfg)
    rng = np.random.RandomState(3)
    a, b = synth_object(cfg, rng), synth_object(cfg, rng)
    xyz = np.stack([a["gt_pc"], b["gt_pc"]])
    nrm = np.stack([a["gt_normal"], b["gt_normal"]])
    outs = pred.predict_batch(xyz, nrm)
    assert len(outs) == 2
    for o in outs:
        assert o["type_per_point"].shape == (cfg.num_points, cfg.num_primitives)
        assert o["instance_labels"].shape == (cfg.num_points,)
        assert o["pt_offsets"].shape == (cfg.num_points, 3)
        # local instance ids are compact 0..K
        ids = np.unique(o["instance_labels"])
        assert ids.max() + 1 >= len(ids) - (0 in ids)
        # every listed instance's mask points carry its local id count
        for k, inst in enumerate(o["instances"]):
            assert inst["pred_mask"]["length"] == cfg.num_points

    # identical clouds in one batch -> identical outputs
    outs2 = pred.predict_batch(np.stack([a["gt_pc"], a["gt_pc"]]),
                               np.stack([a["gt_normal"], a["gt_normal"]]))
    np.testing.assert_array_equal(outs2[0]["instance_labels"],
                                  outs2[1]["instance_labels"])
    assert len(outs2[0]["instances"]) == len(outs2[1]["instances"])


def test_predictor_stream_matches_batch(tmp_path):
    """predict_stream (pipelined dispatch) must yield exactly
    predict_batch's outputs, in order, across multiple batches."""
    from gcanet_tpu.data.synthetic import synth_object
    from gcanet_tpu.serve import Predictor

    cfg = tiny_cfg(str(tmp_path), batch_size=2)
    pred = Predictor(cfg)
    rng = np.random.RandomState(7)
    batches = []
    for _ in range(3):
        a, b = synth_object(cfg, rng), synth_object(cfg, rng)
        batches.append((np.stack([a["gt_pc"], b["gt_pc"]]),
                        np.stack([a["gt_normal"], b["gt_normal"]])))

    want = [o for xyz, nrm in batches for o in pred.predict_batch(xyz, nrm)]
    got = list(pred.predict_stream(iter(batches)))
    assert len(got) == len(want) == 6
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g["instance_labels"],
                                      w["instance_labels"])
        np.testing.assert_allclose(g["type_per_point"], w["type_per_point"])
        assert len(g["instances"]) == len(w["instances"])


def test_predictor_mesh_serving(tmp_path):
    """Data-parallel serving: predict_batch over a 2-device mesh equals the
    single-device result (params replicated, batch axis sharded)."""
    from gcanet_tpu.data.synthetic import synth_object
    from gcanet_tpu.serve import Predictor

    cfg = tiny_cfg(str(tmp_path), batch_size=2)
    rng = np.random.RandomState(11)
    a, b = synth_object(cfg, rng), synth_object(cfg, rng)
    xyz = np.stack([a["gt_pc"], b["gt_pc"]])
    nrm = np.stack([a["gt_normal"], b["gt_normal"]])

    single = Predictor(cfg).predict_batch(xyz, nrm)
    meshed_pred = Predictor(cfg.replace(mesh_shape="2"))
    assert meshed_pred.mesh is not None
    meshed = meshed_pred.predict_batch(xyz, nrm)
    for g, w in zip(meshed, single):
        np.testing.assert_array_equal(g["instance_labels"],
                                      w["instance_labels"])
        np.testing.assert_allclose(g["type_per_point"], w["type_per_point"],
                                   rtol=2e-4, atol=1e-5)

    import pytest as _pytest
    with _pytest.raises(ValueError):
        meshed_pred.predict(xyz[0], nrm[0])
