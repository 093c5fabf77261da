"""Scene trainer end-to-end: one tiny epoch on synthetic scenes, eval with
semantic mIoU + instance AP, checkpoint + resume."""

import os

import numpy as np

from gcanet_tpu.config import Config, GroupingConfig, InstanceHeadConfig


def _cfg(tmp):
    return Config(num_points=192, batch_size=2, max_instances=8,
                  model_dict="softgroup.model.softgroup",
                  log_dir=os.path.join(tmp, "log"), max_epoch=1,
                  eval_interval=1, save_interval=1,
                  grouping=GroupingConfig(radius=0.1, min_npoint=5,
                                          cc_max_iters=8),
                  instance_head=InstanceHeadConfig(grid_size=8,
                                                   max_proposals=8))


def test_scene_trainer_epoch_eval_resume(tmp_path):
    from gcanet_tpu.train.scene_trainer import SceneTrainer

    cfg = _cfg(str(tmp_path))
    tr = SceneTrainer(cfg)
    tr.build_dataloaders()
    assert tr.train_data is None          # synthetic fallback
    tr._train_batches = lambda epoch: _short_iter(cfg, 3)
    n = tr.train_one_epoch(0)
    assert n == 3
    miou, ap50 = tr.test_one_epoch(0)
    assert 0.0 <= miou <= 1.0
    assert 0.0 <= ap50 <= 1.0
    assert os.path.exists(os.path.join(cfg.log_dir, "output_results.csv"))

    tr.save_checkpoint(1, tag="latest", metrics={"miou": miou})
    tr2 = SceneTrainer(cfg)
    assert tr2.start_epoch == 1


def _short_iter(cfg, n):
    from gcanet_tpu.data.synthetic import synth_scene_batch

    for i in range(n):
        yield synth_scene_batch(cfg, cfg.batch_size, seed=i)


def test_registry_scene_detection():
    from gcanet_tpu.models.registry import is_scene_model

    assert is_scene_model("softgroup.model.softgroup")
    assert is_scene_model("gcanet_tpu.models.softgroup_scene")
    assert not is_scene_model("models.dgcnn-hais-concat-direct-4")
    assert not is_scene_model("no.such.model")


def test_dataset_flag_selects_variant(tmp_path):
    import torch

    from gcanet_tpu.data import scene_dataset as sdm
    from gcanet_tpu.train.scene_trainer import SceneTrainer

    rng = np.random.RandomState(0)
    n = 6000                       # above the default min_npoint crop floor
    for area in ("Area_1", "Area_2", "Area_3", "Area_4", "Area_5", "Area_6"):
        torch.save((rng.rand(n, 3).astype(np.float32),
                    rng.rand(n, 3).astype(np.float32),
                    np.full(n, 7.0, np.float32),
                    np.zeros(n, np.float32), 0, 0),
                   tmp_path / f"{area}_office.pth")
    cfg = _cfg(str(tmp_path / "logdir")).replace(dataset="s3dis",
                                                 data_path=str(tmp_path))
    tr = SceneTrainer(cfg)
    tr.build_dataloaders()
    assert isinstance(tr.train_data, sdm.S3DISSceneDataset)
    assert len(tr.train_data) == 5           # areas 1-4 + 6
    assert len(tr.test_data) == 1            # area 5
    batch = next(tr.train_data.batches(2, shuffle=False, seed=0))
    assert batch["xyz"].shape == (2, cfg.num_points, 3)


def test_dataset_flag_unknown_falls_back_to_scannet(tmp_path):
    from gcanet_tpu.data import scene_dataset as sdm
    from gcanet_tpu.train.scene_trainer import SceneTrainer

    d = tmp_path / "train"
    d.mkdir()
    rng = np.random.RandomState(0)
    np.savez(d / "s.npz", xyz=rng.rand(300, 3).astype(np.float32),
             rgb=rng.rand(300, 3).astype(np.float32),
             semantic=np.full(300, 5.0, np.float32),
             instance=np.zeros(300, np.float32))
    cfg = _cfg(str(tmp_path / "logdir")).replace(dataset="ABC",
                                                 data_path=str(tmp_path))
    tr = SceneTrainer(cfg)
    tr.build_dataloaders()
    assert isinstance(tr.train_data, sdm.ScanNetSceneDataset)
