"""ScanNet-style scene dataset: transforms, fixed-shape batching, model feed."""

import numpy as np
import pytest

from gcanet_tpu.config import Config, GroupingConfig, InstanceHeadConfig
from gcanet_tpu.data import scene_dataset as sd


def _write_scene(path, n=600, n_inst=4, seed=0):
    rng = np.random.RandomState(seed)
    xyz = rng.rand(n, 3).astype(np.float32) * 4.0
    rgb = rng.rand(n, 3).astype(np.float32)
    inst = rng.randint(0, n_inst, n).astype(np.float32)
    sem = (inst + 2).astype(np.float32)          # ScanNet: sem = inst_cls + 2
    np.savez(path, xyz=xyz, rgb=rgb, semantic=sem, instance=inst)


@pytest.fixture()
def scene_root(tmp_path):
    d = tmp_path / "train"
    d.mkdir()
    for i in range(3):
        _write_scene(d / f"scene{i:04d}.npz", seed=i)
    return str(tmp_path)


def _cfg():
    return Config(num_points=256, batch_size=2, max_instances=8,
                  grouping=GroupingConfig(radius=0.1, min_npoint=5,
                                          cc_max_iters=8),
                  instance_head=InstanceHeadConfig(grid_size=8,
                                                   max_proposals=8))


def test_batch_shapes_and_tables(scene_root):
    cfg = _cfg()
    ds = sd.SceneDataset(scene_root, "train", ".npz", cfg, training=True,
                         max_npoint=10000, min_npoint=10)
    batch = next(ds.batches(2, shuffle=False, seed=0))
    assert batch["xyz"].shape == (2, 256, 3)
    assert batch["feats"].shape == (2, 256, 3)
    assert batch["semantic"].shape == (2, 256)
    assert batch["pt_offset_label"].shape == (2, 256, 3)
    assert batch["instance_pointnum"].shape == (16,)
    assert batch["xyz"].min() >= 0.0 and batch["xyz"].max() <= 1.0
    # batch-global ids land in each item's slot range
    for bi in range(2):
        ids = batch["I_gt_global"][bi]
        ids = ids[ids >= 0]
        assert ((ids >= bi * 8) & (ids < (bi + 1) * 8)).all()
    # instance class = semantic - 2 (scannetv2.py:23-27)
    valid = batch["inst_valid"]
    assert (batch["instance_cls"][valid] >= 0).all()
    assert (batch["instance_cls"][valid] < 8).all()


def test_eval_transform_is_deterministic(scene_root):
    cfg = _cfg()
    ds = sd.SceneDataset(scene_root, "train", ".npz", cfg, training=False)
    a = ds.get(0, np.random.RandomState(7))
    b = ds.get(0, np.random.RandomState(7))
    np.testing.assert_array_equal(a["xyz"], b["xyz"])
    np.testing.assert_array_equal(a["semantic"], b["semantic"])


def test_compact_instance_label():
    lab = np.array([5, 5, -100, 9, 2, 9])
    out = sd.compact_instance_label(lab)
    assert out.tolist() == [1, 1, -100, 2, 0, 2]


def test_instance_info_offsets_point_to_centroid():
    xyz = np.array([[0, 0, 0], [2, 0, 0], [5, 5, 5]], np.float32)
    inst = np.array([0, 0, 1], np.int32)
    sem = np.array([4, 4, 6], np.int32)
    num, pointnum, cls, off = sd.instance_info(xyz, inst, sem, 4, cls_offset=2)
    assert num == 2
    assert pointnum[:2].tolist() == [2, 1]
    assert cls[:2].tolist() == [2, 4]
    np.testing.assert_allclose(off[0], [1, 0, 0])
    np.testing.assert_allclose(off[2], [0, 0, 0])


def test_crop_respects_budget():
    rng = np.random.RandomState(0)
    xyz = rng.rand(5000, 3) * 100
    xyz -= xyz.min(0)
    _, valid = sd.crop(xyz, spatial_shape=128, max_npoint=2000, rng=rng)
    assert valid.sum() <= 2000


def test_pth_roundtrip(tmp_path):
    torch = pytest.importorskip("torch")
    d = tmp_path / "val"
    d.mkdir()
    rng = np.random.RandomState(0)
    xyz = rng.rand(300, 3).astype(np.float32)
    rgb = rng.rand(300, 3).astype(np.float32)
    sem = np.full(300, 5, np.float32)
    inst = np.zeros(300, np.float32)
    torch.save((xyz, rgb, sem, inst), d / "scene0000_inst_nostuff.pth")
    cfg = _cfg()
    ds = sd.SceneDataset(str(tmp_path), "val", "_inst_nostuff.pth", cfg,
                         training=False)
    item = ds.get(0, np.random.RandomState(0))
    assert item["index"] == "scene0000"
    assert item["xyz"].shape == (256, 3)
    assert (item["semantic"] == 5).all()


def test_feeds_scene_model(scene_root):
    import jax

    cfg = _cfg()
    ds = sd.SceneDataset(scene_root, "train", ".npz", cfg, training=True,
                         max_npoint=10000, min_npoint=10)
    batch = next(ds.batches(2, shuffle=False, seed=0))

    from gcanet_tpu.models.softgroup_scene import SoftGroupNet

    model = SoftGroupNet(cfg, scene_grid=16, channels=16)
    rng = jax.random.PRNGKey(0)
    out, _ = model.init_with_output(
        {"params": rng}, batch["xyz"], batch["feats"], train=True, rng=rng)
    assert out.semantic_scores.shape == (512, cfg.num_primitives)
    assert np.isfinite(np.asarray(out.semantic_scores)).all()


def test_s3dis_variant(tmp_path):
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(0)
    for area in ("Area_1", "Area_2"):
        xyz = rng.rand(400, 3).astype(np.float32)
        rgb = rng.rand(400, 3).astype(np.float32)
        sem = np.full(400, 7.0, np.float32)          # 'chair'
        inst = np.zeros(400, np.float32)
        torch.save((xyz, rgb, sem, inst, None, None),
                   tmp_path / f"{area}_office1.pth")
    cfg = _cfg()
    ds = sd.S3DISSceneDataset(str(tmp_path), ["Area_1", "Area_2"], ".pth",
                              cfg, training=False)
    assert len(ds) == 2
    item = ds.get(0, np.random.RandomState(0))
    # no class shift on s3dis: instance class == semantic label
    assert item["inst_cls"][0] == 7

    ds4 = sd.S3DISSceneDataset(str(tmp_path), "Area_1", ".pth", cfg,
                               training=True, x4_split=True,
                               max_npoint=10000, min_npoint=10)
    item4 = ds4.get(0, np.random.RandomState(0))
    assert item4["xyz"].shape == (256, 3)


def test_stpls3d_class_shift(tmp_path):
    d = tmp_path / "train"
    d.mkdir()
    rng = np.random.RandomState(0)
    np.savez(d / "scene.npz", xyz=rng.rand(300, 3).astype(np.float32),
             rgb=rng.rand(300, 3).astype(np.float32),
             semantic=np.full(300, 4.0, np.float32),   # 'vehicle'
             instance=np.zeros(300, np.float32))
    cfg = _cfg()
    ds = sd.STPLS3DSceneDataset(str(tmp_path), "train", ".npz", cfg,
                                training=False)
    item = ds.get(0, np.random.RandomState(0))
    assert item["inst_cls"][0] == 3                    # semantic - 1


def test_kitti_variant(tmp_path):
    yaml = pytest.importorskip("yaml")
    # data root deliberately contains "bin" and "velodyne" substrings: the
    # label-path derivation must only rewrite the trailing components
    tmp_path = tmp_path / "velodyne_bins"
    seq = tmp_path / "sequences" / "00"
    (seq / "velodyne").mkdir(parents=True)
    (seq / "labels").mkdir(parents=True)
    rng = np.random.RandomState(0)
    pts = np.concatenate([rng.rand(200, 3).astype(np.float32) * 10,
                          rng.rand(200, 1).astype(np.float32)], 1)
    pts.tofile(seq / "velodyne" / "000000.bin")
    # raw 10 -> learned 9 (stuff -> 0); raw 40 -> learned 1 (thing -> 11);
    # raw 0 -> ignore (-100).  kitti.py:40-49 remap.
    raw = np.array([10] * 120 + [40] * 60 + [0] * 20, np.int32)
    raw.tofile(seq / "labels" / "000000.label")
    with open(tmp_path / "semantic-kitti.yaml", "w") as f:
        yaml.safe_dump({
            "split": {"train": [0], "valid": [0], "test": [0]},
            "learning_map": {0: 0, 10: 9, 40: 1},
            "learning_map_inv": {},
        }, f)
    cfg = _cfg()
    ds = sd.KITTISceneDataset(str(tmp_path), "train", ".bin", cfg,
                              training=False)
    item = ds.get(0, np.random.RandomState(0))
    assert set(np.unique(item["semantic"])) <= {-100, 0, 11}
    # only thing points (learned 11) carry an instance; its class is sem-11=0
    inst = item["instance"]
    sem = item["semantic"]
    assert (inst[sem == 0] == -100).all()             # stuff has no instance
    assert (inst[sem == 11] >= 0).all()
    assert item["inst_cls"][0] == 0
