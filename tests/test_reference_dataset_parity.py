"""Differential parity: our ABC loader vs the reference's ABCDataset_new.

Exec-loads the reference dataset class at test time (its CUDA-ops /
augment_utils / option imports stubbed — none are touched on the eval path)
against a synthetic h5 object, seeds numpy's global RNG and our RandomState
identically (both sides' first consumer is the same
``choice(N, 7000, replace=False)`` subsample call, so the selections align
bit-for-bit), and compares every produced array: the >100-point instance
remap in first-appearance order, the 10->7 class fold, I_gt_clean's
background re-append, the subsample, and the per-instance
pointnum/class/centroid-offset tables.  Skips where the snapshot is absent.
"""

import pathlib
import sys
import types

import numpy as np
import pytest

from gcanet_tpu.config import Config
from gcanet_tpu.data import abc_dataset as ours

REF = pathlib.Path("/root/reference/dataloader/ABCDataset_new.py")

pytestmark = pytest.mark.skipif(not REF.exists(),
                                reason="reference snapshot not available")


def _load_reference_dataset_cls():
    aug = types.ModuleType("src.augment_utils")
    for name in ("rotate_perturbation_point_cloud", "jitter_point_cloud",
                 "shift_point_cloud", "random_scale_point_cloud",
                 "rotate_point_cloud"):
        setattr(aug, name, None)           # eval path never augments
    src_pkg = types.ModuleType("src")
    src_pkg.augment_utils = aug
    sg = types.ModuleType("softgroup")
    sg_ops = types.ModuleType("softgroup.ops")
    for name in ("ball_query", "bfs_cluster", "get_mask_iou_on_cluster",
                 "get_mask_iou_on_pred", "get_mask_label", "global_avg_pool",
                 "sec_max", "sec_min", "voxelization", "voxelization_idx",
                 "hierarchical_aggregation"):
        setattr(sg_ops, name, None)
    sg.ops = sg_ops
    opt = types.ModuleType("option_new")
    opt.build_option = None
    new = {"src": src_pkg, "src.augment_utils": aug, "softgroup": sg,
           "softgroup.ops": sg_ops, "option_new": opt}
    saved = {k: sys.modules.get(k) for k in new}
    sys.modules.update(new)
    try:
        ns: dict = {"__file__": str(REF)}
        exec(compile(REF.read_text(), str(REF), "exec"), ns)
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    return ns["ABCDataset"]


def _write_h5(path, rng, n=9000):
    import h5py

    pts = rng.randn(n, 3).astype(np.float32)
    nrm = rng.randn(n, 3).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    # instance labels: a few >100-pt instances, a few small (-> background),
    # in shuffled order so first-appearance remap order is exercised
    sizes = [900, 60, 2500, 101, 100, 1800, 40, 2200]
    sizes.append(n - sum(sizes))
    labels = np.concatenate([np.full(s, i) for i, s in enumerate(sizes)])
    rng.shuffle(labels)
    prim = rng.randint(0, 10, n)           # includes 7/8/9 for the fold
    t_param = rng.randn(n, 22).astype(np.float32)
    with h5py.File(path, "w") as hf:
        hf["points"], hf["labels"], hf["normals"] = pts, labels, nrm
        hf["prim"], hf["T_param"] = prim, t_param


@pytest.mark.parametrize("num_primitives", [7, 10])
def test_getitem_matches_reference(tmp_path, num_primitives):
    RefDS = _load_reference_dataset_cls()
    rng = np.random.RandomState(0)
    _write_h5(tmp_path / "obj0.h5", rng)
    (tmp_path / "val_list.txt").write_text("obj0\n")   # eval path: no augment

    ref_ds = RefDS(str(tmp_path), "val_list.txt", opt=None,
                   num_primitives=num_primitives)
    np.random.seed(1234)
    ref = ref_ds[0]

    cfg = Config(num_points=7000, num_primitives=num_primitives,
                 max_instances=16)
    raw = ours.load_h5_object(str(tmp_path / "obj0.h5"))
    got = ours.process_object(raw, cfg, training=False,
                              rng=np.random.RandomState(1234))

    for key in ("gt_pc", "gt_normal", "T_param"):
        np.testing.assert_array_equal(got[key], ref[key], err_msg=key)
    for key in ("T_gt", "I_gt", "I_gt_clean"):
        np.testing.assert_array_equal(got[key].astype(np.int64),
                                      np.asarray(ref[key], np.int64),
                                      err_msg=key)
    assert got["inst_num"] == ref["inst_num"]
    k = ref["inst_num"]
    np.testing.assert_array_equal(got["inst_pointnum"][:k],
                                  np.asarray(ref["inst_pointnum"]))
    np.testing.assert_array_equal(got["inst_cls"][:k],
                                  np.asarray(ref["inst_cls"]))
    np.testing.assert_allclose(got["pt_offset_label"],
                               ref["pt_offset_label"], atol=1e-6)
