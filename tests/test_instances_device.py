"""Device-side instance extraction: parity against the host reference pair
(get_instances + merge_masks) across random configurations."""

import numpy as np
import pytest

from gcanet_tpu.train import instances as I


def _random_case(seed, ch=2, n=400, p=24, c=7, dup_channels=False):
    rng = np.random.RandomState(seed)
    point_pid = rng.randint(-1, p, (ch, n)).astype(np.int32)
    if dup_channels:
        same = rng.rand(n) < 0.3
        point_pid[1, same] = point_pid[0, same]
    cls_scores = rng.randn(p, c).astype(np.float32) * 3
    iou_scores = rng.rand(p, c).astype(np.float32) * 1.2 - 0.1
    mask_scores = rng.randn(ch, n, c).astype(np.float32) * 4
    prop_valid = rng.rand(p) < 0.8
    return point_pid, cls_scores, iou_scores, mask_scores, prop_valid


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("dup", [False, True])
def test_device_matches_host(seed, dup):
    ci = 7
    args = _random_case(seed, dup_channels=dup)
    point_pid, cls_scores, iou_scores, mask_scores, prop_valid = args
    sem = np.zeros((point_pid.shape[1], 7), np.float32)   # unused by selection
    # low min_npoint so random masks actually qualify
    host = I.get_instances(point_pid, sem, cls_scores, iou_scores,
                           mask_scores, prop_valid, ci, min_npoint=10)
    merged_host = (I.merge_masks(host) if host
                   else np.zeros(args[0].shape[1], np.int32))

    merged, keep, conf, npoint = I.merged_labels_device(
        *[np.asarray(a) for a in args], ci, min_npoint=10)
    merged = np.asarray(merged)
    keep = np.asarray(keep)
    conf = np.asarray(conf)
    npoint = np.asarray(npoint)

    assert int(keep.sum()) == len(host)
    np.testing.assert_array_equal(merged, merged_host)

    # table parity: kept instances in class-major order match the host list
    order = [(i, p) for i in range(ci) for p in range(keep.shape[0])
             if keep[p, i]]
    for inst, (i, p) in zip(host, order):
        assert inst["label_id"] == i + 1
        assert abs(inst["conf"] - conf[p, i]) < 1e-5
        assert sum(inst["pred_mask"]["counts"][1::2]) == npoint[p, i]


def test_no_instances_gives_zero_labels():
    ci = 7
    args = _random_case(0)
    args = args[:4] + (np.zeros_like(args[4]),)     # all proposals invalid
    merged, keep, _, _ = I.merged_labels_device(*args, ci)
    assert not np.asarray(keep).any()
    assert (np.asarray(merged) == 0).all()


def test_min_npoint_threshold_respected():
    ci = 7
    args = _random_case(5)
    _, keep_strict, _, np_strict = I.merged_labels_device(*args, ci,
                                                          min_npoint=100)
    keep_strict, np_strict = np.asarray(keep_strict), np.asarray(np_strict)
    assert (np_strict[keep_strict] >= 100).all()
