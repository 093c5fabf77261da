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

    merged, keep, conf, npoint, covered = I.merged_labels_device(
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
        runs = [int(x) for x in inst["pred_mask"]["counts"].split()]
        assert sum(runs[1::2]) == npoint[p, i]


def test_no_instances_gives_zero_labels():
    ci = 7
    args = _random_case(0)
    args = args[:4] + (np.zeros_like(args[4]),)     # all proposals invalid
    merged, keep, _, _, _ = I.merged_labels_device(*args, ci)
    assert not np.asarray(keep).any()
    assert (np.asarray(merged) == 0).all()


def test_min_npoint_threshold_respected():
    ci = 7
    args = _random_case(5)
    _, keep_strict, _, np_strict, _ = I.merged_labels_device(*args, ci,
                                                          min_npoint=100)
    keep_strict, np_strict = np.asarray(keep_strict), np.asarray(np_strict)
    assert (np_strict[keep_strict] >= 100).all()


def test_instances_from_merged_rank0_excludes_uncovered():
    """Regression: rank-0 masks must not absorb points covered by nothing
    (merged encodes both as 0; `covered` disambiguates)."""
    ci = 7
    args = _random_case(11)
    merged, keep, conf, npoint, covered = I.merged_labels_device(
        *[np.asarray(a) for a in args], ci, min_npoint=10)
    merged, keep = np.asarray(merged), np.asarray(keep)
    conf, npoint, covered = np.asarray(conf), np.asarray(npoint), np.asarray(covered)
    if not keep.any() or covered.all():
        import pytest
        pytest.skip("case lacks both kept instances and uncovered points")
    preds = I.instances_from_merged(merged, keep, conf, npoint, covered)
    mask0 = I.rle_decode(preds[0]["pred_mask"]).astype(bool)
    assert not mask0[~covered].any()          # uncovered points excluded
    # union of all masks == covered exactly (partition of covered points)
    union = np.zeros_like(covered)
    for pr in preds:
        union |= I.rle_decode(pr["pred_mask"]).astype(bool)
    np.testing.assert_array_equal(union, covered)


def test_instances_from_merged_matches_host_masks():
    """Each reconstructed mask must equal the host merged-label partition."""
    ci = 7
    args = _random_case(2)
    point_pid, cls_scores, iou_scores, mask_scores, prop_valid = args
    sem = np.zeros((point_pid.shape[1], ci), np.float32)
    host = I.get_instances(point_pid, sem, cls_scores, iou_scores,
                           mask_scores, prop_valid, ci, min_npoint=10)
    merged, keep, conf, npoint, covered = I.merged_labels_device(
        *[np.asarray(a) for a in args], ci, min_npoint=10)
    preds = I.instances_from_merged(np.asarray(merged), np.asarray(keep),
                                    np.asarray(conf), np.asarray(npoint),
                                    np.asarray(covered))
    assert len(preds) == len(host)
    for dev_p, host_p in zip(preds, host):
        assert dev_p["label_id"] == host_p["label_id"]
        host_mask = I.rle_decode(host_p["pred_mask"]).astype(bool)
        dev_mask = I.rle_decode(dev_p["pred_mask"]).astype(bool)
        # device partition assigns each covered point to its argmax-order
        # instance; every device-mask point must be inside the host mask
        assert not (dev_mask & ~host_mask).any()


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("dup", [False, True])
def test_instance_masks_device_matches_host(seed, dup):
    """Non-merged extraction (scene family, soft grouping): the device masks
    must equal the host get_instances masks BIT FOR BIT — incl. overlapping
    masks, which the merged path truncates by design."""
    ci = 7
    args = _random_case(seed, dup_channels=dup)
    point_pid, cls_scores, iou_scores, mask_scores, prop_valid = args
    sem = np.zeros((point_pid.shape[1], 7), np.float32)
    host = I.get_instances(point_pid, sem, cls_scores, iou_scores,
                           mask_scores, prop_valid, ci, min_npoint=10)

    keep, conf, npoint, masks = I.instance_masks_device(
        *[np.asarray(a) for a in args], ci, min_npoint=10)
    preds = I.instances_from_masks(np.asarray(keep), np.asarray(conf),
                                   np.asarray(npoint), np.asarray(masks))
    assert len(preds) == len(host)
    for ours, ref in zip(preds, host):
        assert ours["label_id"] == ref["label_id"]
        assert abs(ours["conf"] - ref["conf"]) < 1e-5
        assert ours["pred_mask"] == ref["pred_mask"]


def test_instance_masks_overlap_preserved():
    """An explicitly overlapping pair (one point set in two classes'
    channels): BOTH full masks survive in the non-merged path."""
    n, p, c = 30, 4, 3
    point_pid = -np.ones((2, n), np.int32)
    point_pid[0, :20] = 0                 # proposal 0 (class-0 channel)
    point_pid[1, 5:25] = 1                # proposal 1 (class-1 channel), overlaps
    cls_scores = np.full((p, c), -5.0, np.float32)
    cls_scores[0, 0] = 5.0
    cls_scores[1, 1] = 5.0
    iou_scores = np.ones((p, c), np.float32)
    mask_scores = np.full((2, n, c), 10.0, np.float32)
    prop_valid = np.array([True, True, False, False])
    keep, conf, npoint, masks = I.instance_masks_device(
        point_pid, cls_scores, iou_scores, mask_scores, prop_valid, c,
        min_npoint=5)
    preds = I.instances_from_masks(np.asarray(keep), np.asarray(conf),
                                   np.asarray(npoint), np.asarray(masks),
                                   encode_rle=False)
    assert len(preds) == 2
    m0 = preds[0]["mask"]
    m1 = preds[1]["mask"]
    assert m0.sum() == 20 and m1.sum() == 20          # full masks, no theft
    assert (m0 & m1).sum() == 15                      # overlap intact


def test_pack_unpack_mask_bits_roundtrip():
    rng = np.random.RandomState(3)
    for n in (17, 64, 100):                    # odd, exact, padded sizes
        masks = rng.rand(5, n, 4) < 0.3
        bits = np.asarray(I.pack_mask_bits(np.asarray(masks)))
        assert bits.dtype == np.uint8
        assert bits.shape == (5, 4, -(-n // 8))
        back = I.unpack_mask_bits(bits, n)
        np.testing.assert_array_equal(back, masks)
