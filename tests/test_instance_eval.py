"""Oracle tests for the ScanNet-style AP evaluator.

Hand-built scenes encode each edge case of the reference semantics
(softgroup/evaluation/instance_eval.py): min_region_sizes filtering, void /
group-overlap FP correction, greedy double-match handling, and the adapter
sanity checks (perfect predictions -> AP 1.0; garbage -> low AP).
"""

import numpy as np

from gcanet_tpu.train.instance_eval import (ScanNetEval, encode_scene_gt,
                                            evaluate_matches)


def _scene(perfect=True):
    n = 200
    gt_inst = np.repeat(np.arange(4), 50)
    gt_sem = np.repeat([1, 1, 2, 2], 50)
    preds = []
    for g in range(4):
        mask = gt_inst == g
        if not perfect:
            mask = np.roll(mask, 30)        # badly misaligned
        preds.append({"label_id": int(gt_sem[g * 50]), "conf": 0.9,
                      "mask": mask})
    return {"preds": preds, "gt_inst": gt_inst, "gt_sem": gt_sem}


def test_perfect_ap():
    res = evaluate_matches([_scene(True)], class_ids=[1, 2])
    assert res["all_ap"] > 0.99
    assert res["all_ap_50%"] > 0.99


def test_bad_predictions_low_ap():
    res = evaluate_matches([_scene(False)], class_ids=[1, 2])
    assert res["all_ap"] < 0.5


def _mask(n, sl):
    m = np.zeros(n, dtype=bool)
    m[sl] = True
    return m


def _pred(n, sl, conf=0.9, label=1, scan=0):
    return {"scan_id": scan, "label_id": label, "conf": conf,
            "pred_mask": _mask(n, sl)}


def test_min_region_size_filters_small_gt_and_pred():
    """GTs below min_region_sizes leave the denominator; predictions below
    it are skipped entirely (instance_eval.py:26-28,70,275-276)."""
    n = 400
    gts = np.zeros(n, dtype=np.int64)
    gts[:150] = 1 * 1000 + 1            # big GT: 150 pts
    gts[150:180] = 1 * 1000 + 2         # small GT: 30 pts < 100
    ev = ScanNetEval(["c1"])            # default min 100
    # one perfect pred on the big GT; one 30-pt pred (skipped)
    preds = [_pred(n, slice(0, 150)), _pred(n, slice(150, 180), conf=0.99)]
    avgs = ev.evaluate([preds], [gts], print_result=False)
    # small GT filtered, small pred skipped -> perfect score on the one GT
    assert avgs["all_ap_50%"] == 1.0
    assert avgs["all_ap"] == 1.0

    # with min_npoint=10 the small GT counts and its pred must match it
    ev10 = ScanNetEval(["c1"], min_npoint=10)
    avgs10 = ev10.evaluate([preds], [gts], print_result=False)
    assert avgs10["all_ap_50%"] == 1.0


def test_unmatched_pred_over_small_gt_is_ignored_not_fp():
    """A prediction covering a filtered (too-small) GT is subtracted as
    ignore, not counted FP (instance_eval.py:129-136)."""
    n = 400
    gts = np.zeros(n, dtype=np.int64)
    gts[:150] = 1 * 1000 + 1
    gts[150:290] = 1 * 1000 + 2          # 140 pts -> valid at min 100
    ev = ScanNetEval(["c1"], min_npoint=200)   # now BOTH gt2 filtered
    gts2 = gts.copy()
    gts2[:250] = 1 * 1000 + 1            # gt1: 250 pts (valid at min 200)
    gts2[250:390] = 1 * 1000 + 2         # gt2: 140 pts (filtered at 200)
    preds = [
        _pred(n, slice(0, 250), conf=0.9),          # perfect on gt1
        _pred(n, slice(250, 390 + 10), conf=0.8),   # sits on filtered gt2
    ]
    # pred2: 150 pts; 140 on filtered gt2, 10 on void -> 150/150 ignored
    avgs = ev.evaluate([preds], [gts2], print_result=False)
    assert avgs["all_ap_50%"] == 1.0     # no FP from the ignored pred


def test_void_overlap_not_fp():
    """A prediction mostly on void points (semantic not in valid classes)
    is not a false positive (instance_eval.py:123-136,254-255)."""
    n = 500
    gts = np.zeros(n, dtype=np.int64)
    gts[:150] = 1 * 1000 + 1
    # points 150..500 are void (encoded 0)
    preds = [
        _pred(n, slice(0, 150), conf=0.9),
        _pred(n, slice(200, 350), conf=0.8),   # 150 pts fully on void
    ]
    ev = ScanNetEval(["c1"])
    avgs = ev.evaluate([preds], [gts], print_result=False)
    assert avgs["all_ap_50%"] == 1.0

    # same pred but on real background of a VALID class region -> FP
    gts_fp = gts.copy()
    gts_fp[200:350] = 1 * 1000 + 7       # another real instance there
    preds_fp = [_pred(n, slice(0, 150), conf=0.9),
                _pred(n, slice(200, 275), conf=0.8)]   # half-covers gt7
    ev2 = ScanNetEval(["c1"], min_npoint=10)
    avgs_fp = ev2.evaluate([preds_fp], [gts_fp], print_result=False)
    assert avgs_fp["all_ap_50%"] < 1.0   # gt7 unmatched at 0.5 + FP pred


def test_group_gt_ignored():
    """GT encoded ids < 1000 are 'groups': never matchable, and overlap with
    them is subtracted from FP counting (instance_eval.py:70,126-128)."""
    n = 400
    gts = np.zeros(n, dtype=np.int64)
    gts[:150] = 1 * 1000 + 1
    gts[150:300] = 999                   # group region (id < 1000)
    # NB id 999 // 1000 = 0 -> also void; craft a labelled group instead:
    # reference treats instance_id<1000 as group regardless of class
    preds = [_pred(n, slice(0, 150), conf=0.9),
             _pred(n, slice(150, 300), conf=0.8)]     # sits on the group
    ev = ScanNetEval(["c1"])
    avgs = ev.evaluate([preds], [gts], print_result=False)
    assert avgs["all_ap_50%"] == 1.0


def test_double_match_lower_conf_becomes_fp():
    """Two predictions matching one GT: the lower-confidence one becomes an
    FP carrying the min score (instance_eval.py:95-108)."""
    n = 300
    gts = np.zeros(n, dtype=np.int64)
    gts[:200] = 1 * 1000 + 1
    preds = [
        _pred(n, slice(0, 200), conf=0.9),    # iou 1.0
        _pred(n, slice(0, 150), conf=0.5),    # iou 0.75, same GT
    ]
    ev = ScanNetEval(["c1"])
    avgs = ev.evaluate([preds], [gts], print_result=False)
    # the GT keeps the MAX confidence (0.9) and the FP carries the MIN
    # (0.5), so with a single GT the FP ranks last and AP50 stays 1.0 —
    # reference behaviour (instance_eval.py:95-102)
    assert avgs["all_ap_50%"] == 1.0
    # ...and symmetrically when the duplicate has the higher confidence
    preds_hi = [_pred(n, slice(0, 200), conf=0.5),
                _pred(n, slice(0, 150), conf=0.9)]
    assert ev.evaluate([preds_hi], [gts],
                       print_result=False)["all_ap_50%"] == 1.0
    # the min-score FP DOES hurt when it outranks another scene's TP:
    # scan B's true positive (conf 0.3) sorts below the duplicate FP (0.5)
    gts_b = np.zeros(n, dtype=np.int64)
    gts_b[:200] = 1 * 1000 + 1
    preds_b = [_pred(n, slice(0, 200), conf=0.3, scan=1)]
    avgs2 = ev.evaluate([preds, preds_b], [gts, gts_b], print_result=False)
    assert avgs2["all_ap_50%"] < 1.0
    # control: without the duplicate there is no FP and AP50 recovers
    avgs3 = ev.evaluate([preds[:1], preds_b], [gts, gts_b],
                        print_result=False)
    assert avgs3["all_ap_50%"] == 1.0


def test_greedy_pred_visited_across_gts():
    """A prediction claimed by one GT cannot match another (pred_visited,
    instance_eval.py:86-87)."""
    n = 400
    gts = np.zeros(n, dtype=np.int64)
    gts[:150] = 1 * 1000 + 1
    gts[150:300] = 1 * 1000 + 2
    # one big pred covering both GTs equally (iou ~0.43 each at thr 0.25)
    preds = [_pred(n, slice(0, 300), conf=0.9)]
    ev = ScanNetEval(["c1"])
    avgs = ev.evaluate([preds], [gts], print_result=False)
    # at iou .25 the pred matches ONE gt; the other is a hard FN -> rc 0.5
    assert np.isclose(avgs["all_rc_25%"], 0.5)


def test_rle_pred_mask_accepted():
    from gcanet_tpu.train.instances import rle_encode

    n = 300
    gts = np.zeros(n, dtype=np.int64)
    gts[:150] = 1 * 1000 + 1
    mask = _mask(n, slice(0, 150))
    preds = [{"scan_id": 0, "label_id": 1, "conf": 0.9,
              "pred_mask": rle_encode(mask)}]
    ev = ScanNetEval(["c1"])
    avgs = ev.evaluate([preds], [gts], print_result=False)
    assert avgs["all_ap_50%"] == 1.0


def test_class_agnostic_mode():
    n = 400
    gts = np.zeros(n, dtype=np.int64)
    gts[:150] = 1 * 1000 + 1
    gts[150:300] = 2 * 1000 + 1
    # predictions with the WRONG class labels still match class-agnostic
    preds = [_pred(n, slice(0, 150), conf=0.9, label=2),
             _pred(n, slice(150, 300), conf=0.8, label=1)]
    ev = ScanNetEval(["c1", "c2"], use_label=False)
    avgs = ev.evaluate([preds], [gts], print_result=False)
    assert avgs["all_ap_50%"] == 1.0
    ev_lab = ScanNetEval(["c1", "c2"])
    avgs_lab = ev_lab.evaluate([preds], [gts], print_result=False)
    assert avgs_lab["all_ap_50%"] < 1.0


def test_encode_scene_gt():
    gt_inst = np.array([0, 0, 1, -1, 2])
    gt_sem = np.array([3, 3, 5, 3, 9])
    out = encode_scene_gt(gt_inst, gt_sem, class_ids=[3, 5])
    # sem 3 -> eval id 1, sem 5 -> eval id 2, sem 9 invalid -> 0 (void)
    assert out.tolist() == [1001, 1001, 2002, 0, 0]
