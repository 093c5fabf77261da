"""Differential parity: panoptic_quality vs the reference PanopticEval.

The reference's PQ (semantic-KITTI style: encoded panoptic labels, unique
IoU>0.5 matching, per-class SQ/RQ/PQ) is pure numpy — exec-load it at test
time and compare per-class SQ/RQ/PQ against our scene-dict panoptic_quality
on randomly perturbed panoptic segmentations.  At IoU>0.5 the reference's
unique matching and our greedy best-IoU matching provably coincide, so the
numbers must agree exactly.  Skips where the snapshot is absent.
"""

import pathlib

import numpy as np
import pytest

from gcanet_tpu.train.instance_eval import panoptic_quality

REF = pathlib.Path("/root/reference/softgroup/evaluation/panoptic_eval.py")

pytestmark = pytest.mark.skipif(not REF.exists(),
                                reason="reference snapshot not available")


def _load_ref():
    src = REF.read_text().replace("np.float)", "float)")  # numpy>=1.24
    ns: dict = {}
    exec(compile(src, str(REF), "exec"), ns)
    return ns["PanopticEval"]


def _random_panoptic(rng, n, n_classes):
    """(gt_sem, gt_inst, pred_sem, pred_inst): contiguous gt segments, preds
    derived by boundary shifts + a dropped segment (FN) + an invented one
    (FP) + semantic flips."""
    gt_sem = np.zeros(n, np.int64)
    gt_inst = np.zeros(n, np.int64)
    pos, seg = 0, 0
    while pos < n:
        size = int(rng.randint(15, 60))
        end = min(pos + size, n)
        gt_sem[pos:end] = rng.randint(0, n_classes)
        gt_inst[pos:end] = seg
        pos, seg = end, seg + 1

    pred_sem = gt_sem.copy()
    pred_inst = gt_inst.copy()
    # shift segment boundaries
    for b in np.where(np.diff(gt_inst) != 0)[0]:
        shift = int(rng.randint(-6, 7))
        lo, hi = sorted((b + 1, b + 1 + shift))
        src_idx = b if shift > 0 else min(b + 1 + abs(shift), n - 1)
        pred_inst[lo:hi] = pred_inst[src_idx]
        pred_sem[lo:hi] = pred_sem[src_idx]
    # drop one segment into its neighbour (gt FN + pred absorbs)
    drop = int(rng.randint(0, seg))
    m = pred_inst == drop
    pred_inst[m] = (drop + 1) % seg
    pred_sem[m] = pred_sem[pred_inst == (drop + 1) % seg][0]
    # invent a segment (pred FP)
    inv_lo = int(rng.randint(0, n - 10))
    pred_inst[inv_lo:inv_lo + 8] = seg + 1
    pred_sem[inv_lo:inv_lo + 8] = rng.randint(0, n_classes)
    # panoptic invariant: one semantic class per predicted instance (the
    # perturbations above can leave a segment mixed; both evaluators assume
    # instance-uniform semantics)
    for i in np.unique(pred_inst):
        m = pred_inst == i
        pred_sem[m] = pred_sem[m][0]
    return gt_sem, gt_inst, pred_sem, pred_inst


@pytest.mark.parametrize("seed", range(4))
def test_pq_matches_reference(seed):
    RefEval = _load_ref()
    rng = np.random.RandomState(seed)
    n, n_classes = 500, 3
    gt_sem, gt_inst, pred_sem, pred_inst = _random_panoptic(rng, n, n_classes)

    # ---- ours: per-class prediction masks from the panoptic labelling
    preds = []
    for i in np.unique(pred_inst):
        mask = pred_inst == i
        cls = int(pred_sem[mask][0])
        preds.append({"label_id": cls, "conf": 1.0, "mask": mask})
    scenes = [{"preds": preds, "gt_inst": gt_inst, "gt_sem": gt_sem}]
    got = panoptic_quality(scenes, list(range(n_classes)), iou_thr=0.5)

    # ---- reference: encoded panoptic labels, evaluate_single counters
    ev = RefEval(thing_classes=list(range(n_classes)), stuff_classes=[],
                 offset=2 ** 20, min_points=1, ignore_label=-100)
    panoptic_pred = ((pred_inst.astype(np.int64) + 1) << 16) | pred_sem
    tp, iou, fp, fn, *_ = ev.evaluate_single(
        panoptic_pred, gt_sem.copy(), gt_inst.copy())

    for cl in range(n_classes):
        sq = iou[cl] / tp[cl] if tp[cl] else 0.0
        denom = tp[cl] + 0.5 * fp[cl] + 0.5 * fn[cl]
        rq = tp[cl] / denom if denom else 0.0
        ours_cl = got["per_class"][cl]
        np.testing.assert_allclose(ours_cl["sq"], sq, atol=1e-9, err_msg=f"sq {cl}")
        np.testing.assert_allclose(ours_cl["rq"], rq, atol=1e-9, err_msg=f"rq {cl}")
        np.testing.assert_allclose(ours_cl["pq"], sq * rq, atol=1e-9,
                                   err_msg=f"pq {cl}")
