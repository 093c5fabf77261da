"""ScanNet-style instance-segmentation AP evaluation (library code).

Equivalent of the vendored ``softgroup/evaluation/instance_eval.py``
(ScanNetEval: AP over IoU overlaps 0.5:0.05:0.95 plus AP@50 / AP@25) —
not called by the GCANet eval path (which uses Hungarian mIoU), but part of
the framework surface for ScanNet-style benchmarks.

Inputs are per-scene lists of predictions ``{"label_id", "conf", "mask"}``
(dense boolean masks) and GT arrays ``instance_ids`` / ``semantic_labels``.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

OVERLAPS = np.append(np.arange(0.5, 0.95, 0.05), 0.25)


def _scene_matches(preds: List[Dict], gt_inst: np.ndarray, gt_sem: np.ndarray,
                   class_id: int, min_region_size: int = 1):
    """Greedy IoU matching of one scene's predictions of one class."""
    gt_ids = [g for g in np.unique(gt_inst[gt_sem == class_id]) if g >= 0]
    gt_masks = [(gt_inst == g) & (gt_sem == class_id) for g in gt_ids]
    gt_masks = [m for m in gt_masks if m.sum() >= min_region_size]

    cls_preds = [p for p in preds if p["label_id"] == class_id]
    rows = []
    for p in cls_preds:
        pm = p["mask"].astype(bool)
        best_iou = 0.0
        best_gt = -1
        for gi, gm in enumerate(gt_masks):
            inter = np.logical_and(pm, gm).sum()
            union = pm.sum() + gm.sum() - inter
            iou = inter / union if union else 0.0
            if iou > best_iou:
                best_iou, best_gt = iou, gi
        rows.append((p["conf"], best_iou, best_gt))
    return rows, len(gt_masks)


def evaluate_matches(scenes: Sequence[Dict], class_ids: Sequence[int]
                     ) -> Dict[str, float]:
    """scenes: [{"preds": [...], "gt_inst": [N], "gt_sem": [N]}, ...].

    Returns {"all_ap", "all_ap_50%", "all_ap_25%"} plus per-class APs.
    """
    ap_table = np.zeros((len(OVERLAPS), len(class_ids)))
    for ci, cls in enumerate(class_ids):
        rows: List = []
        total_gt = 0
        for si, scene in enumerate(scenes):
            r, n_gt = _scene_matches(scene["preds"], scene["gt_inst"],
                                     scene["gt_sem"], cls)
            rows.extend([(conf, iou, (si, g)) for conf, iou, g in r])
            total_gt += n_gt
        for oi, thr in enumerate(OVERLAPS):
            if total_gt == 0:
                ap_table[oi, ci] = float("nan")
                continue
            rows_sorted = sorted(rows, key=lambda t: -t[0])
            matched_gt = set()
            tp, fp = [], []
            for conf, iou, key in rows_sorted:
                if iou >= thr and key[1] >= 0 and key not in matched_gt:
                    matched_gt.add(key)
                    tp.append(1)
                    fp.append(0)
                else:
                    tp.append(0)
                    fp.append(1)
            tp = np.cumsum(tp)
            fp = np.cumsum(fp)
            recall = tp / total_gt
            precision = tp / np.maximum(tp + fp, 1)
            # standard interpolated AP
            ap = 0.0
            for r_thr in np.linspace(0, 1, 101):
                p = precision[recall >= r_thr].max() if (recall >= r_thr).any() else 0.0
                ap += p / 101
            ap_table[oi, ci] = ap

    def nanmean(x):
        return float(np.nanmean(x)) if not np.isnan(x).all() else 0.0

    o50 = np.isclose(OVERLAPS, 0.5)
    o25 = np.isclose(OVERLAPS, 0.25)
    strict = ~o25
    result = {
        "all_ap": nanmean(ap_table[strict]),
        "all_ap_50%": nanmean(ap_table[o50]),
        "all_ap_25%": nanmean(ap_table[o25]),
    }
    for ci, cls in enumerate(class_ids):
        result[f"class_{cls}_ap"] = nanmean(ap_table[strict, ci])
    return result


def panoptic_quality(scenes: Sequence[Dict], class_ids: Sequence[int],
                     iou_thr: float = 0.5) -> Dict[str, float]:
    """Panoptic Quality (PQ/SQ/RQ) — equivalent of the vendored
    softgroup/evaluation PanopticEval.  Matches predicted segments to GT at
    IoU > thr (unique by construction) and averages per class."""
    pq_per_class = {}
    for cls in class_ids:
        tp, fp, fn = 0, 0, 0
        iou_sum = 0.0
        for scene in scenes:
            rows, n_gt = _scene_matches(scene["preds"], scene["gt_inst"],
                                        scene["gt_sem"], cls)
            matched = set()
            for conf, iou, g in sorted(rows, key=lambda t: -t[1]):
                if iou > iou_thr and g >= 0 and g not in matched:
                    matched.add(g)
                    tp += 1
                    iou_sum += iou
                else:
                    fp += 1
            fn += n_gt - len(matched)
        denom = tp + 0.5 * fp + 0.5 * fn
        sq = iou_sum / tp if tp else 0.0
        rq = tp / denom if denom else 0.0
        pq_per_class[cls] = {"pq": sq * rq, "sq": sq, "rq": rq}
    pq = float(np.mean([v["pq"] for v in pq_per_class.values()])) if pq_per_class else 0.0
    return {"pq": pq, "per_class": pq_per_class}


def pointwise_semantic_eval(pred_sem: np.ndarray, gt_sem: np.ndarray,
                            num_classes: int, ignore_label: int = -1
                            ) -> Dict[str, float]:
    """Point-wise semantic mIoU / accuracy (softgroup/evaluation point_wise_eval
    equivalent)."""
    valid = gt_sem != ignore_label
    p, g = pred_sem[valid], gt_sem[valid]
    ious = []
    for c in range(num_classes):
        inter = np.sum((p == c) & (g == c))
        union = np.sum((p == c) | (g == c))
        if union:
            ious.append(inter / union)
    return {
        "miou": float(np.mean(ious)) if ious else 0.0,
        "acc": float(np.mean(p == g)) if len(p) else 0.0,
    }
