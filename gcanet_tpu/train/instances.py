"""Test-time instance extraction (host side).

Replicates ``get_instances`` (dgcnn-4.py:1040-1120), ``merge_masks``
(dgcnn-4.py:975-999) and ``panoptic_fusion`` (dgcnn-4.py:1001-1037) on numpy,
consuming the fixed-shape jit outputs.  Dense masks stay dense on device; RLE
(softgroup/util/rle.py equivalent) is only for export parity.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np


def rle_encode(mask: np.ndarray) -> Dict:
    """Binary run-length encoding (softgroup/util/rle.py:5-21 format)."""
    m = np.concatenate([[0], mask.astype(np.uint8), [0]])
    runs = np.where(m[1:] != m[:-1])[0] + 1
    runs[1::2] -= runs[::2]
    return {"length": int(mask.size), "counts": runs.tolist()}


def rle_decode(rle: Dict) -> np.ndarray:
    mask = np.zeros(rle["length"], np.uint8)
    counts = rle["counts"]
    for start, length in zip(counts[::2], counts[1::2]):
        mask[start - 1:start - 1 + length] = 1
    return mask


def get_instances(point_pid: np.ndarray,        # [CH, N]
                  semantic_scores: np.ndarray,  # [N, C] logits
                  cls_scores: np.ndarray,       # [P, C]
                  iou_scores: np.ndarray,       # [P, C]
                  mask_scores: np.ndarray,      # [CH, N, C]
                  prop_valid: np.ndarray,       # [P]
                  instance_classes: int,
                  cls_score_thr: float = 0.45,
                  mask_score_thr: float = -3.0,
                  min_npoint: int = 150) -> List[Dict]:
    """dgcnn-4.py:1040-1120 with thresholds at :1050-1053."""
    ch, n = point_pid.shape
    p = cls_scores.shape[0]
    if not prop_valid.any():
        return []
    e = np.exp(cls_scores - cls_scores.max(1, keepdims=True))
    cls_soft = e / e.sum(1, keepdims=True)

    # dense proposal masks per class from the assignment channels
    instances: List[Dict] = []
    for i in range(instance_classes):
        score_pred = cls_soft[:, i] * np.clip(iou_scores[:, i], 0, 1)
        mask_pred = np.zeros((p, n), np.int32)
        for c in range(ch):
            sel = (point_pid[c] >= 0) & (mask_scores[c, :, i] > mask_score_thr)
            mask_pred[point_pid[c][sel], np.nonzero(sel)[0]] = 1
        keep = prop_valid & (cls_soft[:, i] > cls_score_thr)
        keep &= mask_pred.sum(1) >= min_npoint
        for pp in np.nonzero(keep)[0]:
            instances.append({
                "label_id": i + 1,
                "conf": float(score_pred[pp]),
                "pred_mask": rle_encode(mask_pred[pp]),
            })
    return instances


def merge_masks(instances: List[Dict]) -> np.ndarray:
    """argmax over decoded masks -> per-point instance id (dgcnn-4.py:975-999)."""
    masks = np.stack([rle_decode(inst["pred_mask"]) for inst in instances])
    return masks.argmax(0).astype(np.int32)


def panoptic_fusion(semantic_preds: np.ndarray, instance_preds: List[Dict],
                    num_classes: int) -> np.ndarray:
    """dgcnn-4.py:1001-1037: greedy high-confidence-first mask pasting."""
    skip_iou = 0.5
    panoptic_cls = semantic_preds.astype(np.uint32).copy()
    panoptic_ids = np.zeros_like(semantic_preds, np.uint32)
    order = np.argsort([x["conf"] for x in instance_preds])[::-1]
    prev = np.zeros_like(semantic_preds, bool)
    pid = 1
    for i in order:
        inst = instance_preds[i]
        mask = rle_decode(inst["pred_mask"]).astype(bool)
        inter = (mask & prev).sum()
        if inter / (mask.sum() + 1e-5) > skip_iou:
            continue
        paste = mask & ~prev
        panoptic_cls[paste] = inst["label_id"]
        panoptic_ids[paste] = pid
        prev |= paste
        pid += 1
    ignore = (panoptic_cls >= 11) & (panoptic_ids == 0)
    out = (panoptic_cls & 0xFFFF) | (panoptic_ids << 16)
    out[ignore] = num_classes
    return out.astype(np.uint32)
