"""Test-time instance extraction (host side).

Replicates ``get_instances`` (dgcnn-4.py:1040-1120), ``merge_masks``
(dgcnn-4.py:975-999) and ``panoptic_fusion`` (dgcnn-4.py:1001-1037) on numpy,
consuming the fixed-shape jit outputs.  Dense masks stay dense on device; RLE
(softgroup/util/rle.py equivalent) is only for export parity.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np


def rle_encode(mask: np.ndarray) -> Dict:
    """Binary run-length encoding, bit-compatible with the reference codec
    (softgroup/util/rle.py:5-21): counts is the space-joined run string, so
    dumps interchange with reference tooling."""
    m = np.concatenate([[0], mask.astype(np.uint8), [0]])
    runs = np.where(m[1:] != m[:-1])[0] + 1
    runs[1::2] -= runs[::2]
    return {"length": int(mask.size),
            "counts": " ".join(str(int(x)) for x in runs)}


def rle_decode(rle: Dict) -> np.ndarray:
    """Accepts the reference string format and the legacy list format."""
    mask = np.zeros(rle["length"], np.uint8)
    counts = rle["counts"]
    if isinstance(counts, str):
        counts = [int(x) for x in counts.split()]
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


def merged_labels_device(point_pid: jnp.ndarray,      # [CH, N] int32
                         cls_scores: jnp.ndarray,     # [P, C] logits
                         iou_scores: jnp.ndarray,     # [P, C]
                         mask_scores: jnp.ndarray,    # [CH, N, C]
                         prop_valid: jnp.ndarray,     # [P] bool
                         instance_classes: int,
                         cls_score_thr: float = 0.45,
                         mask_score_thr: float = -3.0,
                         min_npoint: int = 150):
    """Device-side ``get_instances`` + ``merge_masks``.

    Identical selection semantics to the host pair above (thresholds
    dgcnn-4.py:1050-1053; merge = argmax over the kept-instance list in
    class-major/proposal-minor order, points covered by nothing land on 0),
    but everything runs inside jit so only the [N] merged labels and a tiny
    [P, CI] instance table cross the device->host boundary — the [CH, N, C]
    mask scores (the bulk of an eval fetch) never leave the device.  On the
    tunnelled TPU the output fetch is the serving bottleneck (~31 MB/s
    measured), so this is the difference between ~640 ms and ~1 ms of
    transfer per cloud.

    Returns ``(merged [N] int32, keep [P, CI] bool, conf [P, CI] f32,
    npoint [P, CI] int32, covered [N] bool)``; the kept-instance list order
    used by ``merged`` is ``rank = cumsum(keep.T.ravel()) - 1``.  NB
    ``merged`` is 0 both for rank-0 points and for points covered by no kept
    instance (host ``masks.argmax(0)`` parity) — reconstructing instance
    masks from ``merged`` requires ``(merged == rank) & covered`` or the
    rank-0 mask absorbs every unassigned point.
    """
    ch, n = point_pid.shape
    p, _ = cls_scores.shape
    ci = instance_classes
    cls_soft = jax.nn.softmax(cls_scores, axis=1)[:, :ci]          # [P, CI]

    passes = (point_pid >= 0)[..., None] & \
        (mask_scores[..., :ci] > mask_score_thr)                   # [CH, N, CI]

    # distinct-point count per (proposal, class): the host sets mask bits, so
    # a point counts once even if several channels carry the same pid
    contrib = [passes[0]]
    for a in range(1, ch):
        earlier = jnp.zeros((n, ci), bool)
        for b in range(a):
            earlier |= (point_pid[b] == point_pid[a])[:, None] & passes[b]
        contrib.append(passes[a] & ~earlier)
    contrib_arr = jnp.stack(contrib)                               # [CH, N, CI]

    pid_safe = jnp.where(point_pid >= 0, point_pid, p)             # [CH, N]
    ids = pid_safe[..., None] * ci + jnp.arange(ci)                # [CH, N, CI]
    npoint = jax.ops.segment_sum(
        contrib_arr.reshape(-1).astype(jnp.int32), ids.reshape(-1),
        num_segments=(p + 1) * ci)[: p * ci].reshape(p, ci)

    keep = (prop_valid[:, None] & (cls_soft > cls_score_thr)
            & (npoint >= min_npoint))                              # [P, CI]

    # merged label: minimal (class, proposal) key among kept covering masks
    keep_pad = jnp.concatenate([keep, jnp.zeros((1, ci), bool)])   # pid==p row
    covered = passes & keep_pad[pid_safe]                          # [CH, N, CI]
    key = jnp.arange(ci) * p + pid_safe[..., None]                 # [CH, N, CI]
    big = ci * (p + 1) + 1
    min_key = jnp.min(jnp.where(covered, key, big), axis=(0, 2))   # [N]

    rank = jnp.cumsum(keep.T.reshape(-1)) - 1                      # [CI*P]
    rank = jnp.concatenate([rank, jnp.zeros((big - ci * p,), rank.dtype)])
    covered = min_key < ci * p
    merged = jnp.where(covered, rank[jnp.minimum(min_key, ci * p)], 0)

    conf = cls_soft * jnp.clip(iou_scores[:, :ci], 0, 1)
    return merged.astype(jnp.int32), keep, conf, npoint, covered


def instance_masks_device(point_pid: jnp.ndarray,      # [CH, N] int32
                          cls_scores: jnp.ndarray,     # [P, C] logits
                          iou_scores: jnp.ndarray,     # [P, C]
                          mask_scores: jnp.ndarray,    # [CH, N, C]
                          prop_valid: jnp.ndarray,     # [P] bool
                          instance_classes: int,
                          cls_score_thr: float = 0.45,
                          mask_score_thr: float = -3.0,
                          min_npoint: int = 150):
    """Device-side ``get_instances`` WITHOUT cross-instance merging.

    The scene family (vendored SoftGroup) evaluates INDEPENDENT, possibly
    overlapping instance masks (softgroup.py:537-604 emits one mask per
    kept (class, proposal) pair; nothing ever merges them) — and under soft
    grouping overlap is inherent: one point may belong to several classes'
    proposals.  The ABC merge (``merged_labels_device`` argmin /
    ``merge_masks`` argmax, dgcnn-4.py:975-999) truncates every overlapped
    mask, which measured as an AP50 drop of ~0.24 on the soft scene A/B
    (BASELINE.md round-5) — so scene evaluation uses this path.

    Returns ``(keep [P, CI] bool, conf [P, CI] f32, npoint [P, CI] i32,
    masks [P, N, CI] bool)``; ``masks[p, :, i]`` is the mask the reference
    would emit for proposal p under class i (union over assignment channels
    of ``pid == p`` entries passing the class-i mask threshold).  The fetch
    is ~P*N*CI bytes — bigger than the merged path's [N], so serving keeps
    the merged per-point labels; evaluation pays the fetch for parity.
    """
    ch, n = point_pid.shape
    p, _ = cls_scores.shape
    ci = instance_classes
    cls_soft = jax.nn.softmax(cls_scores, axis=1)[:, :ci]          # [P, CI]

    passes = (point_pid >= 0)[..., None] & \
        (mask_scores[..., :ci] > mask_score_thr)                   # [CH, N, CI]
    pid_safe = jnp.where(point_pid >= 0, point_pid, p)             # [CH, N]
    ids = pid_safe * n + jnp.arange(n, dtype=jnp.int32)[None, :]   # [CH, N]
    masks = jax.ops.segment_max(
        passes.reshape(ch * n, ci).astype(jnp.int32),
        ids.reshape(-1), num_segments=(p + 1) * n)[: p * n]
    # empty segments fill with int32 min (segment_max identity), which a
    # bool cast would read as True — compare against the 0/1 payload instead
    masks = (masks > 0).reshape(p, n, ci)

    npoint = jnp.sum(masks, axis=1).astype(jnp.int32)              # [P, CI]
    keep = (prop_valid[:, None] & (cls_soft > cls_score_thr)
            & (npoint >= min_npoint))
    conf = cls_soft * jnp.clip(iou_scores[:, :ci], 0, 1)
    return keep, conf, npoint, masks


def pack_mask_bits(masks: jnp.ndarray) -> jnp.ndarray:
    """Device-side bit-pack of ``instance_masks_device`` masks for the
    fetch-bound tunnel: [P, N, CI] bool -> [P, CI, ceil(N/8)] uint8
    (little-endian bit order, ``np.unpackbits(..., bitorder='little')``
    inverts).  8x smaller device->host transfer for serving."""
    p, n, ci = masks.shape
    n8 = -(-n // 8) * 8
    m = jnp.transpose(masks, (0, 2, 1))                   # [P, CI, N]
    if n8 != n:
        m = jnp.concatenate(
            [m, jnp.zeros((p, ci, n8 - n), bool)], axis=-1)
    m = m.reshape(p, ci, n8 // 8, 8).astype(jnp.uint32)
    w = (1 << jnp.arange(8, dtype=jnp.uint32))
    return jnp.sum(m * w, axis=-1).astype(jnp.uint8)


def unpack_mask_bits(bits: np.ndarray, n: int) -> np.ndarray:
    """Inverse of :func:`pack_mask_bits` on host: [P, CI, ceil(N/8)] uint8
    -> [P, N, CI] bool."""
    unpacked = np.unpackbits(bits, axis=-1, bitorder="little")[..., :n]
    return np.ascontiguousarray(unpacked.transpose(0, 2, 1)).astype(bool)


def instances_from_masks(keep: np.ndarray,         # [P, CI] bool
                         conf: np.ndarray,         # [P, CI]
                         npoint: np.ndarray,       # [P, CI]
                         masks: np.ndarray,        # [P, N, CI] bool
                         prop_mask: np.ndarray | None = None,  # [P] filter
                         label_offset: int = 1,
                         encode_rle: bool = True) -> List[Dict]:
    """Host-side instance list from ``instance_masks_device`` outputs —
    independent overlapping masks, class-major/proposal-minor order."""
    p, ci = keep.shape
    preds: List[Dict] = []
    for i in range(ci):
        for pp in np.nonzero(keep[:, i])[0]:
            if prop_mask is not None and not prop_mask[pp]:
                continue
            mask = masks[pp, :, i]
            preds.append({
                "label_id": i + label_offset,
                "conf": float(conf[pp, i]),
                "npoint": int(npoint[pp, i]),
                "pred_mask" if encode_rle else "mask":
                    rle_encode(mask) if encode_rle else mask,
            })
    return preds


def instances_from_merged(merged: np.ndarray,      # [N] ranks (0 = also bg)
                          keep: np.ndarray,        # [P, CI] bool
                          conf: np.ndarray,        # [P, CI]
                          npoint: np.ndarray,      # [P, CI]
                          covered: np.ndarray,     # [N] bool
                          prop_mask: np.ndarray | None = None,  # [P] item filter
                          label_offset: int = 1,
                          encode_rle: bool = True) -> List[Dict]:
    """Host-side instance list from ``merged_labels_device`` outputs.

    One definition of the class-major/proposal-minor rank order shared by
    serving (single + batched) and scene evaluation — the rank here MUST
    match ``cumsum(keep.T.ravel()) - 1`` inside merged_labels_device.
    ``label_offset`` maps instance-class column ``i`` to the emitted
    ``label_id`` (1-based for the ABC serving surface, dataset ``cls_offset``
    for scene AP against semantic GT).
    """
    p, ci = keep.shape
    rank_of = -np.ones((p, ci), np.int64)
    rank_of.T[keep.T] = np.arange(int(keep.sum()))
    preds: List[Dict] = []
    for i in range(ci):
        for pp in np.nonzero(keep[:, i])[0]:
            if prop_mask is not None and not prop_mask[pp]:
                continue
            mask = (merged == rank_of[pp, i]) & covered
            preds.append({
                "label_id": i + label_offset,
                "conf": float(conf[pp, i]),
                "npoint": int(npoint[pp, i]),
                "pred_mask" if encode_rle else "mask":
                    rle_encode(mask) if encode_rle else mask,
            })
    return preds


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
