"""Proposal/instance mask-IoU ops.

TPU-native equivalents of softgroup/ops/src/cal_iou_and_masklabel/
cal_iou_and_masklabel.cu:
  * ``mask_iou_on_cluster``  (cu:9-34)
  * ``mask_iou_on_pred``     (cu:36-68)
  * ``mask_label``           (cu:70-104)

Entries are the fixed-shape (channel, point) pairs of
:class:`gcanet_tpu.ops.grouping.Proposals` instead of a dynamic CSR; every op
is a segment reduction over ``pid * I + instance`` ids.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gcanet_tpu.ops import segment as seg


def _entries(point_pid: jnp.ndarray):
    ch, n_total = point_pid.shape
    pid = point_pid.reshape(-1)
    pt = jnp.tile(jnp.arange(n_total, dtype=jnp.int32), ch)
    return pid, pt, pid >= 0


def mask_iou_on_cluster(
    point_pid: jnp.ndarray,        # [CH, B*N]
    instance_labels: jnp.ndarray,  # [B*N] int, -1 = background
    instance_pointnum: jnp.ndarray,  # [I] int
    num_proposals: int,
    num_instances: int,
) -> jnp.ndarray:
    """IoU of every proposal against every GT instance -> [P, I]."""
    pid, pt, valid = _entries(point_pid)
    inst = instance_labels[pt]
    pair = jnp.where(valid & (inst >= 0) & (inst < num_instances),
                     pid * num_instances + inst, -1)
    inter = seg.segment_count(pair, num_proposals * num_instances)
    inter = inter.reshape(num_proposals, num_instances).astype(jnp.float32)
    ptotal = seg.segment_count(jnp.where(valid, pid, -1), num_proposals)
    itotal = instance_pointnum.astype(jnp.float32)
    union = ptotal[:, None].astype(jnp.float32) + itotal[None, :] - inter
    return inter / (union + 1e-5)


def mask_iou_on_pred(
    point_pid: jnp.ndarray,
    instance_labels: jnp.ndarray,
    instance_pointnum: jnp.ndarray,
    mask_scores_sigmoid: jnp.ndarray,  # [CH, B*N] per-entry sigmoid scores
    num_proposals: int,
    num_instances: int,
) -> jnp.ndarray:
    """IoU of thresholded (>0.5) predicted masks vs GT instances -> [P, I]."""
    pid, pt, valid = _entries(point_pid)
    on = valid & (mask_scores_sigmoid.reshape(-1) > 0.5)
    inst = instance_labels[pt]
    pair = jnp.where(on & (inst >= 0) & (inst < num_instances),
                     pid * num_instances + inst, -1)
    inter = seg.segment_count(pair, num_proposals * num_instances)
    inter = inter.reshape(num_proposals, num_instances).astype(jnp.float32)
    ptotal = seg.segment_count(jnp.where(on, pid, -1), num_proposals)
    itotal = instance_pointnum.astype(jnp.float32)
    union = ptotal[:, None].astype(jnp.float32) + itotal[None, :] - inter
    return inter / (union + 1e-5)


def mask_label(
    point_pid: jnp.ndarray,
    instance_labels: jnp.ndarray,
    instance_cls: jnp.ndarray,     # [I] int, -100 = ignored class
    ious_on_cluster: jnp.ndarray,  # [P, I]
    iou_thr: float,
) -> jnp.ndarray:
    """Per-entry binary mask supervision -> [CH, B*N] float in {-1, 0, 1}.

    cal_iou_and_masklabel.cu:70-104: each proposal takes its best-IoU
    non-ignored instance; if that IoU >= thr, entries are labelled by
    membership of that instance, else the whole proposal stays ignored (-1).
    """
    iou = jnp.where((instance_cls != -100)[None, :], ious_on_cluster, 0.0)
    best = jnp.argmax(iou, axis=1)                 # strictly-greater scan == first argmax
    best_iou = jnp.take_along_axis(iou, best[:, None], axis=1)[:, 0]
    assign = best_iou >= iou_thr                   # [P]

    pid, pt, valid = _entries(point_pid)
    p = ious_on_cluster.shape[0]
    pid_c = jnp.clip(pid, 0, p - 1)
    inst = instance_labels[pt]
    lbl = jnp.where(assign[pid_c],
                    (inst == best[pid_c]).astype(jnp.float32),
                    -1.0)
    lbl = jnp.where(valid, lbl, -1.0)
    return lbl.reshape(point_pid.shape)
