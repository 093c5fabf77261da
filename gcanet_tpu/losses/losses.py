"""Training losses, vectorised over static shapes.

Replicates ``utils/loss_utils.py`` semantics exactly (python loops over
batch items / instances / types become masked segment reductions):
  * ``compute_embedding_loss``  (loss_utils.py:203-257)
  * ``compute_normal_loss``     (loss_utils.py:271-278)
  * ``compute_nnl_loss``        (loss_utils.py:441-455)
  * ``compute_param_loss``      (loss_utils.py:474-535)
  * ``offset_loss``             (loss_utils.py:297-306)
  * ``instance_loss``           (loss_utils.py:308-435)

Known deviation: the reference's ``instance_loss`` indexes the concatenated
cross-batch instance table with *per-item* instance ids (ABCDataset_new.py
never offsets ``I_gt`` per item), silently mixing items when batch_size > 1.
Here instances carry batch-global ids; behaviour is identical at batch 1 (the
eval path) and well-defined at batch > 1.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gcanet_tpu.ops import mask_iou as miou_ops
from gcanet_tpu.ops.mathutil import safe_norm
from gcanet_tpu.ops import segment as seg


def compute_embedding_loss(pred_feat, gt_label, max_instances: int,
                           t_pull: float = 0.5, t_push: float = 1.5):
    """Pull/push embedding loss; gt_label [B, N] with -1 background.

    The background (-1) forms its own cluster, exactly as the reference's
    ``j - 1`` loop start (loss_utils.py:217-222).
    """
    b, n, k = pred_feat.shape
    i_max = max_instances

    def per_item(feat, lbl):
        sid = jnp.where((lbl >= -1) & (lbl < i_max - 1), lbl + 1, i_max)
        cnt = seg.segment_count(sid, i_max)                        # [I]
        present = cnt > 0
        centers = seg.segment_mean(feat, sid, i_max)               # [I, K]
        d = safe_norm(feat - centers[jnp.clip(sid, 0, i_max - 1)], axis=-1)
        pull_per = seg.segment_sum(jax.nn.relu(d - t_pull), sid, i_max)
        pull_per = pull_per / jnp.maximum(cnt, 1)
        n_present = jnp.maximum(jnp.sum(present), 1)
        pull = jnp.sum(jnp.where(present, pull_per, 0.0)) / n_present

        cd = safe_norm(centers[:, None, :] - centers[None, :, :], axis=-1)
        pair = (present[:, None] & present[None, :]
                & ~jnp.eye(i_max, dtype=bool))
        n_pair = jnp.sum(pair)
        push = jnp.sum(jnp.where(pair, jax.nn.relu(t_push - cd), 0.0)) \
            / jnp.maximum(n_pair, 1)
        push = jnp.where(jnp.sum(present) > 1, push, 0.0)          # centers==1 -> skip
        return pull, push

    pulls, pushes = jax.vmap(per_item)(pred_feat, gt_label)
    pull_loss = jnp.mean(pulls)
    push_loss = jnp.mean(pushes)
    return pull_loss + push_loss, pull_loss, push_loss


def compute_normal_loss(pred, gt):
    """acos of clamped dot product, mean over all points (loss_utils.py:271-278)."""
    dot = jnp.clip(jnp.sum(pred * gt, axis=-1), -0.99, 0.99)
    return jnp.mean(jnp.arccos(dot))


def compute_nnl_loss(log_probs, gt):
    """NLL over valid (!= -1) points (loss_utils.py:441-455)."""
    b, n, k = log_probs.shape
    valid = gt >= 0
    gt_c = jnp.clip(gt, 0, k - 1)
    nll = -jnp.take_along_axis(log_probs, gt_c[..., None], axis=-1)[..., 0]
    cnt = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(jnp.where(valid, nll, 0.0)) / cnt


_PARAM_SLICES = {5: (0, 4), 1: (4, 8), 4: (8, 15), 3: (15, 22)}
_PARAM_TYPE_ORDER = (1, 4, 5, 3)  # iteration order at loss_utils.py:494


def compute_param_loss(pred, t_gt, t_param_gt):
    """Per-type masked MSE with the reference's skip rules (loss_utils.py:474-535).

    Per (batch item, type): rows of that type with a non-zero gt slice, MSE
    over the type's parameter slice; groups are skipped when empty, when the
    full-22 gt sums to zero, when gt max > 10, or when the group loss > 50.
    Final loss = mean over surviving groups.
    """
    b = pred.shape[0]

    def group_loss(pred_i, tgt_i, pgt_i, typ, lo, hi):
        in_type = tgt_i == typ
        any_rows = jnp.sum(in_type) > 0
        gt_sum_nonzero = jnp.sum(jnp.where(in_type[:, None], pgt_i, 0.0)) != 0
        sl_pred = pred_i[:, lo:hi]
        sl_gt = pgt_i[:, lo:hi]
        row_ok = in_type & (jnp.sum(sl_gt, axis=1) != 0)
        n_rows = jnp.sum(row_ok)
        se = jnp.where(row_ok[:, None], (sl_pred - sl_gt) ** 2, 0.0)
        mse = jnp.sum(se) / jnp.maximum(n_rows * (hi - lo), 1)
        gmax = jnp.max(jnp.where(row_ok[:, None], sl_gt, -jnp.inf))
        ok = any_rows & gt_sum_nonzero & (n_rows > 0) & (gmax <= 10) & (mse <= 50)
        return jnp.where(ok, mse, 0.0), ok

    del b
    total = 0.0
    cnt = 0.0
    # Groups are per-(item, type) independent, so vmap over the batch and keep
    # only the 4 static type slices unrolled: 4 batched reductions instead of
    # 4*B small-op groups (identical value; order of the mean is commutative).
    for typ in _PARAM_TYPE_ORDER:
        lo, hi = _PARAM_SLICES[typ]
        l, ok = jax.vmap(
            lambda p, t, g, typ=typ, lo=lo, hi=hi: group_loss(p, t, g, typ, lo, hi)
        )(pred, t_gt, t_param_gt)
        total = total + jnp.sum(l)
        cnt = cnt + jnp.sum(ok.astype(jnp.float32))
    return total / jnp.maximum(cnt, 1.0)


def offset_loss(pt_offsets, instance_labels, pt_offset_labels):
    """L1 over foreground points (loss_utils.py:297-306)."""
    pos = instance_labels >= 0
    cnt = jnp.sum(pos)
    l1 = jnp.sum(jnp.where(pos[:, None], jnp.abs(pt_offsets - pt_offset_labels), 0.0))
    return jnp.where(cnt > 0, l1 / jnp.maximum(cnt, 1), 0.0)


class InstanceLossAux(NamedTuple):
    cls_loss: jnp.ndarray
    mask_loss: jnp.ndarray
    iou_score_loss: jnp.ndarray
    num_pos: jnp.ndarray
    num_neg: jnp.ndarray


def instance_loss(cls_scores, mask_scores, iou_scores, point_pid, prop_valid,
                  instance_labels, instance_pointnum, instance_cls, inst_valid,
                  num_primitives: int, pos_iou_thr: float = 0.5,
                  bg_cls: int = 0):
    """SoftGroup instance loss (loss_utils.py:308-435).

    cls_scores/iou_scores [P, C]; mask_scores [CH, B*N, C] per-entry logits;
    point_pid [CH, B*N]; instance_* padded to I with ``inst_valid`` mask.
    ``ignore_label`` semantics: instances whose class equals ``bg_cls`` are
    background — 0 on the ABC path (loss_utils.py:310), -100 on the
    scene/ScanNet path (softgroup.py:198-200) — and proposal label C-1 is
    the background class.
    """
    p, c = cls_scores.shape
    i = instance_pointnum.shape[0]
    instance_classes = num_primitives - 1

    ious = miou_ops.mask_iou_on_cluster(point_pid, instance_labels,
                                        instance_pointnum, p, i)   # [P, I]

    fg = inst_valid & (instance_cls != bg_cls)
    any_fg = jnp.sum(fg) > 0
    iou_fg = jnp.where(fg[None, :], ious, -1.0)
    max_iou = jnp.max(iou_fg, axis=1)
    argmax_iou = jnp.argmax(iou_fg, axis=1)
    pos = (max_iou >= pos_iou_thr) & prop_valid
    labels = jnp.where(pos, instance_cls[argmax_iou], instance_classes)  # [P]

    # cls loss: CE mean over valid proposals
    logp = jax.nn.log_softmax(cls_scores, axis=-1)
    ce = -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
    n_valid = jnp.maximum(jnp.sum(prop_valid), 1)
    cls_loss = jnp.sum(jnp.where(prop_valid, ce, 0.0)) / n_valid

    # mask loss: BCE on the entry's labelled-class sigmoid vs mask_label
    ch, n_total, _ = mask_scores.shape
    pid_flat = point_pid.reshape(-1)
    entry_valid = pid_flat >= 0
    pid_c = jnp.clip(pid_flat, 0, p - 1)
    mask_cls = labels[pid_c]                                        # [CH*BN]
    ms = mask_scores.reshape(ch * n_total, c)
    ms_slice = jnp.take_along_axis(ms, mask_cls[:, None], axis=1)[:, 0]
    ms_sig = jax.nn.sigmoid(ms_slice)

    inst_cls_for_label = jnp.where(inst_valid, instance_cls, -100)
    mlabel = miou_ops.mask_label(point_pid, instance_labels, inst_cls_for_label,
                                 ious, pos_iou_thr).reshape(-1)
    w = (mlabel != -1.0) & entry_valid
    tgt = jnp.where(mlabel == -1.0, 0.5, mlabel)
    eps = 1e-7
    bce = -(tgt * jnp.log(ms_sig + eps) + (1 - tgt) * jnp.log(1 - ms_sig + eps))
    mask_loss = jnp.sum(jnp.where(w, bce, 0.0)) / (jnp.sum(w) + 1)

    # iou score loss (loss_utils.py:409-418)
    ms_sig_entries = jnp.where(entry_valid, ms_sig, 0.0).reshape(ch, n_total)
    ious_pred = miou_ops.mask_iou_on_pred(point_pid, instance_labels,
                                          instance_pointnum,
                                          jax.lax.stop_gradient(ms_sig_entries),
                                          p, i)
    gt_ious = jnp.max(jnp.where(fg[None, :], ious_pred, -1.0), axis=1)
    iou_w = (labels < instance_classes) & prop_valid
    iou_slice = jnp.take_along_axis(iou_scores, labels[:, None], axis=1)[:, 0]
    mse = (iou_slice - gt_ious) ** 2
    iou_score_loss = jnp.sum(jnp.where(iou_w, mse, 0.0)) / (jnp.sum(iou_w) + 1)

    zero_all = ~any_fg
    cls_loss = jnp.where(zero_all, 0.0, cls_loss)
    mask_loss = jnp.where(zero_all, 0.0, mask_loss)
    iou_score_loss = jnp.where(zero_all, 0.0, iou_score_loss)

    aux = InstanceLossAux(cls_loss, mask_loss, iou_score_loss,
                          jnp.sum(iou_w).astype(jnp.float32),
                          jnp.sum(prop_valid & ~iou_w).astype(jnp.float32))
    return cls_loss + mask_loss + iou_score_loss, aux
