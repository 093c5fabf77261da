"""Differential parity: SoftGroup instance loss vs the reference's.

The reference's instance_loss (softgroup/model/softgroup.py:173-255) calls
three CUDA ops (mask IoU on cluster/pred, mask labels).  Those are injected
here as thin adapters over OUR XLA implementations (ops/mask_iou.py — each
oracle-tested separately against the documented kernel semantics), expressed
on the same clustering in both representations (reference CSR rows / our
assignment channels).  What this differential therefore validates is the
LOSS LOGIC itself: IoU>=thr assignment, detection-style cls CE with
background class K, per-entry BCE mask supervision with ignore weighting,
and the max-IoU MSE iou-score target.  Skips where the snapshot is absent.
"""

import pathlib
import types

import jax.numpy as jnp
import numpy as np
import pytest

from gcanet_tpu.losses.losses import instance_loss as ours_instance_loss
from gcanet_tpu.ops import mask_iou as miou_ops

REF = pathlib.Path("/root/reference/softgroup/model/softgroup.py")

pytestmark = pytest.mark.skipif(not REF.exists(),
                                reason="reference snapshot not available")


def _load_instance_loss(op_impls):
    from tests.test_reference_encoder_parity import _strip_imports

    ns = {
        "__file__": str(REF), "spconv": None,
        "cuda_cast": lambda f: f,
        "force_fp32": lambda *a, **k: (lambda f: f),
        "rle_decode": None, "rle_encode": None,
        "MLP": None, "ResidualBlock": None, "UBlock": None,
        "ball_query": None, "bfs_cluster": None,
        "global_avg_pool": None, "sec_max": None, "sec_min": None,
        "voxelization": None, "voxelization_idx": None,
        **op_impls,
    }
    out, skip = [], False
    for line in REF.read_text().splitlines():
        if skip:
            skip = ")" not in line
            continue
        if line.strip().startswith("from ."):
            skip = "(" in line and ")" not in line
            continue
        out.append(line)
    src = _strip_imports("\n".join(out)).replace(".cuda()", "")
    exec(compile(src, str(REF), "exec"), ns)
    return ns["SoftGroup"].instance_loss


@pytest.mark.parametrize("seed", range(3))
def test_instance_loss_matches_reference(seed):
    import torch

    rng = np.random.RandomState(seed)
    n, p, gt_i, ch = 900, 5, 4, 2
    c = 7                                   # cls columns; bg class = c-1

    # clustering roughly tracking the gt instances so IoUs straddle 0.5
    inst_labels = -np.ones(n, np.int64)
    pos = 0
    for g in range(gt_i):
        size = int(rng.randint(120, 220))
        inst_labels[pos:pos + size] = g
        pos += size
    point_pid = -np.ones((ch, n), np.int32)
    pos = 0
    for pid in range(p):
        size = int(rng.randint(100, 240))
        point_pid[0, pos:pos + size] = pid
        pos += size
    sel = rng.rand(n) < 0.08
    point_pid[1, sel] = rng.randint(0, p, int(sel.sum()))

    pointnum = np.array([(inst_labels == g).sum() for g in range(gt_i)],
                        np.int32)
    inst_cls = rng.randint(0, c - 1, gt_i)
    inst_cls[0] = -100                      # an ignored gt instance

    cls_scores = rng.randn(p, c).astype(np.float32)
    iou_scores = rng.randn(p, c).astype(np.float32)
    mask_scores_ch = rng.randn(ch, n, c).astype(np.float32)

    # ---- reference CSR view: rows sorted by proposal id
    rows = []
    for cc in range(ch):
        for pt in np.nonzero(point_pid[cc] >= 0)[0]:
            rows.append((point_pid[cc, pt], pt, cc))
    rows.sort()
    proposals_idx = torch.as_tensor(
        np.asarray([(r[0], r[1]) for r in rows], np.int32))
    row_pid = np.asarray([r[0] for r in rows], np.int64)
    proposals_offset = torch.as_tensor(np.concatenate(
        [[0], np.cumsum(np.bincount(row_pid, minlength=p))]).astype(np.int32))
    mask_scores_rows = torch.as_tensor(
        np.stack([mask_scores_ch[r[2], r[1]] for r in rows]))

    jp = jnp.asarray(point_pid)
    ji = jnp.asarray(inst_labels)
    jn = jnp.asarray(pointnum)

    def ref_iou_on_cluster(pidx, poff, ilabels, ipointnum):
        return torch.as_tensor(np.array(miou_ops.mask_iou_on_cluster(
            jp, ji, jn, p, gt_i)))

    def ref_mask_label(pidx, poff, ilabels, icls, ipointnum, ious, thr):
        ml = np.asarray(miou_ops.mask_label(
            jp, ji, jnp.asarray(inst_cls), jnp.asarray(ious.numpy()), thr))
        return torch.as_tensor(
            np.asarray([ml[r[2], r[1]] for r in rows], np.float32))

    def ref_iou_on_pred(pidx, poff, ilabels, ipointnum, sig_rows):
        sig_ch = np.zeros((ch, n), np.float32)
        for r, s in zip(rows, sig_rows.numpy()):
            sig_ch[r[2], r[1]] = s
        return torch.as_tensor(np.array(miou_ops.mask_iou_on_pred(
            jp, ji, jn, jnp.asarray(sig_ch), p, gt_i)))

    ref_fn = _load_instance_loss({
        "get_mask_iou_on_cluster": ref_iou_on_cluster,
        "get_mask_label": ref_mask_label,
        "get_mask_iou_on_pred": ref_iou_on_pred,
    })
    fake_self = types.SimpleNamespace(
        ignore_label=-100, instance_classes=c - 1,
        train_cfg=types.SimpleNamespace(pos_iou_thr=0.5))
    want = ref_fn(fake_self, torch.as_tensor(cls_scores),
                  mask_scores_rows, torch.as_tensor(iou_scores),
                  proposals_idx, proposals_offset,
                  torch.as_tensor(inst_labels),
                  torch.as_tensor(pointnum.astype(np.int64)),
                  torch.as_tensor(inst_cls),
                  torch.as_tensor(row_pid))

    total, aux = ours_instance_loss(
        jnp.asarray(cls_scores), jnp.asarray(mask_scores_ch),
        jnp.asarray(iou_scores), jp, jnp.ones(p, bool), ji, jn,
        jnp.asarray(inst_cls), jnp.ones(gt_i, bool), num_primitives=c,
        bg_cls=-100)

    np.testing.assert_allclose(float(aux.cls_loss), float(want["cls_loss"]),
                               atol=1e-4)
    np.testing.assert_allclose(float(aux.mask_loss), float(want["mask_loss"]),
                               atol=1e-4)
    np.testing.assert_allclose(float(aux.iou_score_loss),
                               float(want["iou_score_loss"]), atol=1e-4)
    np.testing.assert_allclose(float(aux.num_pos), float(want["num_pos"]),
                               atol=0)
