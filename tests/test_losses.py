"""Loss-function oracle tests: independent numpy loops implementing the
documented reference semantics (utils/loss_utils.py) vs the vectorised
implementations."""

import jax.numpy as jnp
import numpy as np
import pytest

from gcanet_tpu.losses import losses as L
from gcanet_tpu.ops import mask_iou as MI


def _embedding_oracle(feat, lbl, t_pull=0.5, t_push=1.5):
    b = feat.shape[0]
    pull_total, push_total = 0.0, 0.0
    for i in range(b):
        ids = [j for j in range(-1, lbl[i].max() + 1) if (lbl[i] == j).any()]
        centers = []
        pull = 0.0
        for j in ids:
            f = feat[i][lbl[i] == j]
            c = f.mean(0)
            centers.append(c)
            d = np.linalg.norm(f - c, axis=1) - t_pull
            pull += np.maximum(d, 0).mean()
        pull_total += pull / len(ids)
        centers = np.stack(centers)
        if len(centers) > 1:
            dst = np.linalg.norm(centers[:, None] - centers[None], axis=2)
            off = dst[~np.eye(len(centers), dtype=bool)]
            push_total += np.maximum(t_push - off, 0).mean()
    return pull_total / b + push_total / b, pull_total / b, push_total / b


def test_embedding_loss_matches_oracle():
    rng = np.random.RandomState(0)
    b, n, k = 2, 120, 8
    feat = rng.randn(b, n, k).astype(np.float32)
    lbl = rng.randint(-1, 5, size=(b, n))
    got, gpull, gpush = L.compute_embedding_loss(jnp.asarray(feat), jnp.asarray(lbl), 16)
    ref, rpull, rpush = _embedding_oracle(feat, lbl)
    np.testing.assert_allclose(float(gpull), rpull, rtol=1e-4)
    np.testing.assert_allclose(float(gpush), rpush, rtol=1e-4)
    np.testing.assert_allclose(float(got), ref, rtol=1e-4)


def test_embedding_loss_single_cluster_skips_push():
    feat = np.random.RandomState(1).randn(1, 30, 4).astype(np.float32)
    lbl = np.zeros((1, 30), np.int64)
    _, _, push = L.compute_embedding_loss(jnp.asarray(feat), jnp.asarray(lbl), 8)
    assert float(push) == 0.0


def test_normal_loss():
    rng = np.random.RandomState(2)
    p = rng.randn(2, 50, 3).astype(np.float32)
    g = rng.randn(2, 50, 3).astype(np.float32)
    p /= np.linalg.norm(p, axis=-1, keepdims=True)
    g /= np.linalg.norm(g, axis=-1, keepdims=True)
    got = float(L.compute_normal_loss(jnp.asarray(p), jnp.asarray(g)))
    ref = np.arccos(np.clip((p * g).sum(-1), -0.99, 0.99)).mean()
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_nnl_loss_ignores_background():
    rng = np.random.RandomState(3)
    logits = rng.randn(1, 40, 7).astype(np.float32)
    logp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    gt = rng.randint(-1, 7, size=(1, 40))
    got = float(L.compute_nnl_loss(jnp.asarray(logp), jnp.asarray(gt)))
    valid = gt[0] >= 0
    ref = -logp[0][valid, gt[0][valid]].mean()
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def _param_oracle(pred, t_gt, t_param_gt):
    param_list = {5: (0, 4), 1: (4, 8), 4: (8, 15), 3: (15, 22)}
    total, cnt = 0.0, 0
    for b in range(pred.shape[0]):
        for i in (1, 4, 5, 3):
            index = t_gt[b] == i
            tp, tg = pred[b][index], t_param_gt[b][index]
            if tp.shape[0] == 0 or tg.sum() == 0:
                continue
            lo, hi = param_list[i]
            tp, tg = tp[:, lo:hi], tg[:, lo:hi]
            vm = tg.sum(1) != 0
            tp, tg = tp[vm], tg[vm]
            if tg.shape[0] == 0:
                continue
            loss = ((tp - tg) ** 2).mean()
            if tg.max() > 10 or loss > 50:
                continue
            total += loss
            cnt += 1
    return total / max(cnt, 1)


def test_param_loss_matches_oracle():
    rng = np.random.RandomState(4)
    b, n = 2, 60
    pred = rng.randn(b, n, 22).astype(np.float32)
    t_gt = rng.randint(0, 7, size=(b, n))
    t_param = rng.randn(b, n, 22).astype(np.float32)
    # zero out some rows to exercise the valid-row mask
    t_param[t_gt == 4] = 0.0
    got = float(L.compute_param_loss(jnp.asarray(pred), jnp.asarray(t_gt),
                                     jnp.asarray(t_param)))
    ref = _param_oracle(pred, t_gt, t_param)
    np.testing.assert_allclose(got, ref, rtol=1e-4)


def test_offset_loss():
    rng = np.random.RandomState(5)
    n = 100
    off = rng.randn(n, 3).astype(np.float32)
    gt = rng.randn(n, 3).astype(np.float32)
    inst = rng.randint(-1, 4, size=n)
    got = float(L.offset_loss(jnp.asarray(off), jnp.asarray(inst), jnp.asarray(gt)))
    pos = inst >= 0
    ref = np.abs(off[pos] - gt[pos]).sum() / pos.sum()
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_mask_iou_on_cluster_oracle():
    rng = np.random.RandomState(6)
    n, p, i = 200, 5, 4
    pid = rng.randint(-1, p, size=(1, n)).astype(np.int32)
    inst = rng.randint(-1, i, size=n)
    pointnum = np.array([(inst == j).sum() for j in range(i)], np.int32)
    got = np.asarray(MI.mask_iou_on_cluster(jnp.asarray(pid), jnp.asarray(inst),
                                            jnp.asarray(pointnum), p, i))
    for pp in range(p):
        for ii in range(i):
            mem = pid[0] == pp
            inter = (mem & (inst == ii)).sum()
            ref = inter / (mem.sum() + pointnum[ii] - inter + 1e-5)
            np.testing.assert_allclose(got[pp, ii], ref, rtol=1e-4)


def test_mask_label_semantics():
    # proposal 0 overlaps instance 1 with IoU >= 0.5 -> labelled by membership;
    # proposal 1 has low IoU -> all -1
    pid = np.full((1, 20), -1, np.int32)
    pid[0, :10] = 0
    pid[0, 10:14] = 1
    inst = np.full(20, -1)
    inst[:8] = 1                    # 8 of proposal-0's 10 points in instance 1
    inst[14:20] = 0
    pointnum = np.array([6, 8], np.int32)
    ious = np.asarray(MI.mask_iou_on_cluster(jnp.asarray(pid), jnp.asarray(inst),
                                             jnp.asarray(pointnum), 2, 2))
    lbl = np.asarray(MI.mask_label(jnp.asarray(pid), jnp.asarray(inst),
                                   jnp.asarray(np.array([3, 4])), jnp.asarray(ious), 0.5))
    assert (lbl[0, :8] == 1).all()
    assert (lbl[0, 8:10] == 0).all()
    assert (lbl[0, 10:14] == -1).all()   # low-iou proposal ignored
    assert (lbl[0, 14:] == -1).all()     # not in any proposal


def test_instance_loss_runs_and_zero_when_no_fg():
    rng = np.random.RandomState(7)
    p, c, n, i = 6, 7, 100, 5
    cls_scores = jnp.asarray(rng.randn(p, c).astype(np.float32))
    iou_scores = jnp.asarray(rng.randn(p, c).astype(np.float32))
    mask_scores = jnp.asarray(rng.randn(2, n, c).astype(np.float32))
    pid = np.full((2, n), -1, np.int32)
    pid[0, :60] = rng.randint(0, p, size=60)
    inst = rng.randint(-1, i, size=n)
    pointnum = np.array([(inst == j).sum() for j in range(i)], np.int32)
    icls = np.array([1, 2, 3, 4, 5], np.int64)
    valid = np.ones(i, bool)
    prop_valid = np.ones(p, bool)
    loss, aux = L.instance_loss(cls_scores, mask_scores, iou_scores,
                                jnp.asarray(pid), jnp.asarray(prop_valid),
                                jnp.asarray(inst), jnp.asarray(pointnum),
                                jnp.asarray(icls), jnp.asarray(valid), 7)
    assert np.isfinite(float(loss))
    # all instances class 0 -> background only -> zero loss
    loss0, _ = L.instance_loss(cls_scores, mask_scores, iou_scores,
                               jnp.asarray(pid), jnp.asarray(prop_valid),
                               jnp.asarray(inst), jnp.asarray(pointnum),
                               jnp.asarray(np.zeros(i, np.int64)), jnp.asarray(valid), 7)
    assert float(loss0) == 0.0


def test_device_voxelization_idx_matches_native():
    """The jnp parity voxeliser must agree with the C++/numpy dedupe (the
    previous int64 packing silently truncated under x64-disabled JAX)."""
    from gcanet_tpu.data import native
    from gcanet_tpu.ops import voxelize as V

    rng = np.random.RandomState(11)
    coords = np.concatenate([rng.randint(0, 3, (400, 1)),
                             rng.randint(-6, 6, (400, 3))], axis=1)
    out_ref, p2v_ref, v_ref = native.voxelize_idx(coords)
    out, p2v, v = V.voxelization_idx(jnp.asarray(coords), max_voxels=400)
    assert int(v) == v_ref
    np.testing.assert_array_equal(np.asarray(p2v), p2v_ref)
    np.testing.assert_array_equal(np.asarray(out)[:v_ref], out_ref)
