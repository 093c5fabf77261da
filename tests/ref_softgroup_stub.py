"""CPU stand-ins for the reference's ``softgroup.ops`` CUDA/C++ extension.

These re-express the native kernels' *semantics* in numpy/torch so the
exec-loaded reference model (tests/test_reference_*_parity.py harness) can
run ``forward_train`` / ``forward_test`` END TO END on CPU — closing the
differential-parity gap past the ``forward_grouping`` CUDA boundary
(VERDICT r3 "What's missing" #1).  Nothing here ships in the framework;
it exists only to make the reference executable as a test oracle.

Faithfulness notes (file:line cites into /root/reference):

* ``ballquery_batch_p`` — bfs_cluster.cu:18-120.  Same-batch radius ball
  gated on BOTH adjacency matrices (``adj_inst > thr_inst`` AND
  ``adj_para > thr_para``), per-point neighbour list capped at 3000
  (``idx_temp[3000]`` + break, bfs_cluster.cu:30,53-58).  The CUDA kernel
  assigns CSR starts via ``atomicAdd`` (arrival order — nondeterministic);
  the Python wrapper retries until nothing truncates, so the *content* per
  point is deterministic.  We emit the canonical deterministic layout
  (exclusive cumsum in point order); consumers index via ``start_len`` so
  the layouts are interchangeable.
* ``hierarchical_aggregation`` — hierarchical_aggregation.cpp:11-183 (host
  BFS + fragment/kept/primary split at the hard-coded
  ``class_numpoint_mean_dict``) and hierarchical_aggregation.cu:8-105 (set
  aggregation with MAX_PRIMARY_NUM=6000, 1000 fragments and 3000 absorbed
  points per primary, ``r_set = 0.01 * sqrt(primary_npoint)``).  The CUDA
  absorb list is atomicAdd-ordered; we absorb in ascending fragment index
  (the only deterministic choice; sizes/sets are unaffected unless a cap
  truncates, which the caps tests exercise explicitly).
* ``voxelization_idx`` / ``voxelization`` — voxelize.cpp:11-165 (first-
  occurrence voxel ordering per (batch, coord) key, rulebook rows
  ``[count, rows...]``) and voxelize.cu:9-36 (mode 4 = mean).
* ``sec_min`` / ``sec_max`` / ``sec_mean`` / ``global_avg_pool`` —
  sec_mean.cu / roipool: per-section reduce over ``offsets``.
* ``get_mask_iou_on_cluster`` / ``_on_pred`` / ``get_mask_label`` —
  cal_iou_and_masklabel.cu:9-104.
"""

from __future__ import annotations

import numpy as np
import torch

# hierarchical_aggregation.cpp:7 — statistical per-class instance sizes,
# hard-coded in the C++ (NOT the python-level class_numpoint_mean list the
# model builds at dgcnn-4.py:1157, which feeds the unused bfs_cluster path).
CLASS_NUMPOINT_MEAN_DICT = [-1., -1., 3917., 12056., 2303.,
                            8331., 3948., 3166., 5629., 11719.]

# hierarchical_aggregation.cu:8-11
MAX_PRIMARY_NUM = 6000
MAX_PER_PRIMARY_ABSORB_FRAGMENT_NUM = 1000
MAX_PER_PRIMARY_ABSORB_POINT_NUM = 3000
INFINITY_DIS_SQUARE = 10000.0
# bfs_cluster.cu:30 — per-point neighbour list buffer
BALLQUERY_NEIGHBOR_CAP = 3000


def ballquery_batch_p(coords, batch_idxs, batch_offsets,
                      adj_mat_inst, similarity_threshold_inst,
                      adj_mat_para, similarity_threshold_para,
                      radius, mean_active, neighbor_cap=BALLQUERY_NEIGHBOR_CAP):
    """bfs_cluster.cu:18-120 → (idx int32 [nActive], start_len int32 [n,2])."""
    xyz = np.asarray(coords.detach().cpu(), np.float32)
    bidx = np.asarray(batch_idxs.detach().cpu(), np.int64).reshape(-1)
    ai = np.asarray(adj_mat_inst.detach().cpu(), np.float32)
    ap = np.asarray(adj_mat_para.detach().cpu(), np.float32)
    n = xyz.shape[0]
    d2 = ((xyz[:, None, :] - xyz[None, :, :]) ** 2).sum(-1)
    ok = ((d2 < radius * radius)
          & (ai > similarity_threshold_inst)
          & (ap > similarity_threshold_para)
          & (bidx[:, None] == bidx[None, :]))
    idx_rows, lens = [], np.zeros(n, np.int32)
    for i in range(n):
        nb = np.nonzero(ok[i])[0][:neighbor_cap]
        idx_rows.append(nb)
        lens[i] = len(nb)
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]]).astype(np.int32)
    start_len = np.stack([starts, lens], axis=1)
    idx = (np.concatenate(idx_rows) if idx_rows else
           np.zeros((0,), np.int64)).astype(np.int32)
    return torch.as_tensor(idx), torch.as_tensor(start_len)


def ball_query(coords, batch_idxs, batch_offsets,
               adj_mat_inst, similarity_threshold_inst,
               adj_mat_para, similarity_threshold_para,
               radius, mean_active, with_octree=False):
    """functions.py:93-104 (octree path unused by the ABC model)."""
    assert not with_octree
    return ballquery_batch_p(coords, batch_idxs, batch_offsets,
                             adj_mat_inst, similarity_threshold_inst,
                             adj_mat_para, similarity_threshold_para,
                             radius, mean_active)


def _find_ccs(semantic_label, ball_query_idxs, start_len):
    """hierarchical_aggregation.cpp:11-42: BFS in ascending start index,
    queue (FIFO) discovery order, same-label constraint."""
    from collections import deque

    n = start_len.shape[0]
    visited = np.zeros(n, bool)
    ccs = []
    for i in range(n):
        if visited[i]:
            continue
        comp = [i]
        visited[i] = True
        q = deque([i])
        while q:
            cur = q.popleft()
            s, l = start_len[cur]
            for j in ball_query_idxs[s:s + l]:
                if semantic_label[j] != semantic_label[cur] or visited[j]:
                    continue
                visited[j] = True
                comp.append(j)
                q.append(j)
        ccs.append(comp)
    return ccs


def _fill(ccs, coord_shift, semantic_label, batch_idxs):
    """fill_cluster_idxs_ (hierarchical_aggregation.cpp:84-101)."""
    idxs, offsets, centers = [], [0], []
    for ci, comp in enumerate(ccs):
        offsets.append(offsets[-1] + len(comp))
        comp = np.asarray(comp, np.int64)
        c = coord_shift[comp].mean(0)
        centers.append([c[0], c[1], c[2],
                        float(semantic_label[comp[0]]),
                        float(batch_idxs[comp[0]])])
        idxs.append(np.stack([np.full(len(comp), ci, np.int64), comp], 1))
    idxs = (np.concatenate(idxs, 0) if idxs else np.zeros((0, 2), np.int64))
    return (idxs.astype(np.int32), np.asarray(offsets, np.int32),
            np.asarray(centers, np.float32).reshape(-1, 5))


def hierarchical_aggregation(semantic_label, coord_shift, ball_query_idxs,
                             start_len, batch_idxs, training_mode,
                             using_set_aggr,
                             absorb_fragment_cap=MAX_PER_PRIMARY_ABSORB_FRAGMENT_NUM,
                             absorb_point_cap=MAX_PER_PRIMARY_ABSORB_POINT_NUM,
                             class_numpoint_mean=None):
    """functions.py:7-79 + hierarchical_aggregation.cpp/.cu semantics.

    The cap/mean keyword overrides exist so adversarial tests can make the
    CUDA buffer limits bite at toy sizes (production values are the
    defaults; the reference hard-codes them)."""
    sem = np.asarray(semantic_label.detach().cpu(), np.int64)
    shift = np.asarray(coord_shift.detach().cpu(), np.float32)
    bq = np.asarray(ball_query_idxs.detach().cpu(), np.int64)
    sl = np.asarray(start_len.detach().cpu(), np.int64)
    bidx = np.asarray(batch_idxs.detach().cpu(), np.int64).reshape(-1)

    mean_tbl = (CLASS_NUMPOINT_MEAN_DICT if class_numpoint_mean is None
                else class_numpoint_mean)
    ccs = _find_ccs(sem, bq, sl)
    frag, kept, primary = [], [], []
    for comp in ccs:
        mean = mean_tbl[sem[comp[0]]]
        low, high = 0.05 * mean, 0.3 * mean
        if len(comp) < high:
            frag.append(comp)
            if low <= len(comp) < high:
                kept.append(comp)
        else:
            primary.append(comp)

    kept_idxs, kept_off, _ = _fill(kept, shift, sem, bidx)
    prim_idxs, prim_off, prim_ctr = _fill(primary, shift, sem, bidx)

    if int(using_set_aggr):
        frag_idxs, frag_off, frag_ctr = _fill(frag, shift, sem, bidx)
        prim_idxs, prim_off = _set_aggr(
            frag_idxs, frag_off, frag_ctr, prim_idxs, prim_off, prim_ctr,
            absorb_fragment_cap, absorb_point_cap)

    # functions.py:57-73: kept first, then primaries with shifted ids
    cluster_idxs, cluster_offsets = kept_idxs, kept_off
    if prim_idxs.shape[0] != 0:
        prim_idxs = prim_idxs.copy()
        prim_idxs[:, 0] += cluster_offsets.shape[0] - 1
        prim_off = prim_off + cluster_offsets[-1]
        cluster_idxs = np.concatenate([cluster_idxs, prim_idxs], 0)
        cluster_offsets = np.concatenate([cluster_offsets, prim_off[1:]])
    return (torch.as_tensor(cluster_idxs.astype(np.int32)),
            torch.as_tensor(cluster_offsets.astype(np.int32)))


def _set_aggr(frag_idxs, frag_off, frag_ctr, prim_idxs, prim_off, prim_ctr,
              absorb_fragment_cap=MAX_PER_PRIMARY_ABSORB_FRAGMENT_NUM,
              absorb_point_cap=MAX_PER_PRIMARY_ABSORB_POINT_NUM):
    """hierarchical_aggregation.cu:22-105 with its caps.  Fragments absorb
    in ascending fragment index (CUDA: atomicAdd arrival order)."""
    n_prim = prim_off.shape[0] - 1
    if n_prim == 0:
        return prim_idxs, prim_off
    assert n_prim <= MAX_PRIMARY_NUM
    n_frag = frag_off.shape[0] - 1
    absorb = [[] for _ in range(n_prim)]
    for f in range(n_frag):
        best, best_d2 = -1, INFINITY_DIS_SQUARE
        for p in range(n_prim):
            if abs(prim_ctr[p, 3] - frag_ctr[f, 3]) > 0.1:
                continue
            if abs(prim_ctr[p, 4] - frag_ctr[f, 4]) > 0.1:
                continue
            d2 = float(((prim_ctr[p, :3] - frag_ctr[f, :3]) ** 2).sum())
            if d2 < best_d2:
                best_d2, best = d2, p
        if best < 0:
            continue
        npts = int(prim_off[best + 1] - prim_off[best])
        r_set = 0.01 * np.sqrt(float(npts))
        if best_d2 < r_set * r_set:
            if len(absorb[best]) < absorb_fragment_cap:
                absorb[best].append(f)
    out_idxs, out_off = [], [0]
    for p in range(n_prim):
        rows = [prim_idxs[prim_off[p]:prim_off[p + 1]]]
        budget = absorb_point_cap
        for f in absorb[p]:
            pts = frag_idxs[frag_off[f]:frag_off[f + 1], 1][:budget]
            budget -= len(pts)
            rows.append(np.stack([np.full(len(pts), p, np.int32), pts], 1))
            if budget <= 0:
                break
        rows = np.concatenate(rows, 0)
        out_idxs.append(rows)
        out_off.append(out_off[-1] + rows.shape[0])
    return (np.concatenate(out_idxs, 0).astype(np.int32),
            np.asarray(out_off, np.int32))


def voxelization_idx(coords, batchsize, mode=4):
    """voxelize.cpp:11-165 → (output_coords long [M,4], input_map int [N],
    output_map int [M, maxActive+1]); first-occurrence voxel order."""
    c = np.asarray(coords.detach().cpu(), np.int64)
    n = c.shape[0]
    vox, rows_per_vox, input_map = {}, [], np.zeros(n, np.int32)
    first_row = []
    for i in range(n):
        key = tuple(c[i])
        if key not in vox:
            vox[key] = len(rows_per_vox)
            rows_per_vox.append([])
            first_row.append(i)
        v = vox[key]
        rows_per_vox[v].append(i)
        input_map[i] = v
    m = len(rows_per_vox)
    max_active = max((len(r) for r in rows_per_vox), default=1)
    out_map = np.zeros((m, max_active + 1), np.int32)
    for v, rows in enumerate(rows_per_vox):
        out_map[v, 0] = len(rows)
        out_map[v, 1:1 + len(rows)] = rows
    out_coords = c[first_row] if m else np.zeros((0, c.shape[1]), np.int64)
    return (torch.as_tensor(out_coords), torch.as_tensor(input_map),
            torch.as_tensor(out_map))


def voxelization(feats, map_rule, mode=4):
    """voxelize.cu:9-36 (mode 4 = mean over the rule rows)."""
    f = feats
    r = map_rule.detach().cpu().numpy()
    m = r.shape[0]
    out = f.new_zeros((m, f.shape[1]))
    for v in range(m):
        cnt = int(r[v, 0])
        rows = torch.as_tensor(r[v, 1:1 + cnt].astype(np.int64))
        if cnt:
            out[v] = f[rows].mean(0)
    return out


def _sec_reduce(inp, offsets, red):
    off = np.asarray(offsets.detach().cpu(), np.int64)
    outs = []
    for p in range(off.shape[0] - 1):
        seg = inp[off[p]:off[p + 1]]
        outs.append(red(seg) if seg.shape[0] else inp.new_zeros(inp.shape[1]))
    return (torch.stack(outs) if outs else
            inp.new_zeros((0, inp.shape[1])))


def sec_min(inp, offsets):
    return _sec_reduce(inp, offsets, lambda s: s.min(0).values)


def sec_max(inp, offsets):
    return _sec_reduce(inp, offsets, lambda s: s.max(0).values)


def sec_mean(inp, offsets):
    return _sec_reduce(inp, offsets, lambda s: s.mean(0))


def global_avg_pool(feats, proposals_offset):
    return sec_mean(feats, proposals_offset)


def get_mask_iou_on_cluster(proposals_idx, proposals_offset, instance_labels,
                            instance_pointnum):
    """cal_iou_and_masklabel.cu:9-34.  NB the kernel reads the flat point
    column (call sites pass ``proposals_idx[:, 1]``)."""
    pidx = np.asarray(proposals_idx.detach().cpu(), np.int64)
    off = np.asarray(proposals_offset.detach().cpu(), np.int64)
    labels = np.asarray(instance_labels.detach().cpu(), np.int64)
    pn = np.asarray(instance_pointnum.detach().cpu(), np.int64)
    n_prop, n_inst = off.shape[0] - 1, pn.shape[0]
    iou = np.zeros((n_prop, n_inst), np.float32)
    for p in range(n_prop):
        lab = labels[pidx[off[p]:off[p + 1]]]
        total = off[p + 1] - off[p]
        for i in range(n_inst):
            inter = int((lab == i).sum())
            iou[p, i] = inter / float(total + pn[i] - inter + 1e-5)
    return torch.as_tensor(iou)


def get_mask_iou_on_pred(proposals_idx, proposals_offset, instance_labels,
                         instance_pointnum, mask_scores_sigmoid):
    """cal_iou_and_masklabel.cu:36-68 (mask > 0.5 filters both sides)."""
    pidx = np.asarray(proposals_idx.detach().cpu(), np.int64)
    off = np.asarray(proposals_offset.detach().cpu(), np.int64)
    labels = np.asarray(instance_labels.detach().cpu(), np.int64)
    pn = np.asarray(instance_pointnum.detach().cpu(), np.int64)
    ms = np.asarray(mask_scores_sigmoid.detach().cpu(),
                    np.float32).reshape(-1)
    n_prop, n_inst = off.shape[0] - 1, pn.shape[0]
    iou = np.zeros((n_prop, n_inst), np.float32)
    for p in range(n_prop):
        sl = slice(off[p], off[p + 1])
        keep = ms[sl] > 0.5
        lab = pidx[sl][keep]
        lab = labels[lab]
        total = int(keep.sum())
        for i in range(n_inst):
            inter = int((lab == i).sum())
            iou[p, i] = inter / float(total + pn[i] - inter + 1e-5)
    return torch.as_tensor(iou)


def get_mask_label(proposals_idx, proposals_offset, instance_labels,
                   instance_cls, instance_pointnum, proposals_iou, iou_thr):
    """cal_iou_and_masklabel.cu:70-104 (-1 = ignored, argmax over
    non-ignored instances, labels set only when max_iou >= thr)."""
    pidx = np.asarray(proposals_idx.detach().cpu(), np.int64)
    off = np.asarray(proposals_offset.detach().cpu(), np.int64)
    labels = np.asarray(instance_labels.detach().cpu(), np.int64)
    icls = np.asarray(instance_cls.detach().cpu(), np.int64)
    iou = np.asarray(proposals_iou.detach().cpu(), np.float32)
    out = -np.ones(pidx.shape[0], np.float32)
    for p in range(off.shape[0] - 1):
        max_iou, max_ind = 0.0, 0
        for i in range(iou.shape[1]):
            if iou[p, i] > max_iou and icls[i] != -100:
                max_iou, max_ind = iou[p, i], i
        if max_iou >= iou_thr:
            sl = slice(off[p], off[p + 1])
            out[sl] = (labels[pidx[sl]] == max_ind).astype(np.float32)
    return torch.as_tensor(out)


# ----------------------------------------------------------------------------
# Vendored-SoftGroup (scene family) CUDA-boundary stubs.  The signatures here
# are the ORIGINAL SoftGroup ones that softgroup/model/softgroup.py:450-459
# actually calls — functions.py:87-91 (commented original) / bfs_cluster.cpp.
# (GCANet's modified functions.py:93-104 added affinity args the vendored
# scene model never passes, so the scene path is exec-run with these.)
# ----------------------------------------------------------------------------

def softgroup_ball_query(coords, batch_idxs, batch_offsets, radius,
                         mean_active, with_octree=False):
    """Original ball_query (functions.py:87-91 -> ballquery_batch_p).

    The python wrapper retries with a grown ``mean_active`` until every
    neighbour fits (functions.py:147-154), so the result is the COMPLETE
    radius graph within each batch item in ascending neighbour index order.
    The CUDA kernel includes the self match (d2=0 passes, bfs_cluster.cu:
    42-50, no i==j skip); self-loops are BFS-neutral, so they are dropped
    here.
    """
    assert not with_octree
    xyz = np.asarray(coords.detach().cpu(), np.float32)
    bidx = np.asarray(batch_idxs.detach().cpu(), np.int64).reshape(-1)
    n = xyz.shape[0]
    d2 = ((xyz[:, None, :] - xyz[None, :, :]) ** 2).sum(-1)
    ok = ((d2 < radius * radius)
          & (bidx[:, None] == bidx[None, :])
          & ~np.eye(n, dtype=bool))
    idx_rows, lens = [], np.zeros(n, np.int32)
    for i in range(n):
        nb = np.nonzero(ok[i])[0]
        idx_rows.append(nb)
        lens[i] = len(nb)
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]]).astype(np.int32)
    start_len = np.stack([starts, lens], axis=1)
    idx = (np.concatenate(idx_rows) if idx_rows else
           np.zeros((0,), np.int64)).astype(np.int32)
    return torch.as_tensor(idx), torch.as_tensor(start_len)


def softgroup_bfs_cluster(class_numpoint_mean, ball_query_idxs, start_len,
                          npoint_thr, class_id):
    """bfs_cluster (bfs_cluster.cpp:122-155): BFS CCs over the subset graph,
    keep clusters with size >= npoint_thr * class_numpoint_mean[class_id]
    (plain npoint_thr when the mean is -1, :88-94); clusters emitted in
    find_cc scan order (ascending min subset index, :79-103)."""
    from collections import deque

    idx = np.asarray(ball_query_idxs.detach().cpu(), np.int64)
    sl = np.asarray(start_len.detach().cpu(), np.int64)
    means = np.asarray(class_numpoint_mean.detach().cpu(), np.float32)
    n = sl.shape[0]
    visited = np.zeros(n, bool)
    mean = float(means[class_id])
    thr = npoint_thr if mean == -1.0 else npoint_thr * mean
    ccs = []
    for i in range(n):
        if visited[i]:
            continue
        comp = [i]
        visited[i] = True
        q = deque([i])
        while q:
            cur = q.popleft()
            s, ln = sl[cur]
            for j in idx[s:s + ln]:
                if visited[j]:
                    continue
                visited[j] = True
                comp.append(int(j))
                q.append(int(j))
        if len(comp) >= thr:
            ccs.append(comp)
    idxs, offsets = [], [0]
    for ci, comp in enumerate(ccs):
        offsets.append(offsets[-1] + len(comp))
        idxs.append(np.stack([np.full(len(comp), ci, np.int64),
                              np.asarray(comp, np.int64)], 1))
    idxs = (np.concatenate(idxs, 0) if idxs else np.zeros((0, 2), np.int64))
    return (torch.as_tensor(idxs.astype(np.int32)),
            torch.as_tensor(np.asarray(offsets, np.int32)))
