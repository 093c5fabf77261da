"""TPU-native instance grouping: gated ball query + connected components + HAIS.

This module replaces the reference's CUDA/C++ clustering stack:
  * adjacency-gated ball query      (softgroup/ops/src/bfs_cluster/bfs_cluster.cu:18-120)
  * affinity matrices               (models/dgcnn-hais-concat-direct-4.py:210-233, 1218-1220)
  * BFS connected components        (hierarchical_aggregation.cpp:11-42)
  * fragment/kept/primary split     (hierarchical_aggregation.cpp:44-80)
  * HAIS set aggregation            (hierarchical_aggregation.cu:22-105)
  * proposal merge / ordering       (dgcnn-4.py:1272-1287, functions.py:54-72)

Design notes (why this is not a port):

* The reference materialises two N x N affinity matrices per (item, class) as
  ``exp(-(d/d_max)^2 / 2)`` and gates the radius graph on ``aff > thr``
  (bfs_cluster.cu:48-52).  Since ``exp`` is monotone, the gate is equivalent to
  the pure distance test ``d^2 < d_max^2 * (-2 ln thr)`` — so we never build the
  affinity matrices at all; we build one boolean neighbour matrix per batch item
  covering all classes at once (class-equality is part of the gate, and the
  per-class normaliser ``d_max`` enters as a per-class scalar).

* The sequential host BFS becomes iterative min-label propagation with pointer
  jumping (Shiloach–Vishkin style): O(log N) full sweeps over the dense
  neighbour mask inside ``lax.while_loop``.  The neighbour relation here is
  symmetric by construction, so undirected connectivity matches the BFS result.
  (Deviation: the CUDA kernel caps neighbour lists at 3000 and truncates the
  global CSR at N*meanActive; we have no such caps.)

* Proposals are returned as fixed-shape per-point assignment channels instead
  of a dynamic CSR: channel 0 is the point's own kept/primary cluster, channel
  1 is the primary that absorbed the point's fragment under set-aggregation
  (test only).  Proposal ids are ordered exactly like the reference merge loop:
  by (batch item, class, kept-before-primary, discovery order), truncated to
  ``max_proposals`` (dgcnn-4.py:749-752 applies the cap in training only).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from gcanet_tpu.config import GroupingConfig
from gcanet_tpu.ops import knn as knn_ops

_BIG_F = 1e30
# plain int, NOT jnp.int32(...): a module-level jnp scalar would initialise
# the jax backend at import time (committing to the tunnelled TPU before any
# entry point can pin GCA_PLATFORM=cpu — and hanging forever if the relay is
# dead).  Weak-typed python ints bind to the surrounding int32 dtype anyway.
_BIG_I = 2**30


class Proposals(NamedTuple):
    """Fixed-shape proposal set over a flattened batch of B*N points.

    point_pid:  [2, B*N] int32 — proposal id per point per channel, -1 if none.
                Channel 0: own cluster (kept fragment or primary).
                Channel 1: absorbing primary under set aggregation (else -1).
    valid:      [P] bool   — proposal slot used.
    cls:        [P] int32  — semantic class of the proposal (-1 if unused).
    batch:      [P] int32  — batch item of the proposal (-1 if unused).
    size:       [P] int32  — number of channel-0 points (cluster size pre-absorb).
    num:        scalar int32 — number of valid proposals.
    """

    point_pid: jnp.ndarray
    valid: jnp.ndarray
    cls: jnp.ndarray
    batch: jnp.ndarray
    size: jnp.ndarray
    num: jnp.ndarray


def _masked_max(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    return jnp.max(jnp.where(mask, x, -_BIG_F))


def gated_neighbor_mask(
    shifted: jnp.ndarray,      # [N, 3] coords + predicted offsets
    cls: jnp.ndarray,          # [N] int32 semantic argmax
    emb: jnp.ndarray,          # [N, E] embedding features
    param: jnp.ndarray,        # [N, 22] primitive parameters
    num_classes: int,
    cfg: GroupingConfig,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """One batch item's gated radius graph over all classes.

    Returns (nbr [N, N] bool, class_valid [num_classes] bool).

    Semantics per bfs_cluster.cu:48-52 with the affinity construction of
    dgcnn-4.py:210-233 folded into distance-domain thresholds (see module doc).
    The affinity normaliser is ``max`` over the class subset's pairwise
    distances (the subtracted ``min`` is always 0 because the diagonal is
    zeroed at dgcnn-4.py:219).
    """
    n = shifted.shape[0]
    same_class = cls[:, None] == cls[None, :]
    eye = jnp.eye(n, dtype=bool)
    offdiag_same = same_class & ~eye

    counts = jnp.bincount(jnp.clip(cls, 0, num_classes - 1), length=num_classes)
    class_valid = counts >= cfg.min_npoint
    pt_class_ok = class_valid[jnp.clip(cls, 0, num_classes - 1)]

    d_geo2 = knn_ops.pairwise_sqdist(shifted)
    nbr = offdiag_same & (d_geo2 < cfg.radius**2)
    nbr = nbr & pt_class_ok[:, None] & pt_class_ok[None, :]

    def class_gate(feats: jnp.ndarray, thr: float) -> jnp.ndarray:
        d2 = jnp.maximum(knn_ops.pairwise_sqdist(feats), 0.0)
        # per-class max over same-class pairs (incl. diagonal zeros — harmless
        # for a max of non-negative values): max_{i,j same class c} d2[i,j]
        flat_cls = jnp.clip(cls, 0, num_classes - 1)
        row_max = jax.ops.segment_max(
            jnp.max(jnp.where(same_class, d2, -_BIG_F), axis=1),
            flat_cls, num_segments=num_classes)
        dmax2 = jnp.maximum(row_max, 0.0)
        # aff = exp(-(d/dmax)^2/2) > thr  <=>  d^2 < dmax^2 * (-2 ln thr)
        if thr <= 0.0:
            # exp(..) > 0 always holds off-diagonal (and the diagonal is
            # excluded already); the zeroed diagonal fails "0 > 0" — matches.
            return jnp.ones_like(d2, dtype=bool)
        scale = -2.0 * math.log(thr)
        lim = dmax2[flat_cls] * scale                       # [N]
        return d2 < lim[:, None]

    nbr = nbr & class_gate(emb, cfg.similarity_threshold_inst)
    if cfg.similarity_threshold_para > 0.0:
        nbr = nbr & class_gate(param, cfg.similarity_threshold_para)
    if cfg.neighbor_cap:
        # bfs_cluster.cu:30,53-58: each point's neighbour list keeps only its
        # first ``cap`` gated neighbours in ascending index order (the CUDA
        # idx_temp buffer).  This makes the graph DIRECTED (row = out-edges);
        # connected_components must then propagate along edge direction
        # (see build_proposals) to reproduce the reference's BFS exactly.
        cum = jnp.cumsum(nbr.astype(jnp.int32), axis=1)
        nbr = nbr & (cum <= cfg.neighbor_cap)
    return nbr, class_valid


def connected_components(nbr: jnp.ndarray, max_iters: int = 64,
                         impl: str = "xla") -> jnp.ndarray:
    """Min-label propagation over a boolean adjacency (row = out-edges).

    For the default SYMMETRIC graphs this computes undirected connected
    components: per-point root label = min point index in the component.
    Under ``neighbor_cap`` the caller feeds the TRANSPOSED directed capped
    graph (build_proposals), and the same fixpoint equals the reference
    BFS's min-reaching-index labels along the original out-edges.  Directed
    chains propagate one hop per sweep where pointer jumping cannot shortcut
    (jumps follow label values, which on a directed graph need not be
    reachable sources), so worst-case depth is O(N) vs O(log N); with the
    default ``cc_max_iters=64`` budget a directed chain longer than ~64
    unconverged hops would return silently unconverged labels — acceptable
    because capped graphs only arise under --strict_caps with cap 3000,
    where real degree distributions converge in a few sweeps
    (tests/test_grouping_caps.py fuzzes this against a directed-BFS oracle).
    Replaces the host BFS at hierarchical_aggregation.cpp:11-42.

    impl: "auto" (pallas on TPU — adopted round 3, +1.3% end-to-end paired;
    xla elsewhere), "xla" (select+min reduce per sweep) or "pallas" (tiled
    int8 VMEM sweep; ops/cc_pallas.py — interpreter-lowered off-TPU).
    """
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "pallas":
        from gcanet_tpu.ops import cc_pallas

        return cc_pallas.connected_components_pallas(nbr, max_iters)
    n = nbr.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)

    def body(state):
        labels, _, it = state
        # full sweep: min over neighbours' labels
        nbr_min = jnp.min(jnp.where(nbr, labels[None, :], _BIG_I), axis=1)
        new = jnp.minimum(labels, nbr_min.astype(jnp.int32))
        # pointer jumping (path compression), a few cheap gathers
        new = jnp.minimum(new, new[new])
        new = jnp.minimum(new, new[new])
        changed = jnp.any(new != labels)
        return new, changed, it + 1

    def cond(state):
        _, changed, it = state
        return changed & (it < max_iters)

    labels, _, _ = jax.lax.while_loop(cond, body, (idx, jnp.bool_(True), 0))
    return labels


def _cc_stats(labels: jnp.ndarray, shifted: jnp.ndarray):
    """Per-point component size and centroid of the shifted coords.

    hierarchical_aggregation.cpp:83-98 accumulates (x, y, z) sums per CC; the
    centres drive set aggregation.
    """
    n = labels.shape[0]
    ones = jnp.ones((n,), jnp.int32)
    size_at_root = jax.ops.segment_sum(ones, labels, num_segments=n)
    sum_at_root = jax.ops.segment_sum(shifted, labels, num_segments=n)
    csize = size_at_root[labels]
    center_at_root = sum_at_root / jnp.maximum(size_at_root, 1)[:, None]
    return csize, size_at_root, center_at_root


def build_proposals(
    shifted: jnp.ndarray,       # [B, N, 3]
    cls: jnp.ndarray,           # [B, N] int32
    emb: jnp.ndarray,           # [B, N, E]
    param: jnp.ndarray,         # [B, N, 22]
    num_classes: int,
    cfg: GroupingConfig,
    max_proposals: int,
    using_set_aggr: bool = False,
) -> Proposals:
    """Full grouping pass over a batch; everything static-shape under jit."""
    b, n, _ = shifted.shape
    n_total = b * n
    # The proposal ordering below encodes (batch, class, kept<primary, idx)
    # into ONE int32 rank; enforce the documented bound up front (static
    # ints, trace-time) instead of silently wrapping at exotic B*N*C.
    # Production B=10/N=8192/C=7 peaks at ~11.6M (tests/test_grouping_rank.py).
    assert ((b * num_classes) * 2 + 1) * n_total + n_total - 1 < 2**31, (
        f"proposal rank overflows int32 at B={b}, N={n}, C={num_classes}; "
        "shrink the (batch x class) grid or widen the rank dtype")

    mean_tbl = jnp.asarray(cfg.class_numpoint_mean, jnp.float32)[:num_classes] \
        if num_classes <= len(cfg.class_numpoint_mean) else \
        jnp.full((num_classes,), -1.0, jnp.float32)

    def per_item(args):
        shifted_i, cls_i, emb_i, param_i = args
        nbr, class_valid = gated_neighbor_mask(
            shifted_i, cls_i, emb_i, param_i, num_classes, cfg)
        if cfg.neighbor_cap:
            # Directed capped graph: the reference BFS (find_cc,
            # hierarchical_aggregation.cpp:11-42) labels i with the MINIMUM
            # index that reaches it along out-edges; min-label propagation
            # over INCOMING edges (nbr.T) computes exactly that fixpoint
            # (verified against a directed-BFS oracle, tests/test_grouping_caps)
            nbr = nbr.T
        labels = connected_components(nbr, cfg.cc_max_iters, cfg.cc_impl)
        csize, size_at_root, center_at_root = _cc_stats(labels, shifted_i)
        return labels, csize, size_at_root, center_at_root, class_valid

    # Sequential map over batch items bounds peak memory at one N x N working
    # set and lets each item's CC while-loop exit independently; "vmap" batches
    # the sweeps instead (GroupingConfig.item_batch_mode — a measured reject at
    # the old defaults, kept one knob away for re-testing).
    if cfg.item_batch_mode == "vmap":
        labels, csize, size_at_root, center_at_root, class_valid = jax.vmap(
            per_item)((shifted, cls, emb, param))
    else:
        labels, csize, size_at_root, center_at_root, class_valid = jax.lax.map(
            per_item, (shifted, cls, emb, param))

    flat_cls = jnp.clip(cls, 0, num_classes - 1)                  # [B, N]
    cmean = mean_tbl[flat_cls]                                    # [B, N]
    low = cfg.low_frac * cmean
    high = cfg.high_frac * cmean
    fsize = csize.astype(jnp.float32)

    # split_clusters thresholds (hierarchical_aggregation.cpp:53-78):
    #   size <  high            -> fragment  (kept iff low <= size < high)
    #   size >= high            -> primary   (note: mean=-1 classes are always primary)
    is_primary = fsize >= high
    is_kept = (fsize >= low) & (fsize < high)
    is_fragment = fsize < high
    pt_class_ok = class_valid[jnp.arange(b)[:, None], flat_cls]
    qualifies = (is_primary | is_kept) & pt_class_ok

    # ---- global proposal ordering: (batch, class, kept<primary, root) ----
    batch_ids = jnp.broadcast_to(jnp.arange(b, dtype=jnp.int32)[:, None], (b, n))
    g_labels = (labels + batch_ids * n).reshape(-1)               # global root ids
    g_is_root = (labels == jnp.arange(n, dtype=jnp.int32)[None, :]).reshape(-1)
    g_qual = qualifies.reshape(-1)
    g_cls = flat_cls.reshape(-1)
    g_primary = is_primary.reshape(-1)
    g_batch = batch_ids.reshape(-1)
    g_idx = jnp.arange(n_total, dtype=jnp.int32)

    # rank fits int32: bound asserted at function entry
    root_rank = ((g_batch * num_classes + g_cls) * 2
                 + g_primary.astype(jnp.int32)) * n_total + g_idx
    root_rank = jnp.where(g_is_root & g_qual, root_rank, _BIG_I)
    p = max_proposals
    # pad so the [:p] slice is well-defined when B*N < max_proposals (toy
    # sizes; the padded slots rank as invalid and their indices are clamped)
    pad = max(0, p - n_total)
    rank_full = jnp.concatenate(
        [root_rank, jnp.full((pad,), _BIG_I, root_rank.dtype)]) if pad \
        else root_rank
    order = jnp.argsort(rank_full)                                # [>=B*N]
    top_valid = rank_full[order[:p]] < _BIG_I
    top_roots = jnp.minimum(order[:p], n_total - 1).astype(jnp.int32)

    # root -> pid scatter (overflow slot at n_total)
    pid_of_root = jnp.full((n_total + 1,), -1, jnp.int32)
    scatter_tgt = jnp.where(top_valid, top_roots, n_total)
    pid_of_root = pid_of_root.at[scatter_tgt].set(
        jnp.where(top_valid, jnp.arange(p, dtype=jnp.int32), -1))
    pid_of_root = pid_of_root[:n_total]

    pid_a = jnp.where(g_qual, pid_of_root[g_labels], -1)          # [B*N]

    prop_valid = top_valid
    prop_cls = jnp.where(top_valid, g_cls[top_roots], -1)
    prop_batch = jnp.where(top_valid, g_batch[top_roots], -1)
    prop_size = jnp.where(top_valid, csize.reshape(-1)[top_roots], 0)
    num = jnp.sum(top_valid.astype(jnp.int32))

    pid_b = jnp.full((n_total,), -1, jnp.int32)
    if using_set_aggr:
        # fragment_find_primary_ (hierarchical_aggregation.cu:22-75): for every
        # fragment CC, the nearest same-class same-item primary absorbs it when
        # center distance < r_set = 0.01 * sqrt(primary_npoint).
        g_center = center_at_root.reshape(n_total, 3)             # center at root slots
        g_frag_root = g_is_root & is_fragment.reshape(-1) & pt_class_ok.reshape(-1)
        prop_center = g_center[top_roots]                         # [P, 3]
        prop_is_primary = g_primary[top_roots] & top_valid
        d2 = jnp.sum((g_center[:, None, :] - prop_center[None, :, :]) ** 2, -1)
        cand = (prop_is_primary[None, :]
                & (prop_cls[None, :] == g_cls[:, None])
                & (prop_batch[None, :] == g_batch[:, None]))
        d2 = jnp.where(cand, d2, _BIG_F)
        nearest = jnp.argmin(d2, axis=1).astype(jnp.int32)        # [B*N] -> pid
        nearest_d2 = jnp.take_along_axis(d2, nearest[:, None], axis=1)[:, 0]
        r_set2 = (cfg.set_aggr_r_coeff ** 2) * prop_size[nearest].astype(jnp.float32)
        absorbed = g_frag_root & (nearest_d2 < r_set2)
        if cfg.absorb_fragment_cap:
            # hierarchical_aggregation.cu:9 MAX_PER_PRIMARY_ABSORB_FRAGMENT_NUM:
            # each primary absorbs at most ``cap`` fragments, in ascending
            # fragment-root order (the deterministic stand-in for CUDA's
            # atomicAdd arrival order; the numpy oracle uses the same order).
            key = jnp.where(absorbed, nearest, p)                 # [B*N]
            order = jnp.argsort(key * (n_total + 1) + g_idx)
            sorted_key = key[order]
            first = jnp.searchsorted(sorted_key, sorted_key, side="left")
            rank_sorted = jnp.arange(n_total, dtype=jnp.int32) - first
            frag_rank = jnp.zeros((n_total,), jnp.int32).at[order].set(
                rank_sorted.astype(jnp.int32))
            absorbed = absorbed & (frag_rank < cfg.absorb_fragment_cap)
        # propagate the root's absorption to all points of the fragment
        absorb_pid_at_root = jnp.where(absorbed, nearest, -1)     # defined at root slots
        pid_b = absorb_pid_at_root[g_labels]
        pid_b = jnp.where(is_fragment.reshape(-1) & (pid_b >= 0), pid_b, -1)
        if cfg.absorb_point_cap:
            # hierarchical_aggregation.cu:11 MAX_PER_PRIMARY_ABSORB_POINT_NUM:
            # at most ``cap`` absorbed POINTS per primary, ordered by
            # (fragment root, point index).  Deviation: within a fragment the
            # CUDA budget truncates in CSR (BFS-discovery) order; we use
            # ascending point index — differs only when the cap cuts inside
            # one fragment.
            pidk = jnp.where(pid_b >= 0, pid_b, p)
            order = jnp.lexsort((g_idx, g_labels, pidk))
            sorted_pid = pidk[order]
            first = jnp.searchsorted(sorted_pid, sorted_pid, side="left")
            rank_sorted = jnp.arange(n_total, dtype=jnp.int32) - first
            keep = jnp.zeros((n_total,), bool).at[order].set(
                rank_sorted < cfg.absorb_point_cap)
            pid_b = jnp.where(keep, pid_b, -1)

    point_pid = jnp.stack([pid_a, pid_b], axis=0)
    return Proposals(point_pid=point_pid, valid=prop_valid, cls=prop_cls,
                     batch=prop_batch, size=prop_size, num=num)


def build_soft_proposals(
    shifted: jnp.ndarray,          # [B, N, 3] coords + predicted offsets
    semantic_logits: jnp.ndarray,  # [B, N, C] raw semantic head outputs
    num_classes: int,
    cfg: GroupingConfig,
    max_proposals: int,
) -> Proposals:
    """Scene-family (vendored SoftGroup) grouping with SOFT class subsets.

    Reference semantics (softgroup/model/softgroup.py:412-481):

      * ``semantic_scores.softmax(-1)``; for every class not in
        ``ignore_classes`` the clustered subset is ``scores[:, c] >
        score_thr`` (:437) — soft and OVERLAPPING: one point may join
        several classes' clusterings (the paper's contribution vs argmax).
      * a class is skipped when its subset has fewer than
        ``test_cfg.min_npoint`` points across the whole batch (:438).
      * plain radius ball query on the shifted coords within each batch item
        (ops/functions.py:93-102 -> ballquery_batch_p; ``mean_active`` is
        only an allocation hint — the wrapper retries with a larger budget
        until every neighbour fits (:147-154), so the graph is uncapped).
      * BFS connected components keep clusters with ``size >= npoint_thr *
        class_numpoint_mean[c]`` (or plain ``npoint_thr`` when the mean is
        -1) — bfs_cluster.cpp:79-103.
      * proposals merge class-major (:433 outer loop); within a class
        find_cc scans the subset in ascending concatenated-batch index
        (:87-91), so clusters order by ascending min global point index.
        Training truncates to the FIRST ``max_proposal_num`` proposals in
        that order (softgroup.py:133-136) == our top-``max_proposals`` by
        rank.

    Returns :class:`Proposals` whose ``point_pid`` has ONE CHANNEL PER
    NON-IGNORED CLASS (shape [C_grouped, B*N]) — every downstream consumer
    (clusters_voxelization, InstanceHead, instance_loss, mask-IoU) is
    already channel-generic.  No HAIS/set-aggregation: the vendored
    SoftGroup has none.
    """
    b, n, c_all = shifted.shape[0], shifted.shape[1], semantic_logits.shape[-1]
    assert c_all == num_classes
    n_total = b * n
    grouped = tuple(ci for ci in range(num_classes)
                    if ci not in tuple(cfg.ignore_classes))
    gc = len(grouped)
    assert gc >= 1, "every class is ignored — nothing to group"
    assert gc * n_total + n_total < 2**31, (
        f"soft-proposal rank overflows int32 at B={b}, N={n}, C={gc}")

    scores = jax.nn.softmax(semantic_logits, axis=-1)          # [B, N, C]
    member = scores[..., jnp.asarray(grouped)] > cfg.score_thr  # [B, N, gc]
    # class skip counts the subset across the WHOLE concatenated batch
    class_ok = jnp.sum(member, axis=(0, 1)) >= cfg.min_npoint   # [gc]

    mean_all = jnp.full((num_classes,), -1.0, jnp.float32)
    tbl = jnp.asarray(cfg.class_numpoint_mean, jnp.float32)
    k = min(num_classes, tbl.shape[0])
    mean_all = mean_all.at[:k].set(tbl[:k])
    mean_g = mean_all[jnp.asarray(grouped)]                     # [gc]
    # bfs_cluster.cpp:88-94: thr = npoint_thr * mean (or npoint_thr if -1)
    thr_g = jnp.where(mean_g < 0, cfg.npoint_thr, cfg.npoint_thr * mean_g)

    def per_item(args):
        shifted_i, member_i = args                 # [N, 3], [N, gc]
        d2 = knn_ops.pairwise_sqdist(shifted_i)
        geo = (d2 < cfg.radius**2) & ~jnp.eye(n, dtype=bool)
        memb = member_i.T.astype(bool)             # [gc, N]

        # Per-class masked CC over the shared geometric graph.  (A fused
        # multi-class sweep — one geo pass serving all classes — was built
        # and REJECTED: -6.8% e2e; cc_pallas.py tombstone 2 has the record.)
        def per_class(m):                          # m: [N] bool
            nbr = geo & m[:, None] & m[None, :]
            labels = connected_components(nbr, cfg.cc_max_iters, cfg.cc_impl)
            size = jax.ops.segment_sum(m.astype(jnp.int32), labels,
                                       num_segments=n)[labels]
            return labels, size

        return jax.lax.map(per_class, memb)

    if cfg.item_batch_mode == "vmap":
        labels, csize = jax.vmap(per_item)((shifted, member))
    else:
        labels, csize = jax.lax.map(per_item, (shifted, member))
    # labels/csize: [B, gc, N] — per-class component root (min member index
    # within the item) and member count of that component

    memb = member.transpose(0, 2, 1)                           # [B, gc, N]
    keep = memb & (csize.astype(jnp.float32) >= thr_g[None, :, None]) \
        & class_ok[None, :, None]

    # ---- global proposal ordering: (class, global min point index) ----
    item_base = (jnp.arange(b, dtype=jnp.int32) * n)[:, None, None]
    groot = labels + item_base                                 # [B, gc, N]
    is_root = memb & (labels == jnp.arange(n, dtype=jnp.int32)[None, None, :])
    # flatten channel-major [gc, B*N] so channel ci covers class grouped[ci]
    def chan_flat(x):
        return x.transpose(1, 0, 2).reshape(gc, n_total)
    f_keep = chan_flat(keep)
    f_root = chan_flat(is_root & keep)
    f_groot = chan_flat(groot)
    f_size = chan_flat(csize)

    ci_idx = jnp.arange(gc, dtype=jnp.int32)[:, None]
    rank = (ci_idx * n_total + f_groot).reshape(-1)            # [gc*B*N]
    rank = jnp.where(f_root.reshape(-1), rank, _BIG_I)
    p = max_proposals
    pad = max(0, p - gc * n_total)
    rank_full = jnp.concatenate(
        [rank, jnp.full((pad,), _BIG_I, rank.dtype)]) if pad else rank
    order = jnp.argsort(rank_full)
    top_valid = rank_full[order[:p]] < _BIG_I
    top_entry = jnp.minimum(order[:p], gc * n_total - 1).astype(jnp.int32)

    # (channel, groot) -> pid scatter with an overflow slot
    slot = ((top_entry // n_total) * n_total
            + f_groot.reshape(-1)[top_entry])                  # canonical key
    pid_tbl = jnp.full((gc * n_total + 1,), -1, jnp.int32)
    tgt = jnp.where(top_valid, slot, gc * n_total)
    pid_tbl = pid_tbl.at[tgt].set(
        jnp.where(top_valid, jnp.arange(p, dtype=jnp.int32), -1))
    key = ci_idx * n_total + f_groot                           # [gc, B*N]
    point_pid = jnp.where(f_keep, pid_tbl[key], -1)

    f_cls = jnp.broadcast_to(
        jnp.asarray(grouped, jnp.int32)[:, None], (gc, n_total)).reshape(-1)
    f_batch = jnp.broadcast_to(
        jnp.repeat(jnp.arange(b, dtype=jnp.int32), n)[None, :],
        (gc, n_total)).reshape(-1)
    prop_cls = jnp.where(top_valid, f_cls[top_entry], -1)
    prop_batch = jnp.where(top_valid, f_batch[top_entry], -1)
    prop_size = jnp.where(top_valid, f_size.reshape(-1)[top_entry], 0)
    num = jnp.sum(top_valid.astype(jnp.int32))
    return Proposals(point_pid=point_pid, valid=top_valid, cls=prop_cls,
                     batch=prop_batch, size=prop_size, num=num)


# ----------------------------------------------------------------------------
# Oracle for tests: literal numpy BFS replicating the reference host algorithm.
# ----------------------------------------------------------------------------

def bfs_clusters_numpy(nbr, cls, mean_tbl, low_frac=0.05, high_frac=0.3):
    """Reference-style BFS split (hierarchical_aggregation.cpp:44-80) in numpy.

    Returns (labels, kept_roots, primary_roots) with labels = min-index root.
    """
    import numpy as np
    from collections import deque

    n = nbr.shape[0]
    labels = -np.ones(n, np.int64)
    kept, primary = [], []
    for i in range(n):
        if labels[i] >= 0:
            continue
        comp = [i]
        labels[i] = i
        q = deque([i])
        while q:
            cur = q.popleft()
            for j in np.nonzero(nbr[cur])[0]:
                if labels[j] < 0 and cls[j] == cls[cur]:
                    labels[j] = i
                    comp.append(j)
                    q.append(j)
        mean = mean_tbl[cls[i]]
        lo, hi = low_frac * mean, high_frac * mean
        if len(comp) < hi:
            if lo <= len(comp) < hi:
                kept.append(i)
        else:
            primary.append(i)
    return labels, kept, primary


def radius_neighbor_mask(coords: jnp.ndarray, radius: float,
                         batch_ids: jnp.ndarray | None = None) -> jnp.ndarray:
    """Plain radius graph — the reference's ungated ball-query variants
    ``ballquery_batch_p_easy`` / ``_org`` (softgroup/ops/src/bfs_cluster_easy,
    bfs_cluster_org; exported at softgroup_api.cpp:21).  coords [N, 3]."""
    d2 = knn_ops.pairwise_sqdist(coords)
    nbr = (d2 < radius * radius) & ~jnp.eye(coords.shape[0], dtype=bool)
    if batch_ids is not None:
        nbr &= batch_ids[:, None] == batch_ids[None, :]
    return nbr


def simple_clusters(coords: jnp.ndarray, semantic: jnp.ndarray,
                    radius: float, npoint_thr: float,
                    class_numpoint_mean, max_iters: int = 64):
    """The ``bfs_cluster`` op (softgroup/ops/src/bfs_cluster/bfs_cluster.cpp:
    48-143): radius-graph connected components keeping clusters with
    >= npoint_thr * class_numpoint_mean[class] points.  Returns (labels [N]
    with -1 for dropped clusters, keep mask [N]).  This is the alternative
    grouping the reference keeps commented out at dgcnn-4.py:1240."""
    same = semantic[:, None] == semantic[None, :]
    nbr = radius_neighbor_mask(coords, radius) & same
    labels = connected_components(nbr, max_iters)
    n = labels.shape[0]
    size = jax.ops.segment_sum(jnp.ones((n,), jnp.int32), labels,
                               num_segments=n)[labels]
    mean_tbl = jnp.asarray(class_numpoint_mean, jnp.float32)
    thr = npoint_thr * mean_tbl[jnp.clip(semantic, 0, mean_tbl.shape[0] - 1)]
    keep = size.astype(jnp.float32) >= thr
    return jnp.where(keep, labels, -1), keep
