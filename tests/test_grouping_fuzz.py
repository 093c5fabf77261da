"""Randomised full-pipeline differential: build_proposals vs a literal numpy
oracle of the documented semantics (gated graph -> BFS CC -> HAIS split ->
reference ordering/cap -> set aggregation).

The targeted tests in test_grouping.py pin each stage; this fuzz guards the
interactions of the vectorised machinery (rank encoding, root scatter,
padding, absorption propagation) across random scenes, thresholds and caps.
"""

import dataclasses
import math
from collections import deque

import jax.numpy as jnp
import numpy as np
import pytest

from gcanet_tpu.config import GroupingConfig
from gcanet_tpu.ops import grouping as G


def _oracle(shifted, cls, emb, param, num_classes, cfg, max_p, set_aggr):
    """Literal per-item numpy pipeline (see ops/grouping.py module doc)."""
    b, n, _ = shifted.shape
    mean_tbl = np.asarray(cfg.class_numpoint_mean, np.float32)[:num_classes]

    def pair_d2(x):
        return np.sum((x[:, None, :] - x[None, :, :]) ** 2, -1)

    roots = []          # (batch, class, is_primary, global_root, size, center)
    labels_g = -np.ones((b, n), np.int64)    # global root per point
    frag_g = np.zeros((b, n), bool)          # point is in a fragment CC
    qual_g = np.zeros((b, n), bool)          # point's CC is kept/primary
    for bi in range(b):
        x, c = shifted[bi], cls[bi]
        counts = np.bincount(np.clip(c, 0, num_classes - 1),
                             minlength=num_classes)
        cls_ok = counts >= cfg.min_npoint
        nbr = (pair_d2(x) < cfg.radius ** 2) \
            & (c[:, None] == c[None, :]) & ~np.eye(n, dtype=bool)
        nbr &= cls_ok[c][:, None] & cls_ok[c][None, :]
        for feats, thr in ((emb[bi], cfg.similarity_threshold_inst),
                           (param[bi], cfg.similarity_threshold_para)):
            if thr <= 0.0:
                continue
            d2 = np.maximum(pair_d2(feats), 0.0)
            same = c[:, None] == c[None, :]
            dmax2 = np.zeros(num_classes)
            for cc in range(num_classes):
                m = same & (c[:, None] == cc)
                dmax2[cc] = d2[m].max() if m.any() else 0.0
            nbr &= d2 < (dmax2[c] * (-2.0 * math.log(thr)))[:, None]
        # BFS CC over the (symmetric by construction) graph
        lab = -np.ones(n, np.int64)
        for i in range(n):
            if lab[i] >= 0:
                continue
            comp, q = [i], deque([i])
            lab[i] = i
            while q:
                cur = q.popleft()
                for j in np.nonzero(nbr[cur])[0]:
                    if lab[j] < 0:
                        lab[j] = i
                        comp.append(j)
                        q.append(j)
            mean = mean_tbl[min(c[i], num_classes - 1)]
            size = len(comp)
            lo, hi = cfg.low_frac * mean, cfg.high_frac * mean
            primary, kept = size >= hi, lo <= size < hi
            center = x[comp].mean(0)
            if cls_ok[c[i]]:
                frag_g[bi, comp] = size < hi
                if primary or kept:
                    roots.append((bi, int(c[i]), primary, bi * n + i,
                                  size, center))
                    qual_g[bi, comp] = True
            labels_g[bi] = lab + bi * n

    # reference ordering: (batch, class, kept-before-primary, discovery order)
    roots.sort(key=lambda r: (r[0], r[1], r[2], r[3]))
    top = roots[:max_p]
    pid_of_root = {r[3]: i for i, r in enumerate(top)}
    pid0 = np.where(qual_g.reshape(-1),
                    [pid_of_root.get(g, -1) for g in labels_g.reshape(-1)], -1)

    pid1 = -np.ones(b * n, np.int64)
    if set_aggr:
        prim = [(i, r) for i, r in enumerate(top) if r[2]]
        # absorption decided per fragment ROOT (root slots hold CC centers)
        for bi in range(b):
            for g in np.unique(labels_g[bi]):
                li = g - bi * n
                if not frag_g[bi, li]:
                    continue
                comp = np.nonzero(labels_g[bi] == g)[0]
                center = shifted[bi][comp].mean(0)
                cand = [(i, r) for i, r in prim
                        if r[0] == bi and r[1] == cls[bi][li]]
                if not cand:
                    continue
                d2s = [float(np.sum((center - r[5]) ** 2)) for _, r in cand]
                k = int(np.argmin(d2s))
                i, r = cand[k]
                if d2s[k] < (cfg.set_aggr_r_coeff ** 2) * r[4]:
                    pid1[bi * n + comp] = i
    return pid0, pid1, top


def _random_scene(rng, n_items, n, num_classes):
    """Blobby random scene: clusters of varying tightness and class."""
    pts, cls, emb = [], [], []
    for _ in range(n_items):
        n_blobs = rng.randint(3, 7)
        centers = rng.rand(n_blobs, 3) * 6
        sizes = rng.multinomial(n - n_blobs, np.ones(n_blobs) / n_blobs) + 1
        p, c, e = [], [], []
        for bi2, (ctr, sz) in enumerate(zip(centers, sizes)):
            spread = rng.choice([0.004, 0.02, 0.3])
            p.append(ctr + spread * rng.randn(sz, 3))
            c.append(np.full(sz, rng.randint(0, num_classes)))
            e.append(np.repeat(rng.randn(1, 4), sz, 0)
                     + 0.01 * rng.randn(sz, 4))
        pts.append(np.concatenate(p)[:n])
        cls.append(np.concatenate(c)[:n])
        emb.append(np.concatenate(e)[:n])
    return (np.stack(pts).astype(np.float32),
            np.stack(cls).astype(np.int32),
            np.stack(emb).astype(np.float32))


@pytest.mark.parametrize("seed", range(6))
def test_build_proposals_matches_numpy_oracle(seed):
    rng = np.random.RandomState(seed)
    n, num_classes = 120, 3
    shifted, cls, emb = _random_scene(rng, 2, n, num_classes)
    param = rng.randn(2, n, 22).astype(np.float32)
    cfg = GroupingConfig(
        radius=float(rng.choice([0.08, 0.15])),
        min_npoint=int(rng.choice([1, 5, 12])),
        similarity_threshold_inst=float(rng.choice([0.0, 0.6])),
        similarity_threshold_para=0.0,
        class_numpoint_mean=tuple(
            rng.choice([40.0, 100.0, 240.0]) for _ in range(num_classes)),
        set_aggr_r_coeff=float(rng.choice([0.05, 0.4])),
        cc_max_iters=64)
    max_p = int(rng.choice([4, 16, 64]))
    set_aggr = bool(seed % 2)

    props = G.build_proposals(
        jnp.asarray(shifted), jnp.asarray(cls), jnp.asarray(emb),
        jnp.asarray(param), num_classes=num_classes, cfg=cfg,
        max_proposals=max_p, using_set_aggr=set_aggr)
    pid0, pid1, top = _oracle(shifted, cls, emb, param, num_classes, cfg,
                              max_p, set_aggr)

    np.testing.assert_array_equal(np.asarray(props.point_pid[0]), pid0)
    np.testing.assert_array_equal(np.asarray(props.point_pid[1]), pid1)
    assert int(props.num) == len(top)
    got_cls = np.asarray(props.cls)[: len(top)]
    got_batch = np.asarray(props.batch)[: len(top)]
    got_size = np.asarray(props.size)[: len(top)]
    for i, (bi, c, _, _, size, _) in enumerate(top):
        assert (got_batch[i], got_cls[i], got_size[i]) == (bi, c, size), i
    assert not np.asarray(props.valid)[len(top):].any()
