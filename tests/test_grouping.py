"""Grouping correctness: CC labels vs BFS oracle; proposal split vs the
reference's fragment/kept/primary thresholds; set-aggregation absorption."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gcanet_tpu.config import GroupingConfig
from gcanet_tpu.ops import grouping as G


def _random_graph(n, p_edge, seed):
    rng = np.random.RandomState(seed)
    a = rng.rand(n, n) < p_edge
    a = np.triu(a, 1)
    a = a | a.T
    return a


@pytest.mark.parametrize("n,p_edge,seed", [(50, 0.02, 0), (200, 0.005, 1), (333, 0.02, 2)])
def test_connected_components_vs_bfs(n, p_edge, seed):
    a = _random_graph(n, p_edge, seed)
    labels = np.asarray(G.connected_components(jnp.asarray(a)))
    # oracle: undirected CC with min-index roots
    ref, _, _ = G.bfs_clusters_numpy(a, np.zeros(n, np.int64), np.array([1e9]))
    # same partition with identical min-index roots
    np.testing.assert_array_equal(labels, ref)


def test_chain_graph_converges():
    # worst case for plain propagation: a long chain; pointer jumping must
    # converge within the iteration budget
    n = 300
    a = np.zeros((n, n), bool)
    for i in range(n - 1):
        a[i, i + 1] = a[i + 1, i] = True
    labels = np.asarray(G.connected_components(jnp.asarray(a), max_iters=64))
    assert (labels == 0).all()


def _make_inputs(n=300, seed=0, num_classes=3):
    rng = np.random.RandomState(seed)
    # a few well-separated gaussian blobs per class
    centers = rng.rand(6, 3) * 10
    pts, cls = [], []
    for i, c in enumerate(centers):
        pts.append(c + 0.005 * rng.randn(n // 6, 3))
        cls.append(np.full(n // 6, i % num_classes))
    shifted = np.concatenate(pts).astype(np.float32)
    cls = np.concatenate(cls).astype(np.int32)
    emb = np.repeat(rng.randn(6, 8), n // 6, axis=0).astype(np.float32)
    emb += 0.001 * rng.randn(*emb.shape).astype(np.float32)
    param = rng.randn(len(cls), 22).astype(np.float32)
    return shifted, cls, emb, param


def test_proposals_blob_clusters():
    shifted, cls, emb, param = _make_inputs()
    n = len(cls)
    cfg = GroupingConfig(radius=0.1, min_npoint=5,
                         class_numpoint_mean=(100.0, 100.0, 100.0))
    props = G.build_proposals(
        jnp.asarray(shifted[None]), jnp.asarray(cls[None]),
        jnp.asarray(emb[None]), jnp.asarray(param[None]),
        num_classes=3, cfg=cfg, max_proposals=16)
    num = int(props.num)
    # blobs of 50 points, mean 100 -> high=30: every blob is a primary
    assert num == 6
    sizes = np.asarray(props.size)[:num]
    assert (sizes == 50).all()
    # ordering: class ascending
    pcls = np.asarray(props.cls)[:num]
    assert (np.diff(pcls) >= 0).all()
    # every point in a proposal, channel 1 unused in train
    pid = np.asarray(props.point_pid)
    assert (pid[0] >= 0).all()
    assert (pid[1] == -1).all()


def test_min_npoint_class_skipped():
    shifted, cls, emb, param = _make_inputs()
    # class 2 has 100 points; raise min_npoint above it
    cfg = GroupingConfig(radius=0.1, min_npoint=150,
                         class_numpoint_mean=(100.0, 100.0, 100.0))
    props = G.build_proposals(
        jnp.asarray(shifted[None]), jnp.asarray(cls[None]),
        jnp.asarray(emb[None]), jnp.asarray(param[None]),
        num_classes=3, cfg=cfg, max_proposals=16)
    pcls = np.asarray(props.cls)[:int(props.num)]
    assert len(pcls) == 0  # all classes have 100 < 150 points -> all skipped


def test_kept_vs_dropped_fragments():
    # one blob of 50 (kept: 0.05*m=10 <= 50 < 0.3*m=60 with m=200),
    # one blob of 4 (dropped)
    rng = np.random.RandomState(0)
    a = 0.005 * rng.randn(50, 3) + [0, 0, 0]
    b = 0.005 * rng.randn(4, 3) + [5, 5, 5]
    shifted = np.concatenate([a, b]).astype(np.float32)
    cls = np.full(54, 0, np.int32)
    # distinct per-group embeddings: the affinity normaliser d_max is the
    # inter-group distance, so intra-group pairs pass the 0.989 gate
    emb = np.ones((54, 4), np.float32) + 0.001 * rng.randn(54, 4).astype(np.float32)
    emb[50:] += 10.0
    param = rng.randn(54, 22).astype(np.float32)
    cfg = GroupingConfig(radius=0.1, min_npoint=5, class_numpoint_mean=(200.0,))
    props = G.build_proposals(
        jnp.asarray(shifted[None]), jnp.asarray(cls[None]),
        jnp.asarray(emb[None]), jnp.asarray(param[None]),
        num_classes=1, cfg=cfg, max_proposals=8)
    assert int(props.num) == 1
    assert int(props.size[0]) == 50
    pid = np.asarray(props.point_pid)
    assert (pid[0, :50] == 0).all()
    assert (pid[0, 50:] == -1).all()


def test_set_aggregation_absorbs_nearby_fragment():
    rng = np.random.RandomState(0)
    primary = 0.005 * rng.randn(80, 3)                 # size 80 >= 0.3*200=60
    frag = 0.005 * rng.randn(5, 3) + [0.05, 0, 0]      # nearby, size 5 < 10 (dropped)
    far = 0.005 * rng.randn(5, 3) + [50, 0, 0]         # far fragment
    shifted = np.concatenate([primary, frag, far]).astype(np.float32)
    n = len(shifted)
    cls = np.zeros(n, np.int32)
    emb = np.ones((n, 4), np.float32)
    # separate embeddings so frag/far don't merge with primary via affinity
    emb[80:85] += 10.0
    emb[85:] += 20.0
    param = rng.randn(n, 22).astype(np.float32)
    cfg = GroupingConfig(radius=0.2, min_npoint=5, class_numpoint_mean=(200.0,))
    props = G.build_proposals(
        jnp.asarray(shifted[None]), jnp.asarray(cls[None]),
        jnp.asarray(emb[None]), jnp.asarray(param[None]),
        num_classes=1, cfg=cfg, max_proposals=8, using_set_aggr=True)
    assert int(props.num) == 1                          # only the primary qualifies
    pid = np.asarray(props.point_pid)
    # r_set = 0.01*sqrt(80) = 0.089 -> nearby frag (d=0.05) absorbed, far not
    assert (pid[1, 80:85] == 0).all()
    assert (pid[1, 85:] == -1).all()
    assert (pid[0, 80:] == -1).all()


def test_simple_clusters_and_radius_graph():
    rng = np.random.RandomState(5)
    a = 0.01 * rng.randn(60, 3)
    b = 0.01 * rng.randn(10, 3) + [5, 5, 5]
    coords = jnp.asarray(np.concatenate([a, b]).astype(np.float32))
    sem = jnp.asarray(np.zeros(70, np.int32))
    labels, keep = G.simple_clusters(coords, sem, radius=0.2, npoint_thr=0.15,
                                     class_numpoint_mean=(200.0,))
    labels = np.asarray(labels)
    # big cluster kept (60 >= 0.15*200=30), small dropped (10 < 30)
    assert (labels[:60] == 0).all()
    assert (labels[60:] == -1).all()


def test_proposal_ordering_kept_before_primary_within_class():
    """Reference merge order: per (item, class), kept fragments precede
    primaries (functions.py:62-71), classes ascending (dgcnn-4.py:1188)."""
    rng = np.random.RandomState(7)
    # class 0: one kept blob (40 pts; mean 200 -> kept in [10, 60)) and one
    # primary blob (80 pts >= 60); class 1: one primary blob (70 pts)
    blobs = [
        (80, [0, 0, 0], 0),    # class 0 primary
        (40, [5, 0, 0], 0),    # class 0 kept
        (70, [0, 5, 0], 1),    # class 1 primary
    ]
    pts, cls, emb = [], [], []
    for i, (m, c, k) in enumerate(blobs):
        pts.append(0.005 * rng.randn(m, 3) + c)
        cls.append(np.full(m, k))
        emb.append(np.full((m, 4), 10.0 * i) + 0.001 * rng.randn(m, 4))
    shifted = np.concatenate(pts).astype(np.float32)
    cls = np.concatenate(cls).astype(np.int32)
    emb = np.concatenate(emb).astype(np.float32)
    param = rng.randn(len(cls), 22).astype(np.float32)
    cfg = GroupingConfig(radius=0.1, min_npoint=5,
                         class_numpoint_mean=(200.0, 200.0))
    props = G.build_proposals(
        jnp.asarray(shifted[None]), jnp.asarray(cls[None]),
        jnp.asarray(emb[None]), jnp.asarray(param[None]),
        num_classes=2, cfg=cfg, max_proposals=8)
    num = int(props.num)
    assert num == 3
    sizes = np.asarray(props.size)[:num].tolist()
    pcls = np.asarray(props.cls)[:num].tolist()
    # class 0 first: kept (40) before primary (80); then class 1 primary (70)
    assert pcls == [0, 0, 1]
    assert sizes == [40, 80, 70]


def test_proposal_cap_larger_than_point_count():
    """Regression: max_proposals > B*N used to break the top-k slice
    (found driving eval at toy sizes: N=128, cap 200)."""
    shifted, cls, emb, param = _make_inputs()
    n = len(cls)
    cfg = GroupingConfig(radius=0.1, min_npoint=5,
                         class_numpoint_mean=(100.0, 100.0, 100.0))
    props = G.build_proposals(
        jnp.asarray(shifted[None]), jnp.asarray(cls[None]),
        jnp.asarray(emb[None]), jnp.asarray(param[None]),
        num_classes=3, cfg=cfg, max_proposals=n + 137)
    assert props.valid.shape == (n + 137,)
    assert int(props.num) == 6                      # same blobs as above
    assert not np.asarray(props.valid)[6:].any()    # padded slots invalid
    pid = np.asarray(props.point_pid)
    assert (pid[0] >= 0).all() and (pid[0] < 6).all()


def test_item_batch_mode_vmap_matches_map():
    """GroupingConfig.item_batch_mode='vmap' (batched CC sweeps) must produce
    the identical Proposals as the default sequential lax.map path — it is a
    perf A/B knob (GCA_BENCH_GROUP_VMAP), not a semantic one."""
    a = _make_inputs(seed=0)
    b = _make_inputs(seed=3)
    batch = [np.stack([x, y]) for x, y in zip(a, b)]
    shifted, cls, emb, param = (jnp.asarray(v) for v in batch)
    kw = dict(num_classes=3, max_proposals=16, using_set_aggr=True)
    base = GroupingConfig(radius=0.1, min_npoint=5,
                          class_numpoint_mean=(100.0, 100.0, 100.0))
    p_map = G.build_proposals(shifted, cls, emb, param, cfg=base, **kw)
    import dataclasses
    p_vmap = G.build_proposals(
        shifted, cls, emb, param,
        cfg=dataclasses.replace(base, item_batch_mode="vmap"), **kw)
    for name in p_map._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(p_map, name)),
            np.asarray(getattr(p_vmap, name)), err_msg=name)
