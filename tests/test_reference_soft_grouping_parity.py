"""Scene-family SOFT grouping differential vs the vendored SoftGroup.

COMPONENTS.md deviation #7 closure (round-4 verdict item 2): the vendored
SoftGroup subsets classes SOFTLY — ``softmax(scores)[:, c] > score_thr``
(softgroup/model/softgroup.py:437), so one point may join several classes'
clusterings — where the round-4 scene path reused the ABC argmax partition.

Here the reference's own ``forward_grouping`` RUNS on CPU (its CUDA ops
replaced by the original-signature stubs in tests/ref_softgroup_stub.py,
cited to functions.py / bfs_cluster.cpp) and our ``build_soft_proposals``
must emit the same proposals — same count, same order (class-major, then
ascending min global point index), same member sets, same classes.

Skips cleanly when /root/reference is absent.
"""

import pathlib
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from gcanet_tpu.config import GroupingConfig
from gcanet_tpu.ops.grouping import build_soft_proposals

import ref_softgroup_stub as stub  # tests/ is on sys.path (no __init__.py)

REF = pathlib.Path("/root/reference/softgroup/model/softgroup.py")

pytestmark = pytest.mark.skipif(not REF.exists(),
                                reason="reference snapshot not available")


def _load_forward_grouping():
    """Exec-load the vendored softgroup.py with the CPU op stubs bound;
    returns the (undecorated-equivalent) forward_grouping function."""
    from tests.test_reference_encoder_parity import _strip_imports

    ns = {
        "__file__": str(REF), "spconv": None,
        "ball_query": stub.softgroup_ball_query,
        "bfs_cluster": stub.softgroup_bfs_cluster,
        "get_mask_iou_on_cluster": None, "get_mask_iou_on_pred": None,
        "get_mask_label": None, "global_avg_pool": None, "sec_max": None,
        "sec_min": None, "voxelization": None, "voxelization_idx": None,
        "cuda_cast": lambda f: f,
        "force_fp32": lambda *a, **k: (lambda f: f),
        "rle_decode": None, "rle_encode": None,
        "MLP": None, "ResidualBlock": None, "UBlock": None,
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
    src = _strip_imports("\n".join(out))
    src = src.replace(".cuda()", "").replace(".cpu()", "")
    exec(compile(src, str(REF), "exec"), ns)
    return ns["SoftGroup"]


def make_scene(seed=0, b=2, n=420, n_cls=5):
    """Synthetic scene with AMBIGUOUS boundaries so soft membership matters.

    Blobs carry a dominant class plus, for some blobs, a strong runner-up:
    with score_thr=0.2 those points enter BOTH classes' clusterings — the
    exact behaviour the argmax partition cannot express.
    """
    rng = np.random.RandomState(seed)
    # (dominant class, runner-up class or None, size) per item
    specs = [
        [(1, 2, 90), (2, None, 120), (3, 1, 80), (4, None, 60),
         (0, None, 40), (3, None, 30)],
        [(2, 3, 110), (1, None, 70), (4, 2, 100), (3, None, 90),
         (0, 4, 50)],
    ]
    assert all(sum(s for *_, s in sp) == n for sp in specs)
    xyz = np.zeros((b, n, 3), np.float32)
    logits = np.zeros((b, n, n_cls), np.float32)
    for bi in range(b):
        pos = 0
        centers = rng.uniform(0.1, 0.9, size=(len(specs[bi]), 3))
        for _ in range(300):
            d = np.linalg.norm(centers[:, None] - centers[None, :], axis=-1)
            np.fill_diagonal(d, 1.0)
            if d.min() > 0.25:
                break
            bad = np.unravel_index(d.argmin(), d.shape)[0]
            centers[bad] = rng.uniform(0.1, 0.9, 3)
        assert d.min() > 0.25
        for (dom, runner, sz), c in zip(specs[bi], centers):
            xyz[bi, pos:pos + sz] = c + rng.normal(scale=0.006, size=(sz, 3))
            lg = rng.normal(scale=0.05, size=(sz, n_cls)).astype(np.float32)
            lg[:, dom] += 2.0
            if runner is not None:
                lg[:, runner] += 1.6   # softmax prob ~0.35 — above thr 0.2
            logits[bi, pos:pos + sz] = lg
            pos += sz
        assert pos == n
    offsets = rng.normal(scale=1e-3, size=(b, n, 3)).astype(np.float32)
    return xyz, logits, offsets


GCFG = dict(radius=0.05, score_thr=0.2, npoint_thr=0.05, min_npoint=8,
            class_numpoint_mean=(-1.0, 300.0, -1.0, 150.0, -1.0),
            ignore_classes=(0,))


def ref_soft_proposals(xyz, logits, offsets):
    SoftGroup = _load_forward_grouping()
    b, n, n_cls = logits.shape
    fake = types.SimpleNamespace(
        semantic_classes=n_cls,
        grouping_cfg=types.SimpleNamespace(
            radius=GCFG["radius"], mean_active=50,
            npoint_thr=GCFG["npoint_thr"], score_thr=GCFG["score_thr"],
            class_numpoint_mean=list(GCFG["class_numpoint_mean"]),
            ignore_classes=list(GCFG["ignore_classes"])),
        test_cfg=types.SimpleNamespace(min_npoint=GCFG["min_npoint"]),
        get_batch_offsets=SoftGroup.get_batch_offsets.__get__(object()),
    )
    batch_idxs = np.repeat(np.arange(b, dtype=np.int64), n)
    with torch.no_grad():
        pidx, poff = SoftGroup.forward_grouping(
            fake,
            torch.as_tensor(logits.reshape(-1, n_cls)),
            torch.as_tensor(offsets.reshape(-1, 3)),
            torch.as_tensor(batch_idxs),
            torch.as_tensor(xyz.reshape(-1, 3)))
    return np.asarray(pidx), np.asarray(poff)


def ours_soft_proposals(xyz, logits, offsets, max_proposals=64):
    cfg = GroupingConfig(
        radius=GCFG["radius"], score_thr=GCFG["score_thr"],
        npoint_thr=GCFG["npoint_thr"], min_npoint=GCFG["min_npoint"],
        class_numpoint_mean=GCFG["class_numpoint_mean"],
        ignore_classes=GCFG["ignore_classes"])
    props = build_soft_proposals(
        jnp.asarray(xyz + offsets), jnp.asarray(logits),
        num_classes=logits.shape[-1], cfg=cfg, max_proposals=max_proposals)
    return jax.tree_util.tree_map(np.asarray, props)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_soft_grouping_matches_reference(seed):
    xyz, logits, offsets = make_scene(seed)
    pidx, poff = ref_soft_proposals(xyz, logits, offsets)
    n_ref = len(poff) - 1
    assert n_ref > 2

    props = ours_soft_proposals(xyz, logits, offsets)
    assert int(props.num) == n_ref, (int(props.num), n_ref)

    pid = props.point_pid                       # [C_grouped, B*N]
    n_total = pid.shape[1]
    for p in range(n_ref):
        ref_members = sorted(int(r) for r in pidx[poff[p]:poff[p + 1], 1])
        rows, cols = np.nonzero(pid == p)
        assert len(set(rows)) == 1              # one channel per proposal
        ours_members = sorted(int(c) for c in cols)
        assert ours_members == ref_members, (
            f"proposal {p}: ours {len(ours_members)} vs ref "
            f"{len(ref_members)} points")
        # proposal size bookkeeping
        assert int(props.size[p]) == len(ref_members)
    # channel -> class mapping consistent with the reported proposal class
    grouped = [c for c in range(logits.shape[-1])
               if c not in GCFG["ignore_classes"]]
    for p in range(n_ref):
        rows, _ = np.nonzero(pid == p)
        assert grouped[rows[0]] == int(props.cls[p])


def test_soft_membership_is_overlapping():
    """The fixture genuinely exercises softness: some point belongs to
    proposals of TWO different classes (impossible under argmax)."""
    xyz, logits, offsets = make_scene(0)
    props = ours_soft_proposals(xyz, logits, offsets)
    pid = props.point_pid
    multi = (pid >= 0).sum(axis=0) >= 2
    assert bool(multi.any()), "no point joined two classes' clusterings"
    # and the reference agrees a point can appear in two proposals
    pidx, poff = ref_soft_proposals(xyz, logits, offsets)
    counts = np.bincount(pidx[:, 1], minlength=pid.shape[1])
    assert counts.max() >= 2


def test_soft_grouping_class_skip_and_cap():
    """min_npoint skips a thin class batch-wide; max_proposals truncates to
    the FIRST proposals in reference order (softgroup.py:133-136)."""
    xyz, logits, offsets = make_scene(1)
    pidx, poff = ref_soft_proposals(xyz, logits, offsets)
    n_ref = len(poff) - 1
    cap = max(1, n_ref - 2)
    props = ours_soft_proposals(xyz, logits, offsets, max_proposals=cap)
    assert int(props.num) == cap
    for p in range(cap):
        ref_members = sorted(int(r) for r in pidx[poff[p]:poff[p + 1], 1])
        _, cols = np.nonzero(props.point_pid == p)
        assert sorted(int(c) for c in cols) == ref_members
