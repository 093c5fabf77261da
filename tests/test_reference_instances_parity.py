"""Differential parity: eval-time instance extraction vs the reference's
get_instances (dgcnn-4.py:1040-1120).

The reference method consumes CSR proposals (proposals_idx rows) and
per-row mask scores; ours consumes the fixed-shape assignment channels.
Generate one random clustering, express it in BOTH representations, run both
extractors with the same scores and compare the produced instance lists
(labels, confidences, decoded masks).  The hard-coded thresholds
(cls 0.45 softmax, mask -3, min 150 points) are exercised with inputs that
straddle them.  Skips where the snapshot is absent.
"""

import pathlib

import numpy as np
import pytest

from gcanet_tpu.train.instances import get_instances as ours_get
from gcanet_tpu.train.instances import rle_decode

REF = pathlib.Path(
    "/root/reference/models/dgcnn-hais-concat-direct-4.py")

pytestmark = pytest.mark.skipif(not REF.exists(),
                                reason="reference snapshot not available")


def _load_ref_get_instances():
    import torch

    from tests.test_reference_encoder_parity import _strip_imports

    rle_ns: dict = {}
    rle_path = pathlib.Path("/root/reference/softgroup/util/rle.py")
    exec(compile(rle_path.read_text(), str(rle_path), "exec"), rle_ns)

    ns = {
        "__file__": str(REF), "spconv": None, "ResidualBlock": None,
        "UBlock": None, "MLP": None,
        "force_fp32": lambda *a, **k: (lambda f: f),
        "rle_decode": rle_ns["rle_decode"], "rle_encode": rle_ns["rle_encode"],
        "grouping_operation": None, "Transformer": None, "knn_point": None,
        "group_points": None,
        "construction_affinity_matrix_type": None,
        "construction_affinity_matrix_normal": None,
        "construction_affinity_matrix_type_one_class": None,
        "ball_query": None, "bfs_cluster": None,
        "get_mask_iou_on_cluster": None, "get_mask_iou_on_pred": None,
        "get_mask_label": None, "global_avg_pool": None, "sec_max": None,
        "sec_min": None, "voxelization": None, "voxelization_idx": None,
        "hierarchical_aggregation": None,
    }
    src = _strip_imports(REF.read_text())
    src = src.replace("torch.device('cuda')", "torch.device('cpu')")
    src = src.replace("device='cuda'", "device='cpu'")
    exec(compile(src, str(REF), "exec"), ns)
    return ns["PrimitivesEmbeddingDGCNGn"].get_instances


@pytest.mark.parametrize("seed", range(3))
def test_get_instances_matches_reference(seed):
    import torch

    ref_get = _load_ref_get_instances()
    rng = np.random.RandomState(seed)
    n, p, c, ch = 2000, 6, 7, 2

    # random clustering as assignment channels: channel 0 partitions a chunk
    # of the points into proposals (sizes straddle the 150-point filter),
    # channel 1 re-assigns a slice to another proposal (set-aggregation case)
    point_pid = -np.ones((ch, n), np.int32)
    pos = 0
    for pid in range(p):
        size = int(rng.choice([60, 200, 400]))
        point_pid[0, pos:pos + size] = pid
        pos += size
    sel = rng.rand(n) < 0.1
    point_pid[1, sel] = rng.randint(0, p, int(sel.sum()))

    # scores: concentrated class logits so some softmax values clear 0.45
    cls_scores = rng.randn(p, c).astype(np.float32)
    cls_scores[np.arange(p), rng.randint(0, c, p)] += 4.0
    iou_scores = rng.randn(p, c).astype(np.float32)
    mask_scores = (rng.randn(ch, n, c) * 3).astype(np.float32)  # straddles -3
    semantic_scores = rng.randn(n, c).astype(np.float32)

    # CSR view of the same clustering, row order: channel-major then point
    rows, row_scores = [], []
    for cc in range(ch):
        for pt in np.nonzero(point_pid[cc] >= 0)[0]:
            rows.append((point_pid[cc, pt], pt))
            row_scores.append(mask_scores[cc, pt])
    proposals_idx = torch.as_tensor(np.asarray(rows, np.int32))
    ref_mask_scores = torch.as_tensor(np.stack(row_scores))

    want = ref_get(None, proposals_idx,
                   torch.as_tensor(semantic_scores),
                   torch.as_tensor(cls_scores),
                   torch.as_tensor(iou_scores),
                   ref_mask_scores, instance_classes=c)
    got = ours_get(point_pid, semantic_scores, cls_scores, iou_scores,
                   mask_scores, prop_valid=np.ones(p, bool),
                   instance_classes=c)

    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert int(g["label_id"]) == int(w["label_id"])
        np.testing.assert_allclose(float(g["conf"]), float(w["conf"]),
                                   atol=1e-5)
        np.testing.assert_array_equal(rle_decode(g["pred_mask"]),
                                      rle_decode(w["pred_mask"]))
