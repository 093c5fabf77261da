"""Differential parity test: our ScanNetEval vs the reference's own evaluator.

The reference ScanNet AP evaluator (softgroup/evaluation/instance_eval.py) is
pure numpy, so where the reference snapshot is available we load it AT TEST
TIME as the oracle (nothing is copied into the framework; the test skips
elsewhere) and fuzz both evaluators on random scenes exercising every edge
rule: min_region_sizes on GT and predictions, void and group-overlap ignore
correction on FPs, greedy double-matching, confidence ties, wrong/invalid
prediction labels, and the trapezoid AP integration.

This realises SURVEY §4(d) ("parity tests against recorded reference
tensors") for the one component whose semantics are subtle enough that a
transcription bug would silently skew benchmark numbers.
"""

import pathlib
import sys
import types

import numpy as np
import pytest

from gcanet_tpu.train.instance_eval import ScanNetEval

REF = pathlib.Path("/root/reference/softgroup/evaluation")

pytestmark = pytest.mark.skipif(not REF.exists(),
                                reason="reference snapshot not available")


def _load_reference_evaluator():
    """Exec the reference modules with their heavy deps stubbed out:
    plyfile (only used for .ply IO we never touch) and the package-relative
    rle_decode (our preds pass dense masks, so it is never called)."""
    if "plyfile" not in sys.modules:
        stub = types.ModuleType("plyfile")
        stub.PlyData = None
        sys.modules["plyfile"] = stub
    util_ns: dict = {}
    path = REF / "instance_eval_util.py"
    exec(compile(path.read_text(), str(path), "exec"), util_ns)
    path = REF / "instance_eval.py"
    src = "\n".join(
        line for line in path.read_text().splitlines()
        if not line.startswith("from ..util import")
        and not line.startswith("from .instance_eval_util import"))
    # the snapshot predates numpy 1.24: np.float/np.bool aliases are gone
    src = src.replace("np.float)", "float)").replace("np.bool)", "bool)")
    ns = {"get_instances": util_ns["get_instances"], "rle_decode": None}
    exec(compile(src, str(path), "exec"), ns)
    return ns["ScanNetEval"]


def _random_case(rng, n_points, n_classes):
    """Random per-point GT encoding + predictions hitting every edge rule."""
    gts = np.zeros(n_points, np.int64)
    pos = 0
    while pos < n_points:
        size = int(rng.randint(5, 90))
        seg = slice(pos, min(pos + size, n_points))
        r = rng.rand()
        if r < 0.15:
            val = 0                                   # void / unannotated
        elif r < 0.30:
            val = int(rng.randint(1, 1000))           # "group" (id < 1000)
        else:
            c = int(rng.randint(1, n_classes + 1))
            val = c * 1000 + int(rng.randint(1, 40))  # real instance
        gts[seg] = val
        pos += size

    preds = []
    for u in [int(u) for u in np.unique(gts) if u >= 1000]:
        base = gts == u
        for _ in range(int(rng.choice([0, 1, 1, 2]))):   # incl. double-match
            mask = base.copy()
            noise = rng.rand(n_points) < rng.choice([0.0, 0.05, 0.3])
            mask = np.logical_xor(mask, noise)
            label = int(u // 1000)
            if rng.rand() < 0.15:
                label = int(rng.randint(1, n_classes + 2))  # wrong / invalid
            preds.append({
                "label_id": label,
                "conf": float(rng.choice([0.3, 0.5, 0.5, 0.9])),  # exact ties
                "pred_mask": mask.astype(np.uint8),
            })
    for _ in range(3):                                  # pure-noise preds
        preds.append({
            "label_id": int(rng.randint(1, n_classes + 1)),
            "conf": float(rng.rand()),
            "pred_mask": (rng.rand(n_points)
                          < rng.choice([0.01, 0.1])).astype(np.uint8),
        })
    return preds, gts


@pytest.mark.parametrize("seed", range(4))
def test_ap_tables_match_reference(seed):
    RefEval = _load_reference_evaluator()
    labels = ["a", "b", "c"]
    ours = ScanNetEval(labels, min_npoint=15)
    ref = RefEval(labels, min_npoint=15)

    rng = np.random.RandomState(seed)
    matches_ours, matches_ref = {}, {}
    for si in range(3):                                 # 3 scans per case
        preds, gts = _random_case(rng, n_points=700, n_classes=3)
        for pi, p in enumerate(preds):
            p["scan_id"] = f"scan{si}"
        g_o, p_o = ours.assign_instances_for_scan(preds, gts, scan_idx=si)
        g_r, p_r = ref.assign_instances_for_scan(preds, gts)
        matches_ours[f"gt_{si}"] = {"gt": g_o, "pred": p_o}
        matches_ref[f"gt_{si}"] = {"gt": g_r, "pred": p_r}

    ap_o, rc_o = ours.evaluate_matches(matches_ours)
    ap_r, rc_r = ref.evaluate_matches(matches_ref)
    np.testing.assert_array_equal(ap_o, ap_r)           # NaN-aware exact
    np.testing.assert_array_equal(rc_o, rc_r)

    avg_o = ours.compute_averages(ap_o, rc_o)
    avg_r = ref.compute_averages(ap_r, rc_r)
    for k in ("all_ap", "all_ap_50%", "all_ap_25%", "all_rc"):
        np.testing.assert_array_equal(np.asarray(avg_o[k]),
                                      np.asarray(avg_r[k]), err_msg=k)
