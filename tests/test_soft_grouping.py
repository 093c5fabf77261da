"""Unit tests for the scene-family soft grouping op (build_soft_proposals)
and its config plumbing.  The reference differential lives in
tests/test_reference_soft_grouping_parity.py; these are fast structural
checks that run without the reference snapshot.
"""

import jax.numpy as jnp
import numpy as np

from gcanet_tpu.config import (Config, GroupingConfig,
                               config_from_namespace, build_option,
                               scene_grouping_defaults)
from gcanet_tpu.ops.grouping import build_soft_proposals


def _logits_for(member_probs):
    """[N, C] logits whose softmax approximates the given probabilities."""
    p = np.asarray(member_probs, np.float32)
    return np.log(np.maximum(p, 1e-9))


def test_soft_membership_overlap_and_order():
    # Two spatial blobs; blob A is ambiguous between classes 1 and 2
    # (both probs above thr) so it must appear in BOTH classes' channels.
    n = 16
    xyz = np.zeros((1, n, 3), np.float32)
    xyz[0, :8] = [0.2, 0.2, 0.2]
    xyz[0, 8:] = [0.8, 0.8, 0.8]
    xyz += np.random.RandomState(0).normal(scale=0.005, size=xyz.shape)
    probs = np.zeros((n, 3), np.float32)
    probs[:8] = [0.1, 0.5, 0.4]      # blob A: classes 1 AND 2 above 0.25
    probs[8:] = [0.05, 0.9, 0.05]    # blob B: class 1 only
    cfg = GroupingConfig(radius=0.1, score_thr=0.25, npoint_thr=0.05,
                         min_npoint=2, class_numpoint_mean=(-1.0,) * 3,
                         ignore_classes=(0,))
    props = build_soft_proposals(jnp.asarray(xyz),
                                 jnp.asarray(_logits_for(probs))[None],
                                 num_classes=3, cfg=cfg, max_proposals=8)
    pid = np.asarray(props.point_pid)          # [2 grouped classes, 16]
    assert pid.shape == (2, n)
    assert int(props.num) == 3                 # A@c1, B@c1, A@c2
    # class-major order then min-point-index: A@c1 (pid 0), B@c1 (1), A@c2 (2)
    assert list(np.asarray(props.cls)[:3]) == [1, 1, 2]
    assert sorted(np.nonzero(pid[0] == 0)[0]) == list(range(8))
    assert sorted(np.nonzero(pid[0] == 1)[0]) == list(range(8, 16))
    assert sorted(np.nonzero(pid[1] == 2)[0]) == list(range(8))
    # blob A points are members of two proposals (soft overlap)
    assert ((pid[:, :8] >= 0).sum(axis=0) == 2).all()


def test_soft_min_npoint_class_skip_is_batchwide():
    # class 2 has only 3 members ACROSS the batch < min_npoint=4 -> skipped
    n = 8
    xyz = np.random.RandomState(1).rand(2, n, 3).astype(np.float32) * 0.01
    probs = np.full((2, n, 3), 0.05, np.float32)
    probs[:, :, 1] = 0.9
    probs[0, :3, 2] = 0.5                      # 3 members of class 2
    probs[0, :3, 1] = 0.45
    cfg = GroupingConfig(radius=0.1, score_thr=0.25, npoint_thr=0.05,
                         min_npoint=4, class_numpoint_mean=(-1.0,) * 3,
                         ignore_classes=(0,))
    lg = np.stack([_logits_for(probs[i]) for i in range(2)])
    props = build_soft_proposals(jnp.asarray(xyz), jnp.asarray(lg),
                                 num_classes=3, cfg=cfg, max_proposals=8)
    assert not (np.asarray(props.cls)[np.asarray(props.valid)] == 2).any()


def test_soft_npoint_thr_mean_keep_rule():
    # class 1: mean 100, npoint_thr 0.1 -> thr 10; an 8-point cluster drops,
    # a 12-point cluster stays.  class 2: mean -1 -> thr 0.1, everything stays.
    n = 20
    xyz = np.zeros((1, n, 3), np.float32)
    xyz[0, :8] = [0.2, 0.2, 0.2]
    xyz[0, 8:] = [0.8, 0.8, 0.8]
    probs = np.zeros((n, 3), np.float32)
    probs[:8] = [0.0, 0.6, 0.4]
    probs[8:] = [0.0, 0.6, 0.4]
    cfg = GroupingConfig(radius=0.1, score_thr=0.3, npoint_thr=0.1,
                         min_npoint=1, class_numpoint_mean=(-1.0, 100.0, -1.0),
                         ignore_classes=(0,))
    props = build_soft_proposals(jnp.asarray(xyz),
                                 jnp.asarray(_logits_for(probs))[None],
                                 num_classes=3, cfg=cfg, max_proposals=8)
    cls = np.asarray(props.cls)[np.asarray(props.valid)]
    sizes = np.asarray(props.size)[np.asarray(props.valid)]
    # class 1 keeps only the 12-point blob; class 2 keeps both blobs
    assert sorted(zip(cls.tolist(), sizes.tolist())) == [
        (1, 12), (2, 8), (2, 12)]


def test_scene_grouping_defaults_cli():
    c = build_option(["--model_dict", "softgroup.model.softgroup"])
    g = c.grouping
    assert g.score_thr == 0.2 and g.npoint_thr == 0.05
    assert g.ignore_classes == (0, 1)
    # mean table stays the reference ScanNet-scale default
    # (hierarchical_aggregation.cpp:7); synthetic drivers override it
    assert g.class_numpoint_mean == GroupingConfig().class_numpoint_mean
    assert scene_grouping_defaults(
        class_numpoint_mean=(400.0,) * 10).class_numpoint_mean \
        == (400.0,) * 10
    # explicit override still wins
    c2 = build_option(["--model_dict", "softgroup.model.softgroup",
                       "--ignore_classes", "0,1,2"])
    assert c2.grouping.ignore_classes == (0, 1, 2)
    # ABC path untouched
    c3 = build_option([])
    assert c3.grouping.score_thr == 0.45
    assert c3.scene_soft_grouping is True


def test_scene_defaults_preserve_strict_caps():
    c = build_option(["--model_dict", "softgroup.model.softgroup",
                      "--strict_caps", "1"])
    assert c.grouping.neighbor_cap == 3000
    assert c.grouping.score_thr == 0.2
