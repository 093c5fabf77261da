"""Differential parity: scene-family point-wise losses vs the reference's
SoftGroup.point_wise_loss (softgroup/model/softgroup.py:152-171).

The reference method reads only self.ignore_label / self.semantic_weight,
so it is called unbound on a namespace; our compute_scene_losses (run with
the instance terms neutralised via an all-invalid proposal table) must
produce the same semantic cross-entropy (ignore -100) and offset L1.
Skips where the snapshot is absent.
"""

import pathlib
import types

import jax.numpy as jnp
import numpy as np
import pytest

from gcanet_tpu.config import Config
from gcanet_tpu.train.scene_step import compute_scene_losses

REF = pathlib.Path("/root/reference/softgroup/model/softgroup.py")

pytestmark = pytest.mark.skipif(not REF.exists(),
                                reason="reference snapshot not available")


def _load_point_wise_loss():
    from tests.test_reference_encoder_parity import _strip_imports

    ns = {
        "__file__": str(REF), "spconv": None,
        "ball_query": None, "bfs_cluster": None,
        "get_mask_iou_on_cluster": None, "get_mask_iou_on_pred": None,
        "get_mask_label": None, "global_avg_pool": None, "sec_max": None,
        "sec_min": None, "voxelization": None, "voxelization_idx": None,
        "cuda_cast": lambda f: f,
        "force_fp32": lambda *a, **k: (lambda f: f),
        "rle_decode": None, "rle_encode": None,
        "MLP": None, "ResidualBlock": None, "UBlock": None,
    }
    # also drop the package-relative imports (from .blocks / from ..ops ...)
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
    exec(compile(src, str(REF), "exec"), ns)
    return ns["SoftGroup"].point_wise_loss


@pytest.mark.parametrize("seed", range(3))
def test_scene_pointwise_losses_match(seed):
    import torch

    point_wise_loss = _load_point_wise_loss()
    rng = np.random.RandomState(seed)
    n, c, p = 600, 5, 4
    sem_scores = rng.randn(n, c).astype(np.float32)
    sem_gt = rng.randint(0, c, n)
    sem_gt[rng.rand(n) < 0.2] = -100
    inst_gt = rng.randint(0, 6, n)
    inst_gt[rng.rand(n) < 0.3] = -100
    offs = rng.randn(n, 3).astype(np.float32)
    offs_gt = rng.randn(n, 3).astype(np.float32)

    fake_self = types.SimpleNamespace(ignore_label=-100, semantic_weight=None)
    want = point_wise_loss(
        fake_self, torch.as_tensor(sem_scores), torch.as_tensor(offs),
        torch.as_tensor(sem_gt), torch.as_tensor(inst_gt),
        torch.as_tensor(offs_gt))

    # drive OUR real loss function with the instance terms neutralised
    # (all proposals invalid -> cls/mask/iou contribute zero)
    cfg = Config(num_points=n, batch_size=1, num_primitives=c,
                 max_instances=8)
    out = types.SimpleNamespace(
        semantic_scores=jnp.asarray(sem_scores),
        pt_offsets=jnp.asarray(offs),
        proposals=types.SimpleNamespace(
            point_pid=jnp.full((2, n), -1, jnp.int32),
            valid=jnp.zeros((p,), bool)),
        instance=types.SimpleNamespace(
            cls_scores=jnp.zeros((p, c), jnp.float32),
            mask_scores=jnp.zeros((2, n, c), jnp.float32),
            iou_scores=jnp.zeros((p, c), jnp.float32)))
    batch = {
        "semantic": jnp.asarray(sem_gt[None]),
        "I_gt_global": jnp.asarray(inst_gt[None]),
        "pt_offset_label": jnp.asarray(offs_gt[None]),
        "instance_pointnum": jnp.zeros((8,), jnp.int32),
        "instance_cls": jnp.full((8,), -100, jnp.int32),
        "inst_valid": jnp.zeros((8,), bool),
    }
    total, ld = compute_scene_losses(cfg, out, batch)
    np.testing.assert_allclose(float(ld["semantic_loss"]),
                               float(want["semantic_loss"]), atol=1e-5)
    np.testing.assert_allclose(float(ld["offset_loss"]),
                               float(want["offset_loss"]), atol=1e-5)
