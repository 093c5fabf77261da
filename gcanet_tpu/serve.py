"""Inference/serving API.

A deployment-oriented wrapper around the flagship model: load a checkpoint
once, then ``predict`` on fixed-size clouds — one jit-compiled device program
per call plus the host-side instance extraction.  This is the "switchover"
surface for reference users who called the model through
``process_batch(postprocess=True)`` (train_new.py:38-59).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gcanet_tpu.config import Config
from gcanet_tpu.models.registry import build_model
from gcanet_tpu.train import instances as inst_utils
from gcanet_tpu.train import step as step_lib


class Predictor:
    """cluster_mode: 'grouping' (GCANet gated grouping + instance head) or
    'meanshift' (the HPNet-heritage embedding mean-shift of abc_utils.py:16-31,
    driven by cfg.bandwidth)."""

    def __init__(self, cfg: Config, checkpoint_dir: Optional[str] = None,
                 cluster_mode: str = "grouping"):
        self.cluster_mode = cluster_mode
        self.cfg = cfg.replace(using_set_aggr=True) if cfg.using_set_aggr else cfg
        self.model = build_model(self.cfg)
        tx = step_lib.make_optimizer(self.cfg)
        self.state = step_lib.init_state(self.cfg, self.model, tx,
                                         jax.random.PRNGKey(cfg.seed))
        if checkpoint_dir:
            import orbax.checkpoint as ocp

            with ocp.StandardCheckpointer() as ckptr:
                self.state = ckptr.restore(checkpoint_dir, self.state)

        @jax.jit
        def _forward(params, batch_stats, xyz, normals):
            return self.model.apply({"params": params, "batch_stats": batch_stats},
                                    xyz, normals, train=False,
                                    rng=jax.random.PRNGKey(0))

        self._forward = _forward

    def predict(self, xyz: np.ndarray, normals: np.ndarray) -> Dict:
        """xyz/normals [N, 3] (N must equal cfg.num_points) -> prediction dict
        with per-point types/params/offsets and extracted instances."""
        out = self._forward(self.state.params, self.state.batch_stats,
                            jnp.asarray(xyz)[None], jnp.asarray(normals)[None])
        preds = inst_utils.get_instances(
            np.asarray(out.proposals.point_pid), np.asarray(out.semantic_scores),
            np.asarray(out.instance.cls_scores),
            np.asarray(out.instance.iou_scores),
            np.asarray(out.instance.mask_scores),
            np.asarray(out.proposals.valid), self.cfg.num_primitives)
        n = xyz.shape[0]
        if self.cluster_mode == "meanshift":
            from gcanet_tpu.geometry.affinity import mean_shift

            merged = mean_shift(np.asarray(out.embedding), self.cfg.bandwidth)[0]
        else:
            merged = inst_utils.merge_masks(preds) if preds else np.zeros(n, np.int32)
        return {
            "type_per_point": np.asarray(out.type_per_point[0]),
            "param_per_point": np.asarray(out.param_per_point[0]),
            "pt_offsets": np.asarray(out.pt_offsets),
            "embedding": np.asarray(out.embedding[0]),
            "instances": preds,
            "instance_labels": merged,
        }
