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


def _shard_inputs(mesh, *arrays):
    """Device placement for serving inputs: plain device arrays single-chip,
    batch-axis-sharded global arrays when serving over a mesh."""
    if mesh is None:
        return tuple(jnp.asarray(a) for a in arrays)
    from jax.sharding import NamedSharding, PartitionSpec

    sh = NamedSharding(mesh, PartitionSpec("data"))
    return tuple(jax.make_array_from_process_local_data(sh, np.asarray(a))
                 for a in arrays)


def _require_single_device(mesh, what: str):
    if mesh is not None:
        raise ValueError(
            f"{what} runs batch-1 and cannot shard over a mesh "
            f"(cfg.mesh_shape > 1) — use predict_batch/predict_stream with "
            f"a batch divisible by the mesh size")


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
        # cfg.mesh_shape > 1: data-parallel serving — params replicated over
        # the device mesh, batched inputs sharded along the batch axis
        # (multi-chip throughput scaling for predict_batch/predict_stream)
        self.mesh = step_lib.make_mesh(self.cfg)
        if self.mesh is not None:
            self.state = step_lib.replicate_to_mesh(self.state, self.mesh)

        @jax.jit
        def _forward(params, batch_stats, xyz, normals):
            return self.model.apply({"params": params, "batch_stats": batch_stats},
                                    xyz, normals, train=False,
                                    rng=jax.random.PRNGKey(0))

        self._forward = _forward

        @jax.jit
        def _forward_fast(params, batch_stats, xyz, normals):
            # forward + on-device instance extraction: on the tunnelled TPU
            # the device->host fetch is the serving bottleneck (~31 MB/s
            # measured; [CH, N, C] mask scores alone are several hundred ms),
            # so only the merged labels + a [P, CI] table leave the device.
            # Shared by the single and batched fast paths (batch = 1 there).
            out = self.model.apply(
                {"params": params, "batch_stats": batch_stats},
                xyz, normals, train=False, rng=jax.random.PRNGKey(0))
            merged, keep, conf, npoint, covered = \
                inst_utils.merged_labels_device(
                    out.proposals.point_pid, out.instance.cls_scores,
                    out.instance.iou_scores, out.instance.mask_scores,
                    out.proposals.valid, self.cfg.num_primitives)
            return (merged, keep, conf, npoint, covered,
                    out.proposals.batch, out.type_per_point,
                    out.param_per_point, out.pt_offsets, out.embedding)

        self._forward_fast = _forward_fast

    def predict(self, xyz: np.ndarray, normals: np.ndarray,
                return_masks: bool = False,
                return_embedding: bool = False,
                panoptic: bool = False) -> Dict:
        """xyz/normals [N, 3] (N must equal cfg.num_points) -> prediction dict
        with per-point types/params/offsets and extracted instances.

        Default fast path: instance extraction runs on device and the
        ``instances`` list carries RLE masks reconstructed from the merged
        (non-overlapping) labels.  ``return_masks=True`` switches to the host
        extraction path whose RLE masks may overlap exactly as the
        reference's get_instances emits them (dgcnn-4.py:1040-1120) — at the
        cost of fetching the full mask-score tensor.  The 64-d per-point
        embedding (2 MB at N=8192 — half the fast path's fetch bytes on the
        ~23 MB/s tunnel) is fetched only with ``return_embedding=True``
        (implied by the meanshift cluster mode and ``return_masks``).
        """
        _require_single_device(self.mesh, "predict()")
        n = xyz.shape[0]
        if return_masks or self.cluster_mode == "meanshift":
            out = self._forward(self.state.params, self.state.batch_stats,
                                jnp.asarray(xyz)[None], jnp.asarray(normals)[None])
            # single device->host transfer: every np.asarray is its own RTT
            (pid, sem, cls_s, iou_s, mask_s, valid, tpp, ppp, off,
             emb) = jax.device_get(
                (out.proposals.point_pid, out.semantic_scores,
                 out.instance.cls_scores, out.instance.iou_scores,
                 out.instance.mask_scores, out.proposals.valid,
                 out.type_per_point[0], out.param_per_point[0],
                 out.pt_offsets, out.embedding))
            preds = inst_utils.get_instances(
                pid, sem, cls_s, iou_s, mask_s, valid, self.cfg.num_primitives)
            if self.cluster_mode == "meanshift":
                from gcanet_tpu.geometry.affinity import mean_shift

                merged = mean_shift(emb, self.cfg.bandwidth)[0]
            else:
                merged = inst_utils.merge_masks(preds) if preds \
                    else np.zeros(n, np.int32)
            result = {
                "type_per_point": tpp,
                "param_per_point": ppp,
                "pt_offsets": off,
                "embedding": emb[0],
                "instances": preds,
                "instance_labels": merged,
            }
            if panoptic:
                result["panoptic"] = inst_utils.panoptic_fusion(
                    tpp.argmax(-1), preds, self.cfg.num_primitives)
            return result

        dev = self._forward_fast(self.state.params, self.state.batch_stats,
                                 jnp.asarray(xyz)[None],
                                 jnp.asarray(normals)[None])
        if not return_embedding:
            dev = dev[:-1]
        fetched = jax.device_get(dev)
        merged, keep, conf, npoint, covered, _, tpp, ppp, off = fetched[:9]
        emb = fetched[9][0] if return_embedding else None
        preds = inst_utils.instances_from_merged(merged, keep, conf, npoint,
                                                 covered)
        result = {
            "type_per_point": tpp[0],
            "param_per_point": ppp[0],
            "pt_offsets": off,
            "embedding": emb,
            "instances": preds,
            "instance_labels": merged,
        }
        if panoptic:
            result["panoptic"] = inst_utils.panoptic_fusion(
                tpp[0].argmax(-1), preds, self.cfg.num_primitives)
        return result

    def predict_batch(self, xyz: np.ndarray, normals: np.ndarray):
        """Batched fast-path inference: ``xyz/normals [B, N, 3]`` -> list of
        per-cloud prediction dicts.

        Batching amortises the per-dispatch latency that dominates batch-1
        serving (BASELINE.md: 41.5 clouds/s forward at batch 8 vs 6.6 full
        predict at batch 1 on the tunnelled link).  Proposals are extracted
        on device over the whole batch (the proposal table carries its batch
        item, ops/grouping.py Proposals.batch) and split per cloud on host;
        per-cloud instance labels are re-compacted to local 0..K-1 ids.
        """
        if np.ndim(xyz) != 3:
            raise ValueError(
                f"predict_batch expects xyz [B, N, 3]; got shape "
                f"{np.shape(xyz)} — use predict() for a single [N, 3] cloud")
        dev = self._forward_fast(self.state.params, self.state.batch_stats,
                                 *_shard_inputs(self.mesh, xyz, normals))
        return self._finalize_batch(dev, *xyz.shape[:2])

    def _finalize_batch(self, dev, b: int, n: int):
        """Fetch one dispatched fast-path batch and build per-cloud dicts."""
        (merged, keep, conf, npoint, covered, prop_batch, tpp, ppp,
         off) = jax.device_get(dev[:-1])          # embedding not fetched
        merged = merged.reshape(b, n)
        covered = covered.reshape(b, n)
        off = off.reshape(b, n, 3)

        results = []
        for bi in range(b):
            preds = inst_utils.instances_from_merged(
                merged[bi], keep, conf, npoint, covered[bi],
                prop_mask=(prop_batch == bi))
            # per-cloud labels re-compacted to local 0..K-1 (0 = unassigned)
            local = np.zeros(n, np.int32)
            for local_id, inst in enumerate(preds):
                local[inst_utils.rle_decode(inst["pred_mask"]).astype(bool)] \
                    = local_id
            results.append({
                "type_per_point": tpp[bi],
                "param_per_point": ppp[bi],
                "pt_offsets": off[bi],
                "embedding": None,
                "instances": preds,
                "instance_labels": local,
            })
        return results

    def predict_stream(self, batches, depth: int = 2):
        """Pipelined batched inference: iterate ``(xyz [B, N, 3], normals)``
        pairs, yield per-cloud prediction dicts in order.

        See ``ScenePredictor.predict_stream`` for the scene family.

        ``predict_batch`` serialises device compute, the device->host fetch
        and host postprocess; on a fetch-bound link (the tunnelled TPU:
        33 ms RTT + ~23 MB/s, BASELINE.md serving numbers) that leaves the
        device idle during every fetch.  Here up to ``depth`` batches are
        dispatched ahead (jax dispatch is async) before the oldest is
        fetched, overlapping batch i's fetch+postprocess with batch i+1's
        device compute — the steady-state cost is max(compute, fetch), not
        their sum.  All batches must share one [B, N] shape (one compiled
        program).
        """
        from collections import deque

        pending = deque()
        for xyz, normals in batches:
            b, n = np.shape(xyz)[:2]
            dev = self._forward_fast(self.state.params, self.state.batch_stats,
                                     *_shard_inputs(self.mesh, xyz, normals))
            pending.append((dev, b, n))
            if len(pending) > depth:
                yield from self._finalize_batch(*pending.popleft())
        while pending:
            yield from self._finalize_batch(*pending.popleft())

    def predict_type_sharded(self, xyz: np.ndarray, normals: np.ndarray):
        """Per-point semantics for ONE cloud LARGER than the compiled
        ``num_points`` — the point axis sharded over all devices (ring kNN +
        ring-gathered edge convs, parallel/sharded_encoder.py).

        xyz/normals [N, 3] with N any multiple of the device count (no
        relation to cfg.num_points).  Returns a dict with per-point
        ``type_per_point`` [N, C] (argmax = semantic class),
        ``param_per_point`` [N, 22] and ``embedding`` [N, out_dim].
        Uses the restored checkpoint's weights; grouping/instance
        extraction remain single-chip paths.
        """
        from gcanet_tpu.parallel.sharded_encoder import predict_type_sharded

        mesh = self.mesh  # None => build over all local devices inside
        type_pp, param_pp, emb = predict_type_sharded(
            self.cfg, self.state.params, np.asarray(xyz, np.float32),
            np.asarray(normals, np.float32), mesh=mesh)
        return {"type_per_point": type_pp, "param_per_point": param_pp,
                "embedding": emb,
                "types": type_pp.argmax(-1)}


class ScenePredictor:
    """Scene-family (SoftGroup) serving: the switchover surface for reference
    users who ran softgroup's ``test.py`` inference loop (per-scene semantic
    labels, offsets and scored instance masks).

    Same serving design as ``Predictor``: one jit program doing forward +
    on-device instance extraction, only merged labels and small score tables
    leave the device, and ``predict_stream`` pipelines dispatch ahead of the
    fetch.  ``cls_offset`` maps instance-class columns to the dataset's
    semantic ids (scannetv2: 2; s3dis: 0; stpls3d: 1; kitti: 11 — the
    SceneTrainer variants)."""

    def __init__(self, cfg: Config, checkpoint_dir: Optional[str] = None,
                 cls_offset: int = 2, scene_grid: int = 64):
        from gcanet_tpu.models.softgroup_scene import SoftGroupNet
        from gcanet_tpu.train import scene_step

        self.cfg = cfg
        self.cls_offset = cls_offset
        self.model = SoftGroupNet(cfg, scene_grid=scene_grid,
                                  compute_bf16=cfg.scene_bf16)
        tx = step_lib.make_optimizer(cfg)
        self.state = scene_step.init_scene_state(cfg, self.model, tx,
                                                 jax.random.PRNGKey(cfg.seed))
        if checkpoint_dir:
            import orbax.checkpoint as ocp

            with ocp.StandardCheckpointer() as ckptr:
                self.state = ckptr.restore(checkpoint_dir, self.state)
        self.mesh = step_lib.make_mesh(cfg)
        if self.mesh is not None:
            self.state = step_lib.replicate_to_mesh(self.state, self.mesh)

        model = self.model

        @jax.jit
        def _forward_fast(params, batch_stats, xyz, feats):
            out = model.apply({"params": params, "batch_stats": batch_stats},
                              xyz, feats, train=False,
                              rng=jax.random.PRNGKey(0))
            # NON-merged overlapping masks — the reference's forward_test
            # emits independent scored masks (softgroup.py:537-604) and soft
            # grouping makes overlap inherent; the ABC merge would truncate
            # every overlapped mask (BASELINE.md round-5 AP evidence)
            keep, conf, npoint, masks = inst_utils.instance_masks_device(
                out.proposals.point_pid, out.instance.cls_scores,
                out.instance.iou_scores, out.instance.mask_scores,
                out.proposals.valid, cfg.num_primitives)
            sem_pred = jnp.argmax(out.semantic_scores, axis=-1)
            # bit-packed masks: 8x smaller fetch on the ~31 MB/s tunnel
            return (keep, conf, npoint, inst_utils.pack_mask_bits(masks),
                    out.proposals.batch, sem_pred, out.pt_offsets)

        self._forward_fast = _forward_fast

    def _finalize_batch(self, dev, b: int, n: int):
        (keep, conf, npoint, mask_bits, prop_batch, sem_pred,
         off) = jax.device_get(dev)
        masks = inst_utils.unpack_mask_bits(mask_bits, b * n)
        sem_pred = sem_pred.reshape(b, n)
        off = off.reshape(b, n, 3)
        bg_label = (self.cfg.num_primitives - 1) + self.cls_offset

        results = []
        for bi in range(b):
            preds = inst_utils.instances_from_masks(
                keep, conf, npoint, masks[:, bi * n:(bi + 1) * n, :],
                prop_mask=(prop_batch == bi), label_offset=self.cls_offset)
            # background-column predictions (instance class C-1) filtered
            # exactly as SceneTrainer.test_one_epoch does
            preds = [p for p in preds if p["label_id"] < bg_label]
            # per-point convenience labels from the overlapping masks:
            # higher-confidence instance wins a contested point, 0 = none
            # (a flat labeling cannot express overlap; `instances` can)
            labels = np.zeros(n, np.int32)
            for rank1, p in sorted(enumerate(preds, start=1),
                                   key=lambda t: t[1]["conf"]):
                labels[inst_utils.rle_decode(p["pred_mask"]).astype(bool)] \
                    = rank1
            results.append({
                "semantic_preds": sem_pred[bi],
                "pt_offsets": off[bi],
                "instances": preds,
                "instance_labels": labels,
            })
        return results

    def predict(self, xyz: np.ndarray, feats: np.ndarray) -> Dict:
        """One scene: ``xyz [N, 3]``, ``feats [N, C]`` -> prediction dict."""
        _require_single_device(self.mesh, "predict()")
        dev = self._forward_fast(self.state.params, self.state.batch_stats,
                                 jnp.asarray(xyz)[None],
                                 jnp.asarray(feats)[None])
        return self._finalize_batch(dev, 1, xyz.shape[0])[0]

    def predict_batch(self, xyz: np.ndarray, feats: np.ndarray):
        """``xyz [B, N, 3]``, ``feats [B, N, C]`` -> list of scene dicts."""
        if np.ndim(xyz) != 3:
            raise ValueError(
                f"predict_batch expects xyz [B, N, 3]; got {np.shape(xyz)}")
        dev = self._forward_fast(self.state.params, self.state.batch_stats,
                                 *_shard_inputs(self.mesh, xyz, feats))
        return self._finalize_batch(dev, *xyz.shape[:2])

    def predict_stream(self, batches, depth: int = 2):
        """Pipelined scene inference over ``(xyz, feats)`` batches — same
        dispatch-ahead overlap as ``Predictor.predict_stream``."""
        from collections import deque

        pending = deque()
        for xyz, feats in batches:
            b, n = np.shape(xyz)[:2]
            dev = self._forward_fast(self.state.params, self.state.batch_stats,
                                     *_shard_inputs(self.mesh, xyz, feats))
            pending.append((dev, b, n))
            if len(pending) > depth:
                yield from self._finalize_batch(*pending.popleft())
        while pending:
            yield from self._finalize_batch(*pending.popleft())
