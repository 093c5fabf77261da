"""Trainer for the scene-level SoftGroup model family.

Reuses the base Trainer's workspace/checkpoint/LR/loop machinery and swaps
the three scene-specific pieces: the ScanNet-style dataset
(``data/scene_dataset.py``), the scene train step
(``train/scene_step.py``), and a scene evaluation epoch reporting
point-wise semantic mIoU/accuracy plus ScanNet instance AP
(softgroup's ScanNetEval path, ``train/instance_eval.py``).

Selected automatically by ``train_new.py`` when ``--model_dict`` names the
scene family (e.g. ``softgroup.model.softgroup``).
"""

from __future__ import annotations

import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from gcanet_tpu.train import instance_eval
from gcanet_tpu.train import instances as inst_utils
from gcanet_tpu.train import scene_step
from gcanet_tpu.train import step as step_lib
from gcanet_tpu.train.trainer import Trainer

SCENE_SUFFIX = "_inst_nostuff.pth"          # scannetv2 preprocessed dumps
CLS_OFFSET = 2                              # scannetv2.py:23-27


class SceneTrainer(Trainer):
    # instance-class -> semantic-label offset of the active dataset variant
    # (scannetv2 default; set per variant in build_dataloaders)
    cls_offset = CLS_OFFSET

    def build_model_optimizer(self):
        cfg = self.cfg
        from gcanet_tpu.models.registry import build_model

        self.model = build_model(cfg)
        self.tx = step_lib.make_optimizer(cfg)
        self.mesh = step_lib.make_mesh(cfg)
        rng = jax.random.PRNGKey(cfg.seed)
        self.state = scene_step.init_scene_state(cfg, self.model, self.tx, rng)
        n_params = sum(x.size for x in jax.tree.leaves(self.state.params))
        print(f"parameters number: {n_params / 1e6:.2f} M")
        self.train_step = scene_step.make_scene_train_step(
            cfg, self.model, self.tx, self.mesh, donate=True)

        model = self.model
        # S3DIS eval protocol (softgroup.py:380-411) — static flag, one
        # compile; train path never splits
        x4 = bool(cfg.x4_split)

        if bool(cfg.semantic_only):
            # stage-1 eval: point-wise semantic/offset only (softgroup.py's
            # `if not self.semantic_only` guards in forward_test)
            @jax.jit
            def eval_step(params, batch_stats, xyz, feats):
                out = model.apply(
                    {"params": params, "batch_stats": batch_stats},
                    xyz, feats, train=False, rng=jax.random.PRNGKey(0),
                    x4_split=x4)
                return jnp.argmax(out.semantic_scores, axis=-1)
        else:
            @jax.jit
            def eval_step(params, batch_stats, xyz, feats):
                out = model.apply(
                    {"params": params, "batch_stats": batch_stats},
                    xyz, feats, train=False, rng=jax.random.PRNGKey(0),
                    x4_split=x4)
                # NON-merged overlapping masks: SoftGroup eval semantics
                # (softgroup.py:537-604) — required under soft grouping,
                # where one point may live in several classes' proposals
                keep, conf, npoint, masks = \
                    inst_utils.instance_masks_device(
                        out.proposals.point_pid, out.instance.cls_scores,
                        out.instance.iou_scores, out.instance.mask_scores,
                        out.proposals.valid, cfg.num_primitives)
                sem_pred = jnp.argmax(out.semantic_scores, axis=-1)
                # bit-packed: 8x smaller fetch (real scenes are ~250k pts)
                return (keep, conf, npoint,
                        inst_utils.pack_mask_bits(masks), sem_pred)

        self.eval_step = eval_step
        self.start_epoch = 0
        if not cfg.not_load_model:
            self.load_checkpoint()
        if self.mesh is not None:
            # as in Trainer.build_model_optimizer: a jit over a (possibly
            # multi-host) mesh accepts only global arrays
            self.state = step_lib.replicate_to_mesh(self.state, self.mesh)

    # ------------------------------------------------------------------- data
    def build_dataloaders(self):
        """``--dataset`` selects the variant (reference: the per-dataset
        config files of softgroup/data); default/'ABC'/'scannetv2' use the
        ScanNet-convention base reader."""
        cfg = self.cfg
        from gcanet_tpu.data import scene_dataset as sdm

        name = (cfg.dataset or "").lower()
        if name in ("s3dis",):
            cls, train_prefix, val_prefix = sdm.S3DISSceneDataset, \
                ["Area_1", "Area_2", "Area_3", "Area_4", "Area_6"], ["Area_5"]
            probe = cfg.data_path
            self.cls_offset = 0
        elif name in ("stpls3d",):
            cls, train_prefix, val_prefix = \
                sdm.STPLS3DSceneDataset, "train", "val"
            probe = os.path.join(cfg.data_path, "train")
            self.cls_offset = 1
        elif name in ("kitti", "semantic-kitti"):
            cls, train_prefix, val_prefix = \
                sdm.KITTISceneDataset, "train", "val"
            probe = os.path.join(cfg.data_path, "sequences")
            self.cls_offset = 11
        else:
            cls, train_prefix, val_prefix = \
                sdm.ScanNetSceneDataset, "train", "val"
            probe = os.path.join(cfg.data_path, "train")
            self.cls_offset = CLS_OFFSET

        if os.path.isdir(probe):
            suffix = self._detect_suffix(cls, probe)
            self.train_data = cls(cfg.data_path, train_prefix, suffix, cfg,
                                  training=True)
            if isinstance(val_prefix, str) and not os.path.isdir(
                    os.path.join(cfg.data_path, val_prefix)) \
                    and cls is not sdm.KITTISceneDataset:
                val_prefix = train_prefix
            self.test_data = cls(cfg.data_path, val_prefix, suffix, cfg,
                                 training=False)
        else:
            print(f"scene data {probe} not found -> synthetic scenes")
            self.train_data = self.test_data = None

    @staticmethod
    def _detect_suffix(cls, probe_dir: str) -> str:
        from gcanet_tpu.data import scene_dataset as sdm

        if cls is sdm.KITTISceneDataset:
            return ".bin"
        try:
            files = os.listdir(probe_dir)
        except OSError:
            files = []
        if any(f.endswith(SCENE_SUFFIX) for f in files):
            return SCENE_SUFFIX
        if any(f.endswith(".pth") for f in files):
            return ".pth"
        return ".npz"

    def _train_batches(self, epoch: int):
        """Per-process shard of every global batch, instance ids re-based so
        the in-step axis_index rebase composes (see Trainer._train_batches)."""
        cfg = self.cfg
        from gcanet_tpu.parallel.dist import get_dist_info, shard_bounds

        rank, world = get_dist_info()
        if self.train_data is not None:
            for batch in self.train_data.batches(cfg.batch_size, shuffle=True,
                                                 seed=cfg.seed + epoch,
                                                 shard=(rank, world)):
                yield step_lib.rebase_local_batch(batch, rank, world,
                                                  cfg.max_instances)
        else:
            from gcanet_tpu.data.synthetic import synth_scene_batch

            lo, hi = shard_bounds(cfg.batch_size, rank, world)
            for i in range(32):
                batch = synth_scene_batch(cfg, hi - lo,
                                          seed=(epoch * 1000 + i) * world + rank)
                yield step_lib.rebase_local_batch(batch, rank, world,
                                                  cfg.max_instances)

    def _test_batches(self):
        """Eval stream, rank-strided (results re-joined via collect_results)."""
        cfg = self.cfg
        from gcanet_tpu.parallel.dist import get_dist_info

        rank, world = get_dist_info()
        if self.test_data is not None:
            yield from self.test_data.batches(1, shuffle=False,
                                              stride=(rank, world))
        else:
            from gcanet_tpu.data.synthetic import synth_scene_batch

            for i in range(8):
                if i % world == rank:
                    yield synth_scene_batch(cfg, 1, seed=90000 + i)

    # ------------------------------------------------------------------- eval
    def test_one_epoch(self, epoch: int):
        cfg = self.cfg
        scenes = []
        sem_stats: Dict[str, float] = {}
        cnt = 0
        self._results_rows = []
        params, batch_stats = self._local_eval_params()
        semantic_only = bool(cfg.semantic_only)
        for batch in self._test_batches():
            xyz = jnp.asarray(batch["xyz"])
            feats = jnp.asarray(batch["feats"])
            try:
                dev = self.eval_step(params, batch_stats, xyz, feats)
            except Exception as e:                 # noqa: BLE001
                self.logger.error(
                    f"error: {batch.get('index', ['?'])[0]}: {e}")
                continue
            if semantic_only:
                sem_pred = jax.device_get(dev)
            else:
                keep, conf, npoint, mask_bits, sem_pred = jax.device_get(dev)
                masks = inst_utils.unpack_mask_bits(
                    mask_bits, int(np.shape(batch["xyz"])[0]
                                   * np.shape(batch["xyz"])[1]))
            gt_sem = np.asarray(batch["semantic"][0])
            gt_inst = np.asarray(batch["instance"][0])

            pw = instance_eval.pointwise_semantic_eval(
                sem_pred[0] if sem_pred.ndim > 1 else sem_pred, gt_sem,
                cfg.num_primitives, ignore_label=-100)
            for k, v in pw.items():
                sem_stats[k] = sem_stats.get(k, 0.0) + v

            if not semantic_only:
                # background-column predictions (instance class C-1, the
                # loss's background label) are filtered after extraction
                preds = inst_utils.instances_from_masks(
                    keep, conf, npoint, masks,
                    label_offset=self.cls_offset, encode_rle=False)
                bg_label = (cfg.num_primitives - 1) + self.cls_offset
                preds = [pr for pr in preds if pr["label_id"] < bg_label]
                scenes.append({"preds": preds, "gt_inst": gt_inst,
                               "gt_sem": gt_sem})
            self._results_rows.append({
                "ID": batch.get("index", ["?"])[0],
                "miou": round(pw["miou"], 3), "acc": round(pw["acc"], 3),
            })
            cnt += 1

        from gcanet_tpu.parallel.dist import is_main_process

        # AP matching needs the full scene set on every process
        sem_stats, cnt, scenes = self._merge_eval_results(sem_stats, cnt,
                                                          scenes)

        # instance classes exclude the background column (cls C-1)
        class_ids = list(range(self.cls_offset,
                               cfg.num_primitives - 1 + self.cls_offset))
        # reference benchmark default is min_npoint=100
        # (instance_eval.py:25-28); tiny synthetic scenes use 1 so small
        # blob instances stay evaluable.  --eval_min_npoint overrides.
        min_npoint = cfg.eval_min_npoint or \
            (1 if self.test_data is None else None)
        ap = instance_eval.evaluate_matches(
            scenes, class_ids, min_npoint=min_npoint) if scenes \
            else {"all_ap": 0.0, "all_ap_50%": 0.0, "all_ap_25%": 0.0}
        pq = instance_eval.panoptic_quality(scenes, class_ids)["pq"] \
            if scenes else 0.0
        avg = {k: v / max(cnt, 1) for k, v in sem_stats.items()}
        avg["pq"] = pq
        avg.update({k: float(v) for k, v in ap.items()
                    if isinstance(v, (int, float))})
        if is_main_process():
            self._write_results_csv(epoch, avg)
            self.test_viz.log_scalars(avg, epoch)
            self.logger.info("eval " + " ".join(
                f"{k}: {v:.4f}" for k, v in sorted(avg.items())))
        # (mIoU, AP50) drive the base class's best-checkpoint retention
        return avg.get("miou", 0.0), avg.get("all_ap_50%", 0.0)
