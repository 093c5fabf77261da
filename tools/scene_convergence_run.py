"""Scene-family (SoftGroup/ScanNet path) convergence run on the real TPU.

Trains the scene model on synthetic scenes and logs point-wise semantic
mIoU/accuracy plus ScanNet instance AP50 on held-out scenes every
``--eval-every`` steps (JSONL; the metrics of docs/scene_convergence.log).
Used for scene-path perf/accuracy A/Bs — currently the bf16-backbone flag
(``--bf16``, Config.scene_bf16): the scene cost is dense-conv FLOP/HBM bound,
so half precision pays where the ABC family's index-bound path did not.

Example (the session-5 baseline config):
    python tools/scene_convergence_run.py --steps 1500 --out /tmp/scene.jsonl
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--points", type=int, default=2048)
    ap.add_argument("--grid", type=int, default=32,
                    help="scene voxel grid (bench uses 64; the convergence "
                         "baseline docs/scene_convergence.log used 32)")
    ap.add_argument("--max-proposals", type=int, default=0,
                    help="0 = Config default")
    ap.add_argument("--bf16", action="store_true",
                    help="bf16 scene-backbone compute (Config.scene_bf16)")
    ap.add_argument("--soft", type=int, default=1,
                    help="1 = SoftGroup soft per-class grouping (scene "
                         "default, softgroup.py:437); 0 = argmax partition "
                         "(the round-4 semantics) — the soft-vs-argmax AP "
                         "convergence A/B")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--eval-every", type=int, default=250)
    ap.add_argument("--eval-scenes", type=int, default=8)
    ap.add_argument("--out", default="/tmp/scene_convergence.jsonl")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gcanet_tpu.config import Config, InstanceHeadConfig
    from gcanet_tpu.data.synthetic import synth_scene_batch
    from gcanet_tpu.models.softgroup_scene import SoftGroupNet
    from gcanet_tpu.runtime_setup import enable_compilation_cache
    from gcanet_tpu.train import instance_eval
    from gcanet_tpu.train import instances as inst_utils
    from gcanet_tpu.train import scene_step
    from gcanet_tpu.train import step as step_lib

    enable_compilation_cache()
    kw = {}
    if args.max_proposals:
        kw["instance_head"] = InstanceHeadConfig(
            max_proposals=args.max_proposals)
    from gcanet_tpu.config import scene_grouping_defaults

    cfg = Config(num_points=args.points, batch_size=args.batch,
                 scene_bf16=args.bf16,
                 scene_soft_grouping=bool(args.soft),
                 # SoftGroup scannetv2 grouping recipe, with the mean table
                 # at the SYNTHETIC per-class instance size (5 instances per
                 # scene -> n/5; keep thr = 0.05 * that filters the boundary
                 # junk clusters soft membership creates)
                 grouping=scene_grouping_defaults(
                     class_numpoint_mean=(args.points / 5.0,) * 10), **kw)
    model = SoftGroupNet(cfg, scene_grid=args.grid,
                         compute_bf16=cfg.scene_bf16)
    tx = step_lib.make_optimizer(cfg)
    state = scene_step.init_scene_state(cfg, model, tx,
                                        jax.random.PRNGKey(args.seed))
    train_step = scene_step.make_scene_train_step(cfg, model, tx, donate=True)

    @jax.jit
    def eval_step(params, batch_stats, xyz, feats):
        out = model.apply({"params": params, "batch_stats": batch_stats},
                          xyz, feats, train=False, rng=jax.random.PRNGKey(0))
        # NON-merged overlapping masks (SoftGroup get_instances semantics,
        # softgroup.py:537-604) — the ABC merge truncates soft overlaps
        keep, conf, npoint, masks = inst_utils.instance_masks_device(
            out.proposals.point_pid, out.instance.cls_scores,
            out.instance.iou_scores, out.instance.mask_scores,
            out.proposals.valid, cfg.num_primitives)
        sem_pred = jnp.argmax(out.semantic_scores, axis=-1)
        return (keep, conf, npoint, inst_utils.pack_mask_bits(masks),
                sem_pred)

    ecfg = cfg.replace(batch_size=1)
    eval_batches = [synth_scene_batch(ecfg, 1, seed=90000 + i)
                    for i in range(args.eval_scenes)]
    eval_dev = [(jnp.asarray(b["xyz"]), jnp.asarray(b["feats"]))
                for b in eval_batches]

    # same eval convention as SceneTrainer.test_one_epoch (scene_trainer.py):
    # scannetv2 cls_offset 2 (the synthetic scenes use semantic = cls + 2),
    # background column filtered, AP min_npoint 1 so small blob instances
    # stay evaluable
    cls_offset = 2
    class_ids = list(range(cls_offset, cfg.num_primitives - 1 + cls_offset))

    def evaluate():
        scenes, miou_sum, acc_sum = [], 0.0, 0.0
        for b, (xyz, feats) in zip(eval_batches, eval_dev):
            dev = eval_step(state.params, state.batch_stats, xyz, feats)
            keep, conf, npoint, mask_bits, sem_pred = jax.device_get(dev)
            masks = inst_utils.unpack_mask_bits(mask_bits,
                                                int(xyz.shape[1]))
            gt_sem = np.asarray(b["semantic"][0])
            pw = instance_eval.pointwise_semantic_eval(
                sem_pred[0] if sem_pred.ndim > 1 else sem_pred, gt_sem,
                cfg.num_primitives, ignore_label=-100)
            miou_sum += pw["miou"]
            acc_sum += pw["acc"]
            preds = inst_utils.instances_from_masks(
                keep, conf, npoint, masks,
                label_offset=cls_offset, encode_rle=False)
            bg_label = (cfg.num_primitives - 1) + cls_offset
            preds = [p for p in preds if p["label_id"] < bg_label]
            scenes.append({"preds": preds,
                           "gt_inst": np.asarray(b["instance"][0]),
                           "gt_sem": gt_sem})
        ap = instance_eval.evaluate_matches(scenes, class_ids, min_npoint=1)
        n = len(eval_batches)
        return miou_sum / n, acc_sum / n, float(ap["all_ap_50%"])

    rng = jax.random.PRNGKey(args.seed + 1)
    t0 = time.time()
    log = open(args.out, "w")

    # fresh batch per step via the trainer's prefetch thread (same protocol
    # as tools/convergence_run.py — no host-side jnp between dispatches)
    from gcanet_tpu.train.trainer import prefetch_to_device

    def batch_gen():
        for step in range(args.steps):
            b = synth_scene_batch(cfg, args.batch,
                                  seed=args.seed * 100_000 + 1000 + step)
            yield {k: v for k, v in b.items() if k != "index"}

    batches = prefetch_to_device(batch_gen())
    loss = float("nan")
    for step in range(args.steps + 1):
        if step % args.eval_every == 0:
            miou, acc, ap50 = evaluate()
            row = {"step": step, "loss": round(loss, 4),
                   "sem_miou": round(miou, 4), "acc": round(acc, 4),
                   "ap50": round(ap50, 4),
                   "t_min": round((time.time() - t0) / 60, 1)}
            print(json.dumps(row), flush=True)
            log.write(json.dumps(row) + "\n")
            log.flush()
        if step < args.steps:
            state, metrics = train_step(state, next(batches), rng)
            if (step + 1) % args.eval_every == 0:
                loss = float(metrics["total_loss"])
    print("done")
    log.close()


if __name__ == "__main__":
    main()
