"""Reusable production-size convergence run on the real TPU.

Trains the full pipeline on synthetic ABC-like objects and logs Hungarian
mIoU / type-mIoU on held-out objects every ``--eval-every`` steps (JSONL, the
format of docs/production_convergence*.log).  Used for perf/accuracy A/B
sweeps: proposal-cap occupancy (``--max-proposals``), approx-kNN recall
(``--recall``, ``exact`` for lax.top_k parity), and a harder instance mix
(``--hard``: more, smaller primitives per object).

Example (the round-1 reference config):
    python tools/convergence_run.py --steps 1000 --out /tmp/conv.jsonl
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def harder_mix(cfg, seed):
    """Objects with 8-16 instances (vs the default 3-8) — smaller primitives,
    denser proposal occupancy (the de-risk mix asked for by the round-1
    verdict for the recall-0.8 default)."""
    from gcanet_tpu.data.synthetic import synth_batch

    return synth_batch(cfg, cfg.batch_size, seed=seed, inst_range=(8, 17))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--points", type=int, default=8192)
    ap.add_argument("--max-proposals", type=int, default=200)
    ap.add_argument("--max-instances", type=int, default=48)
    ap.add_argument("--recall", default="0.8",
                    help="approx-kNN recall target, or 'exact'")
    ap.add_argument("--hard", action="store_true",
                    help="harder mix: 8-16 instances per object")
    ap.add_argument("--encoder-bf16", action="store_true",
                    help="bf16 edge-tensor compute in the DGCNN encoder")
    ap.add_argument("--nn-nb", type=int, default=0,
                    help="edge-conv/embedding graph degree K (0 = Config "
                         "default, 48 since the round-2 K-sweep; pass 80 "
                         "for the reference's nn_nb)")
    ap.add_argument("--shared-graph", action="store_true",
                    help="reuse the first edge-conv kNN graph for all three "
                         "edge convs (Config.shared_graph A/B)")
    ap.add_argument("--nn-nb-inner", type=int, default=0,
                    help="graph degree for edge convs 2-3 (Config.nn_nb_inner "
                         "A/B; 0 = nn_nb-uniform, which matches the Config "
                         "default again since the round-3 hard-mix revert)")
    ap.add_argument("--seed", type=int, default=0,
                    help="init/data seed family for repeat runs (eval "
                         "objects stay fixed so runs share the held-out set)")
    ap.add_argument("--eval-every", type=int, default=250)
    ap.add_argument("--eval-objects", type=int, default=8)
    ap.add_argument("--out", default="/tmp/convergence.jsonl")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gcanet_tpu.config import Config, InstanceHeadConfig
    from gcanet_tpu.data.synthetic import synth_batch
    from gcanet_tpu.models.primitive_net import PrimitiveNet
    from gcanet_tpu.runtime_setup import enable_compilation_cache
    from gcanet_tpu.train import step as step_lib
    from gcanet_tpu.train import metrics as M

    enable_compilation_cache()
    knn_impl = "xla" if args.recall == "exact" else f"approx:{args.recall}"
    cfg = Config(num_points=args.points, batch_size=args.batch,
                 max_instances=args.max_instances, knn_impl=knn_impl,
                 encoder_bf16=args.encoder_bf16,
                 shared_graph=args.shared_graph,
                 nn_nb_inner=args.nn_nb_inner,
                 instance_head=InstanceHeadConfig(
                     max_proposals=args.max_proposals),
                 **({"nn_nb": args.nn_nb} if args.nn_nb else {}))
    model = PrimitiveNet(cfg)
    tx = step_lib.make_optimizer(cfg)
    state = step_lib.init_state(cfg, model, tx, jax.random.PRNGKey(args.seed))
    train_step = step_lib.make_train_step(cfg, model, tx)
    eval_step = step_lib.make_eval_step(cfg, model)

    make_batch = harder_mix if args.hard else \
        (lambda c, s: synth_batch(c, args.batch, seed=s))

    ecfg = cfg.replace(batch_size=1)
    eval_range = (8, 17) if args.hard else (3, 9)
    eval_batches = [
        {k: jnp.asarray(v) for k, v in
         synth_batch(ecfg, 1, seed=90000 + i,
                     inst_range=eval_range).items() if k != "index"}
        for i in range(args.eval_objects)]

    def evaluate():
        mious, tmious = [], []
        for eb in eval_batches:
            out, merged, _, _ = eval_step(state.params, state.batch_stats, eb)
            merged, tpp = jax.device_get((merged, out.type_per_point))
            i_gt = np.asarray(eb["I_gt"])[0]
            t_gt = np.asarray(eb["T_gt"])[0]
            pred_t = np.argmax(tpp[0], -1)
            merged = np.asarray(merged).reshape(-1)   # [N] (batch-1 eval)
            mious.append(M.compute_miou(merged, i_gt))
            tmious.append(M.compute_type_miou_abc(pred_t, t_gt, merged, i_gt))
        return float(np.mean(mious)), float(np.mean(tmious))

    rng = jax.random.PRNGKey(args.seed + 1)
    t0 = time.time()
    log = open(args.out, "w")

    # fresh batch every step (the round-1 protocol that set the 0.94/1.00
    # baseline, docs/production_convergence_v2.log) — a small cached pool
    # measurably overfits: 16 batches round-robin plateaued held-out mIoU at
    # ~0.85 where fresh batches reach ~0.94.  Host-side generation + upload
    # overlaps device compute via the trainer's prefetch thread (a
    # synchronous jnp.asarray between dispatches stalls the tunnelled
    # dispatch pipeline — CLAUDE.md environment rules).
    from gcanet_tpu.train.trainer import prefetch_to_device

    def batch_gen():
        for step in range(args.steps):
            yield {k: v for k, v in
                   make_batch(cfg, args.seed * 100_000 + 1000 + step).items()
                   if k != "index"}

    batches = prefetch_to_device(batch_gen())
    for step in range(args.steps + 1):
        if step % args.eval_every == 0:
            miou, tmiou = evaluate()
            row = {"step": step, "miou": round(miou, 4),
                   "type_miou": round(tmiou, 4),
                   "t_min": round((time.time() - t0) / 60, 1)}
            print(json.dumps(row), flush=True)
            log.write(json.dumps(row) + "\n")
            log.flush()
        if step < args.steps:
            state, metrics = train_step(state, next(batches), rng)
    print("done")
    log.close()


if __name__ == "__main__":
    main()
