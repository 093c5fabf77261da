#!/usr/bin/env python
"""Convert a reference torch checkpoint (.tar) into an orbax checkpoint dir.

Reference format: ``torch.save({epoch, model_state_dict, optimizer_state_dict})``
(trainer_new.py:420-445, loaded at :120-142).  Output: a checkpoint directory
our Trainer restores from (``<out>/latest`` + ``meta.json``), holding a fresh
TrainState whose params/batch_stats carry the converted weights (optimizer
state starts fresh — the reference optimizers are not transferable).

Usage:
  python tools/import_reference_ckpt.py checkpoint_eval10.tar --out log/imported
  python tools/import_reference_ckpt.py --selftest       # synthetic round-trip
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint", nargs="?", help="reference .tar checkpoint")
    ap.add_argument("--out", default="log/imported_ckpt")
    ap.add_argument("--num_points", type=int, default=8192)
    ap.add_argument("--num_primitives", type=int, default=7)
    ap.add_argument("--out_dim", type=int, default=64)
    ap.add_argument("--cpu", action="store_true",
                    help="run the conversion on CPU (no TPU init)")
    ap.add_argument("--selftest", action="store_true",
                    help="convert a synthetic reference state_dict and run a "
                         "forward pass with the result")
    args = ap.parse_args()

    from gcanet_tpu.runtime_setup import enable_compilation_cache

    enable_compilation_cache()          # applies GCA_PLATFORM (tools contract)
    import jax

    if args.cpu or args.selftest:
        jax.config.update("jax_platforms", "cpu")

    from gcanet_tpu.config import Config
    from gcanet_tpu.models.primitive_net import PrimitiveNet
    from gcanet_tpu.train import step as step_lib
    from gcanet_tpu.utils.import_torch import (convert_state_dict,
                                               make_synthetic_state_dict)

    if args.selftest:
        state_dict = make_synthetic_state_dict(args.num_primitives, args.out_dim)
        epoch = 3
        cfg = Config(num_points=256, batch_size=1, nn_nb=16,
                     num_primitives=args.num_primitives, out_dim=args.out_dim)
    else:
        if not args.checkpoint:
            ap.error("checkpoint path required (or --selftest)")
        import torch

        payload = torch.load(args.checkpoint, map_location="cpu",
                             weights_only=False)
        state_dict = {k: v.numpy() for k, v in
                      payload["model_state_dict"].items()}
        epoch = int(payload.get("epoch", 0))
        cfg = Config(num_points=args.num_points, batch_size=1,
                     num_primitives=args.num_primitives, out_dim=args.out_dim)

    model = PrimitiveNet(cfg)
    tx = step_lib.make_optimizer(cfg)
    state = step_lib.init_state(cfg, model, tx, jax.random.PRNGKey(0))
    params, batch_stats, report = convert_state_dict(
        state_dict, state.params, state.batch_stats, mode=cfg.mode)

    print(f"mapped {len(report.mapped)} reference tensors; "
          f"skipped {len(report.skipped)} dead/duplicate keys")
    if report.unmatched:
        print("UNMATCHED reference keys (not converted):")
        for k in report.unmatched:
            print(f"  {k}")
    if report.missing:
        print(f"flax params not covered by the checkpoint "
              f"({len(report.missing)}; keep template init):")
        for k in report.missing:
            print(f"  {k}")

    state = state._replace(params=params, batch_stats=batch_stats)

    if args.selftest:
        import jax.numpy as jnp

        rng = jax.random.PRNGKey(0)
        xyz = jax.random.uniform(rng, (1, cfg.num_points, 3))
        nrm = jax.random.normal(rng, (1, cfg.num_points, 3))
        nrm = nrm / jnp.linalg.norm(nrm, axis=-1, keepdims=True)
        out = model.apply({"params": state.params,
                           "batch_stats": state.batch_stats},
                          xyz, nrm, train=False, rng=rng)
        print(f"selftest forward ok: type_per_point {out.type_per_point.shape}, "
              f"offsets {out.pt_offsets.shape}")
        assert not report.unmatched, report.unmatched
        return

    import orbax.checkpoint as ocp

    out_dir = os.path.abspath(args.out)
    os.makedirs(out_dir, exist_ok=True)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.join(out_dir, "latest"), state, force=True)
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump({"epoch": epoch, "metrics": {},
                   "imported_from": os.path.abspath(args.checkpoint)}, f)
    print(f"wrote {out_dir}/latest (epoch {epoch}); evaluate with:\n"
          f"  python train_new.py --eval --checkpoint_path {out_dir}")


if __name__ == "__main__":
    main()
