#!/usr/bin/env python
"""Export a gcanet_tpu orbax checkpoint as a reference torch checkpoint.

The reverse of tools/import_reference_ckpt.py: a model trained here can be
evaluated / served with the unmodified PyTorch reference stack — the output
is a ``checkpoint_eval{N}.tar``-format file that the reference's
``load_checkpoint`` (trainer_new.py:120-142) restores directly (same
``{epoch, model_state_dict, optimizer_state_dict}`` payload, same
``affinitynet.*`` keys at the reference storage layouts).

Usage:
  python tools/export_reference_ckpt.py --log_dir log/run1 \
      --out checkpoint_eval10.tar              # restores <log_dir>/checkpoint/latest
  python tools/export_reference_ckpt.py --log_dir log/run1 --tag max_miou \
      --out best.tar
  python tools/export_reference_ckpt.py --selftest   # synthetic round-trip
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log_dir", help="training workspace (holds checkpoint/)")
    ap.add_argument("--tag", default="latest",
                    help="checkpoint tag to export (latest, max_miou, evalN)")
    ap.add_argument("--out", default="checkpoint_export.tar")
    ap.add_argument("--num_points", type=int, default=8192)
    ap.add_argument("--num_primitives", type=int, default=7)
    ap.add_argument("--out_dim", type=int, default=64)
    ap.add_argument("--selftest", action="store_true",
                    help="import a synthetic reference state_dict, export it "
                         "back, and assert the round trip is bit-exact")
    args = ap.parse_args()

    from gcanet_tpu.runtime_setup import enable_compilation_cache

    enable_compilation_cache()          # applies GCA_PLATFORM (tools contract)
    import jax

    jax.config.update("jax_platforms", "cpu")   # conversion is host work

    import numpy as np

    from gcanet_tpu.config import Config
    from gcanet_tpu.models.primitive_net import PrimitiveNet
    from gcanet_tpu.train import step as step_lib
    from gcanet_tpu.utils import import_torch as it

    cfg = Config(num_points=64 if args.selftest else args.num_points,
                 batch_size=1, nn_nb=8 if args.selftest else 48,
                 num_primitives=args.num_primitives, out_dim=args.out_dim)
    model = PrimitiveNet(cfg)
    tx = step_lib.make_optimizer(cfg)
    state = step_lib.init_state(cfg, model, tx, jax.random.PRNGKey(0))

    if args.selftest:
        ref_sd = it.make_synthetic_state_dict(args.num_primitives, args.out_dim)
        params, batch_stats, _ = it.convert_state_dict(
            ref_sd, state.params, state.batch_stats, mode=cfg.mode)
        sd, report = it.export_state_dict(
            params, batch_stats, num_primitives=args.num_primitives,
            out_dim=args.out_dim)
        bad = [k for k in report.mapped
               if not np.array_equal(sd[k], np.asarray(ref_sd[k], np.float32))]
        assert not bad, f"round-trip mismatch: {bad[:5]}"
        assert not report.missing, report.missing
        print(f"selftest OK: {len(report.mapped)} tensors round-trip "
              f"bit-exact; {len(report.defaulted)} dead/counter keys at "
              f"neutral defaults")
        return

    if not args.log_dir:
        ap.error("--log_dir required (or --selftest)")
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(args.log_dir, "checkpoint", args.tag))
    with ocp.StandardCheckpointer() as ckptr:
        state = ckptr.restore(path, state)

    epoch = 0
    meta = os.path.join(args.log_dir, "checkpoint", "meta.json")
    if os.path.exists(meta):
        with open(meta) as f:
            epoch = int(json.load(f).get("epoch", 0))

    report = it.save_reference_checkpoint(
        args.out, state.params, state.batch_stats, epoch=epoch,
        num_primitives=args.num_primitives, out_dim=args.out_dim)
    print(f"wrote {args.out}: {len(report.mapped)} tensors "
          f"(epoch {epoch}); {len(report.defaulted)} dead/counter keys at "
          f"neutral defaults")
    if report.missing:
        print("WARNING flax params without a reference slot:")
        for k in report.missing:
            print(f"  {k}")


if __name__ == "__main__":
    main()
