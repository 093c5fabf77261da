"""Headline benchmark: full train step (fwd+bwd+update) throughput on TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload: 8192-point ABC-like clouds (synthetic, same schema as the real
loader), full GCANet-class pipeline — encoder kNN + 3 edge convs, all heads,
offset module, gated grouping + CC + HAIS, proposal voxelisation, instance
U-Net, all losses, Adam update.  Metric is point clouds/sec/chip.

``vs_baseline``: the reference publishes no numbers (BASELINE.md); the
documented proxy is an estimated 5 clouds/s for the PyTorch reference
(batch 3 @ 7000 pts on an A100) — vs_baseline = ours / 5.0.
"""

import json
import os
import time

import jax
import jax.numpy as jnp

from gcanet_tpu.config import Config, GroupingConfig, InstanceHeadConfig
from gcanet_tpu.data.synthetic import synth_batch
from gcanet_tpu.models.primitive_net import PrimitiveNet
from gcanet_tpu.runtime_setup import enable_compilation_cache
from gcanet_tpu.train import step as step_lib

A100_REFERENCE_CLOUDS_PER_SEC = 5.0  # documented estimate, see BASELINE.md


def main():
    enable_compilation_cache()
    # batch 10 is the single-chip sweet spot (re-swept at max_proposals=100:
    # B=10 -> 16.0, B=12 -> 15.1 clouds/s, B=16 OOM; BASELINE.md round-2 log)
    batch = int(os.environ.get("GCA_BENCH_BATCH", "10"))
    n_pts = int(os.environ.get("GCA_BENCH_POINTS", "8192"))
    props = int(os.environ.get("GCA_BENCH_PROPOSALS", "0"))
    head = InstanceHeadConfig(max_proposals=props) if props \
        else InstanceHeadConfig()
    enc_bf16 = bool(int(os.environ.get("GCA_BENCH_ENC_BF16", "0")))
    nn_nb = int(os.environ.get("GCA_BENCH_NN", "0"))  # 0 = config default (48)
    cfg = Config(num_points=n_pts, batch_size=batch, max_instances=48,
                 encoder_bf16=enc_bf16, instance_head=head,
                 **({"nn_nb": nn_nb} if nn_nb else {}))
    model = PrimitiveNet(cfg)
    tx = step_lib.make_optimizer(cfg)
    state = step_lib.init_state(cfg, model, tx, jax.random.PRNGKey(0))
    train_step = step_lib.make_train_step(cfg, model, tx)

    batch = {k: jnp.asarray(v) for k, v in
             synth_batch(cfg, cfg.batch_size, seed=0).items() if k != "index"}

    rng = jax.random.PRNGKey(1)
    # compile + warmup (float() forces completion — the axon plugin's
    # block_until_ready returns without waiting)
    state, metrics = train_step(state, batch, rng)
    float(metrics["total_loss"])

    n_iters = 10
    t0 = time.perf_counter()
    for i in range(n_iters):
        # per-step key derives from state.step inside the jit; a host-side
        # split here would stall the tunnelled dispatch pipeline
        state, metrics = train_step(state, batch, rng)
    float(metrics["total_loss"])
    dt = time.perf_counter() - t0

    clouds_per_sec = cfg.batch_size * n_iters / dt
    print(json.dumps({
        "metric": "train_clouds_per_sec_per_chip_8k_pts",
        "value": round(clouds_per_sec, 3),
        "unit": "clouds/s",
        "vs_baseline": round(clouds_per_sec / A100_REFERENCE_CLOUDS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
