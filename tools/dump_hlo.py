"""Dump the compiled (post-optimization) HLO of the bench-config train step.

Pairs with tools/parse_trace.py: the trace reports device time per fusion
name (``fusion.51`` etc.); this dump is where those names resolve to real
ops/shapes.  Usage:

    python tools/dump_hlo.py                    # writes /tmp/train_step_hlo.txt
    python tools/dump_hlo.py fusion.51          # prints that computation only

Env knobs are the shared bench workload (gcanet_tpu.config.bench_config):
GCA_BENCH_BATCH / GCA_BENCH_POINTS / GCA_BENCH_PROPOSALS /
GCA_BENCH_ENC_BF16 / GCA_BENCH_NN / GCA_BENCH_MESH / GCA_BENCH_GROUP_VMAP.
"""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from gcanet_tpu.config import bench_config
    from gcanet_tpu.data.synthetic import synth_batch
    from gcanet_tpu.models.primitive_net import PrimitiveNet
    from gcanet_tpu.runtime_setup import enable_compilation_cache
    from gcanet_tpu.train import step as step_lib

    enable_compilation_cache()
    cfg = bench_config()
    model = PrimitiveNet(cfg)
    tx = step_lib.make_optimizer(cfg)
    state = step_lib.init_state(cfg, model, tx, jax.random.PRNGKey(0))
    # honour GCA_BENCH_MESH so the dump describes the same program the bench
    # measured (bench_config's contract)
    mesh = step_lib.make_mesh(cfg)
    train_step = step_lib.make_train_step(cfg, model, tx, mesh, donate=True)
    arrays = {k: v for k, v in
              synth_batch(cfg, cfg.batch_size, seed=0).items() if k != "index"}
    rng = jax.random.PRNGKey(1)
    if mesh is not None:
        state = step_lib.replicate_to_mesh(state, mesh)
        rng = step_lib.replicate_to_mesh(rng, mesh)
        arrays = step_lib.make_global_batch(mesh, arrays)
    else:
        arrays = {k: jnp.asarray(v) for k, v in arrays.items()}
    compiled = jax.jit(train_step).lower(state, arrays, rng).compile()
    text = compiled.as_text()

    out = "/tmp/train_step_hlo.txt"
    with open(out, "w") as f:
        f.write(text)
    print(f"wrote {out} ({len(text) / 1e6:.1f} MB)")

    if len(sys.argv) > 1:
        name = sys.argv[1]
        # print the named computation (fused_computation body) plus the
        # instruction that calls it
        for line in text.splitlines():
            if re.search(rf"\b{re.escape(name)}\b", line):
                print(line[:400])


if __name__ == "__main__":
    main()
