import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# profiling driver: pairs with tools/parse_trace.py
import jax, jax.numpy as jnp
from gcanet_tpu.data.synthetic import synth_batch
from gcanet_tpu.models.primitive_net import PrimitiveNet
from gcanet_tpu.runtime_setup import enable_compilation_cache
from gcanet_tpu.train import step as step_lib

enable_compilation_cache()
# the shared bench workload (same GCA_BENCH_* knobs as bench.py/dump_hlo.py)
from gcanet_tpu.config import bench_config
cfg = bench_config()
model = PrimitiveNet(cfg)
tx = step_lib.make_optimizer(cfg)
state = step_lib.init_state(cfg, model, tx, jax.random.PRNGKey(0))
# honour GCA_BENCH_MESH so the trace describes the same program the bench
# measured (bench_config's contract)
mesh = step_lib.make_mesh(cfg)
train_step = step_lib.make_train_step(cfg, model, tx, mesh, donate=True)
batch = {k: v for k, v in synth_batch(cfg, cfg.batch_size, seed=0).items() if k != "index"}
rng = jax.random.PRNGKey(1)
if mesh is not None:
    state = step_lib.replicate_to_mesh(state, mesh)
    rng = step_lib.replicate_to_mesh(rng, mesh)
    batch = step_lib.make_global_batch(mesh, batch)
else:
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
state, metrics = train_step(state, batch, rng)
float(metrics["total_loss"])
# profile 3 steps
with jax.profiler.trace("/tmp/jax_trace"):  # parse with tools/parse_trace.py
    for i in range(3):
        state, metrics = train_step(state, batch, rng)
    float(metrics["total_loss"])
print("trace done")
