import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# profiling driver: pairs with tools/parse_trace.py
import jax, jax.numpy as jnp
from gcanet_tpu.config import Config
from gcanet_tpu.data.synthetic import synth_batch
from gcanet_tpu.models.primitive_net import PrimitiveNet
from gcanet_tpu.runtime_setup import enable_compilation_cache
from gcanet_tpu.train import step as step_lib

enable_compilation_cache()
# knobs mirror bench.py so profiles match the bench config
from gcanet_tpu.config import InstanceHeadConfig
_props = int(os.environ.get("GCA_BENCH_PROPOSALS", "0"))
cfg = Config(num_points=int(os.environ.get("GCA_BENCH_POINTS", "8192")),
             batch_size=int(os.environ.get("GCA_BENCH_BATCH", "8")),
             max_instances=48,
             encoder_bf16=bool(int(os.environ.get("GCA_BENCH_ENC_BF16", "0"))),
             instance_head=InstanceHeadConfig(max_proposals=_props)
             if _props else InstanceHeadConfig())
model = PrimitiveNet(cfg)
tx = step_lib.make_optimizer(cfg)
state = step_lib.init_state(cfg, model, tx, jax.random.PRNGKey(0))
train_step = step_lib.make_train_step(cfg, model, tx)
batch = {k: jnp.asarray(v) for k, v in synth_batch(cfg, cfg.batch_size, seed=0).items() if k != "index"}
rng = jax.random.PRNGKey(1)
state, metrics = train_step(state, batch, rng)
float(metrics["total_loss"])
# profile 3 steps
with jax.profiler.trace("/tmp/jax_trace"):  # parse with tools/parse_trace.py
    for i in range(3):
        state, metrics = train_step(state, batch, rng)
    float(metrics["total_loss"])
print("trace done")
