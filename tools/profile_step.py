import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# profiling driver: pairs with tools/parse_trace.py
import jax, jax.numpy as jnp
from gcanet_tpu.runtime_setup import enable_compilation_cache
from gcanet_tpu.train import step as step_lib

enable_compilation_cache()
# the shared bench workload (same GCA_BENCH_* knobs as bench.py/dump_hlo.py,
# incl. GCA_BENCH_FAMILY=scene / GCA_BENCH_SCENE_GRID / GCA_BENCH_SCENE_BF16)
from gcanet_tpu.config import bench_config
from gcanet_tpu.data.synthetic import synth_batch, synth_scene_batch

cfg = bench_config()
tx = step_lib.make_optimizer(cfg)
# honour GCA_BENCH_MESH so the trace describes the same program the bench
# measured (bench_config's contract)
mesh = step_lib.make_mesh(cfg)
family = os.environ.get("GCA_BENCH_FAMILY", "abc")
if family == "scene":
    from gcanet_tpu.models.softgroup_scene import SoftGroupNet
    from gcanet_tpu.train import scene_step

    model = SoftGroupNet(
        cfg, scene_grid=int(os.environ.get("GCA_BENCH_SCENE_GRID", "64")),
        compute_bf16=bool(int(os.environ.get("GCA_BENCH_SCENE_BF16", "0"))))
    state = scene_step.init_scene_state(cfg, model, tx, jax.random.PRNGKey(0))
    train_step = scene_step.make_scene_train_step(cfg, model, tx, mesh,
                                                  donate=True)
    raw = synth_scene_batch(cfg, cfg.batch_size, seed=0)
else:
    from gcanet_tpu.models.primitive_net import PrimitiveNet

    model = PrimitiveNet(cfg)
    state = step_lib.init_state(cfg, model, tx, jax.random.PRNGKey(0))
    train_step = step_lib.make_train_step(cfg, model, tx, mesh, donate=True)
    raw = synth_batch(cfg, cfg.batch_size, seed=0)
batch = {k: v for k, v in raw.items() if k != "index"}
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
