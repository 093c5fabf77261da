"""No gcanet_tpu import may initialise the jax backend.

A module-level jnp constant (e.g. the old ``_BIG_I = jnp.int32(2**30)`` in
ops/grouping.py) commits jax to a platform at import time — before any entry
point can apply ``GCA_PLATFORM`` / ``jax.config.update("jax_platforms", ...)``.
On this environment that means silently landing on the tunnelled TPU (and
hanging forever when the relay is dead).  Entry points rely on import-then-pin
ordering, so importing the framework must stay side-effect-free.
"""

import subprocess
import sys

_PROBE = """
import sys
import {mod}
from jax._src import xla_bridge
sys.exit(1 if xla_bridge._backends else 0)
"""

# superset imports: trainer pulls in model/ops/losses/data; scene_trainer the
# scene family; serve the inference stack; config/bench wiring via bench_config
MODULES = [
    "gcanet_tpu.train.trainer",
    "gcanet_tpu.train.scene_trainer",
    "gcanet_tpu.serve",
]


def test_imports_do_not_initialise_backend():
    for mod in MODULES:
        r = subprocess.run(
            [sys.executable, "-c", _PROBE.format(mod=mod)],
            capture_output=True, text=True, timeout=600)
        assert r.returncode == 0, (
            f"importing {mod} initialised the jax backend "
            f"(stderr: {r.stderr[-500:]})")
