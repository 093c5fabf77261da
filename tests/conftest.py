import os

# Tests run on a virtual 8-device CPU mesh so sharding paths are exercised
# without TPU hardware (the driver separately dry-runs multichip).
# NOTE: the axon TPU plugin ignores JAX_PLATFORMS, so we use the config API.
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
