"""Process-level JAX runtime setup: compilation cache + platform helpers."""

import os


def enable_compilation_cache(path: str = "/root/.cache/jax_comp_cache") -> None:
    """Persistent compilation cache — first full-model compile on the tunnelled
    TPU takes minutes; the cache makes subsequent runs near-instant.

    Also applies ``GCA_PLATFORM`` (e.g. ``cpu``) if set: the axon TPU plugin
    ignores ``JAX_PLATFORMS``, so this is the only env-level way to keep an
    entry point (train_new.py, bench.py, tools/*) off the TPU."""
    import jax

    plat = os.environ.get("GCA_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
    if plat == "cpu":
        # CPU runs must NOT use the persistent cache: XLA:CPU entries are AOT
        # artifacts keyed without the host's CPU features, and this repo moves
        # between heterogeneous hosts — reloading another machine's AOT result
        # warns "+prefer-no-scatter not supported ... could lead to SIGILL"
        # and has produced multi-minute loader stalls.  TPU executables are
        # host-independent, so the cache stays on for the tunnelled TPU.
        return
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def force_cpu() -> None:
    """The axon TPU plugin ignores JAX_PLATFORMS; use the config API instead."""
    import jax

    jax.config.update("jax_platforms", "cpu")
