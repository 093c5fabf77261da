"""Process-level JAX runtime setup: compilation cache + platform helpers."""

import os


def enable_compilation_cache(path: str = "/root/.cache/jax_comp_cache") -> None:
    """Persistent compilation cache — first full-model compile on the tunnelled
    TPU takes minutes; the cache makes subsequent runs near-instant."""
    import jax

    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def force_cpu() -> None:
    """The axon TPU plugin ignores JAX_PLATFORMS; use the config API instead."""
    import jax

    jax.config.update("jax_platforms", "cpu")
