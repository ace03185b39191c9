"""Process-level JAX configuration for CLI / server / bench entry points."""
from __future__ import annotations

import os


def enable_persistent_cache(cache_dir: str | None = None) -> None:
    """Enable JAX's persistent compilation cache (first compile is 20-40s on
    TPU; cached compiles load in milliseconds)."""
    import jax

    cache_dir = cache_dir or os.environ.get(
        "NFAI_JAX_CACHE", os.path.expanduser("~/.cache/nfai_tpu/jax")
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
