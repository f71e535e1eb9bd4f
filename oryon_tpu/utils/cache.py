"""Persistent XLA compilation cache (first full-model compile is minutes;
cached recompiles are seconds)."""
import os

import jax


def enable_compilation_cache(path: str = "/root/.cache/jax_comp_cache") -> None:
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
