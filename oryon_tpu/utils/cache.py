"""Persistent XLA compilation cache (first full-model compile is minutes;
cached recompiles are seconds)."""
import os

import jax


def enable_compilation_cache(path: str = "/root/.cache/jax_comp_cache") -> None:
    # ORYON_JAX_CACHE_DIR overrides the default location.  Tests set it to a
    # separate directory: a killed run can leave a truncated entry, and a
    # later read of that entry segfaults in zstd inside
    # jax.compilation_cache.get_executable_and_time (observed 2026-08-20,
    # /tmp/pytest_r5_err.log) — isolating the CPU-test cache keeps such
    # corruption away from the device cache and makes it cheap to purge.
    path = os.environ.get("ORYON_JAX_CACHE_DIR", path)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
