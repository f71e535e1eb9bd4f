"""Persistent XLA compilation cache (first full-model compile is minutes;
cached recompiles are seconds)."""
import os

import jax


def enable_compilation_cache(path: str = "/root/.cache/jax_comp_cache") -> None:
    # ORYON_JAX_CACHE_DIR overrides the default location; the empty string
    # DISABLES the persistent cache.  Tests disable it: reading back an
    # entry on the CPU backend segfaults deterministically inside
    # jax.compilation_cache.get_executable_and_time at the same suite
    # position even in a freshly created cache dir (observed twice
    # 2026-08-20, /tmp/pytest_full_r5b.log) — an upstream deserialization
    # bug, not stale corruption.  In-process jit caching makes the
    # persistent cache near-valueless for tests anyway.
    path = os.environ.get("ORYON_JAX_CACHE_DIR", path)
    if not path:
        return
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
