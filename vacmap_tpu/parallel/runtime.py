"""JAX runtime knobs shared by CLI, tests, and bench."""

from __future__ import annotations

import os

_cache_enabled = False


def enable_compilation_cache(path: str | None = None) -> None:
    """Persistent XLA compilation cache: the chaining/alignment kernels
    compile once per (variant, bucket) shape; caching across processes
    removes the cold-start cost for workers and repeated runs."""
    global _cache_enabled
    if _cache_enabled:
        return
    import jax

    cache_dir = path or os.environ.get(
        "VACMAP_TPU_CACHE", os.path.expanduser("~/.cache/vacmap_tpu_xla")
    )
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
    _cache_enabled = True
