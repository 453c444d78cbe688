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
        # The Mosaic kernel payload (tpu.custom_call backend_config)
        # embeds trace-time source locations INCLUDING caller frames;
        # the outer strip-debuginfo canonicalization cannot reach inside
        # the serialized payload, so the persistent-cache key changed
        # with the call path (service vs executor vs test) and every
        # deployment re-ate the ~7 min Mosaic compile.  Limiting
        # locations to the primitive's own frame makes the payload -- and
        # the key -- call-path independent (measured: canonical IR
        # byte-identical across call paths with this off, differing at
        # the custom_call body with it on).
        jax.config.update("jax_include_full_tracebacks_in_locations", False)
    except Exception:
        pass
    _cache_enabled = True
