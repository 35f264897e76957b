"""Platform setup helpers: persistent compilation cache, device info.

Full-model TPU compiles go through a remote compile service and take
minutes; every CLI process used to pay that again. The persistent
compilation cache makes the second invocation of any CLI (same shapes)
start in seconds.
"""

from __future__ import annotations

import os


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    """Turn on JAX's persistent compilation cache (idempotent)."""
    import jax

    cache_dir = cache_dir or os.environ.get(
        "MMTG_COMPILATION_CACHE", os.path.expanduser("~/.cache/mmtg_jax_cache")
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
