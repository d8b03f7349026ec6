"""Persistent XLA compilation cache.

First compiles are slow (tens of seconds on TPU, minutes for the full model
on CPU); enabling JAX's persistent cache makes every subsequent process reuse
them. Called by every CLI entry point and the bench harness.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> str:
    import jax

    cache_dir = path or os.environ.get(
        "MBT_JAX_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "mbt_tpu_jax"),
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    return cache_dir
