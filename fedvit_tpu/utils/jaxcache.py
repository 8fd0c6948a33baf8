"""Persistent XLA compilation cache.

The axon TPU tunnel compiles remotely and slowly (~2 min for the cvseg
pipeline, ~40 s for a ViT-B train step). Enabling JAX's persistent cache
makes every recompile of an unchanged program a disk hit. Call this at every
entry point (bench, CLIs, graft entry) before the first jit execution.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    cache_dir = path or os.environ.get(
        "FEDVIT_JAX_CACHE", os.path.expanduser("~/.cache/fedvit_jax"))
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass  # older/newer jax without these knobs — cache is best-effort
