"""Persistent XLA compilation cache (first TPU compile of the full model is
minutes; later processes reuse the serialized executable)."""
from __future__ import annotations

import os


def enable_compile_cache(path: str | None = None) -> None:
    import jax

    path = path or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache"
    )
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
