"""Persistent XLA compilation cache (first TPU compile of the full model is
minutes; later processes reuse the serialized executable).

The cache directory is keyed by the *runtime* version (jax + jaxlib + the
backend's platform_version, i.e. the live libtpu build): a serialized AOT
executable must never be replayed against a different libtpu than the one
that compiled it — that exact mismatch ("client AOT libtpu has ... terminal
has ...") is a hard FAILED_PRECONDITION crash, not a graceful recompile. A
runtime upgrade therefore lands in a fresh, empty subdirectory and recompiles.

Kill switch: DEMOVLP_COMPILE_CACHE=0 disables the cache entirely (used by the
hermetic multi-chip dryrun, which must not read or write any cache state).
"""
from __future__ import annotations

import hashlib
import os


def _runtime_key() -> str:
    """Short digest of every version component that can invalidate a
    serialized executable."""
    parts = []
    try:
        import jax

        parts.append(jax.__version__)
    except Exception:
        pass
    try:
        import jaxlib

        parts.append(jaxlib.__version__)
    except Exception:
        pass
    try:
        # the live backend build string (for TPU this embeds the libtpu
        # build date/CL — the component that mismatched in MULTICHIP_r01)
        import jax

        parts.append(jax.extend.backend.get_backend().platform_version)
    except Exception:
        pass
    digest = hashlib.sha256("|".join(parts).encode()).hexdigest()[:12]
    return f"v-{digest}"


def enable_compile_cache(path: str | None = None) -> None:
    if os.environ.get("DEMOVLP_COMPILE_CACHE", "1") == "0":
        return
    import jax

    base = path or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache"
    )
    try:
        jax.config.update(
            "jax_compilation_cache_dir", os.path.join(base, _runtime_key())
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
