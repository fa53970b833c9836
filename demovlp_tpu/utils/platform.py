"""Honor an explicit JAX_PLATFORMS request over a plugin-pinned jax.config.

A PJRT-plugin sitecustomize may call jax.config.update("jax_platforms", ...)
at interpreter start, which beats the JAX_PLATFORMS env var; an explicit
`JAX_PLATFORMS=cpu <entry point>` would then still try the plugin backend —
and hang the process when that backend is unreachable. Every entry point
(CLIs, scripts) calls pin_platform_from_env() before first backend use; a
no-op when the env is unset or agrees with the config. Same pattern as
tests/conftest.py.
"""
from __future__ import annotations

import os


def pin_platform_from_env() -> None:
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)
