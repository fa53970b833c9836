#!/usr/bin/env python
"""Microbench: xattn fwd / fwd+bwd at the training shape, XLA vs Pallas.

Env: XB_NI (128), XB_NC (128), XB_R (30), XB_W (99), XB_D (256),
XB_STEPS (20), XB_FOCAL (equal).
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

from demovlp_tpu.utils.platform import pin_platform_from_env  # noqa: E402

pin_platform_from_env()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from demovlp_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    from demovlp_tpu.ops.xattn import _xattn_score_xla
    from demovlp_tpu.ops.pallas_xattn import xattn_score_pallas

    ni = int(os.environ.get("XB_NI", 128))
    nc = int(os.environ.get("XB_NC", 128))
    r = int(os.environ.get("XB_R", 30))
    w = int(os.environ.get("XB_W", 99))
    d = int(os.environ.get("XB_D", 256))
    steps = int(os.environ.get("XB_STEPS", 20))
    focal = os.environ.get("XB_FOCAL", "equal")

    rng = np.random.RandomState(0)
    img = jnp.array(rng.randn(ni, r, d).astype(np.float32))
    lang = jnp.array(rng.randn(nc, w, d).astype(np.float32))
    imask = jnp.array(((rng.rand(ni, r) > 0.2).astype(np.float32) - 1) * 100)
    lmask = jnp.zeros((nc, w), jnp.float32)
    gw = jnp.array(rng.randn(ni, nc).astype(np.float32))

    def run(tag, fn):
        out = fn(img, lang)
        np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fn(img, lang)
        np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        ms = (time.perf_counter() - t0) / steps * 1e3
        print(f"{tag:28s} {ms:8.3f} ms")
        return ms

    for name, score in (("xla", _xattn_score_xla), ("pallas", xattn_score_pallas)):
        fwd = jax.jit(lambda im, la, s=score: s(im, la, imask, lmask, 20.0, focal))
        run(f"{name} fwd", fwd)
        g = jax.jit(jax.grad(
            lambda im, la, s=score: jnp.sum(s(im, la, imask, lmask, 20.0, focal) * gw),
            argnums=(0, 1),
        ))
        run(f"{name} fwd+bwd", g)


if __name__ == "__main__":
    main()
