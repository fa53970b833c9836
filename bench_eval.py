"""Secondary benchmark: all-pairs local-similarity eval wall-clock.

The reference's eval hotspot (BASELINE.md): the O(N^2) local cross-attention
similarity matrix over the full val set, computed there as a serial host
loop of 8x8 blocks with a host round-trip per block (model/loss.py:73-103).
Here it's one jitted device computation (blockwise scan, shard_map over the
mesh). Default shapes: MSRVTT jsfusion eval — 1000 videos x 1000 captions,
240 regions x 99 words, d=256.

Prints one JSON line. Env: EVAL_N (1000), EVAL_SEGMENT (64),
EVAL_BACKEND (xla|pallas).
"""
from __future__ import annotations

import json
import os
import time

import numpy as np

from demovlp_tpu.utils.platform import pin_platform_from_env  # noqa: E402

pin_platform_from_env()


def main() -> None:
    import jax

    from demovlp_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    from demovlp_tpu.ops import xattn
    from demovlp_tpu.parallel import create_mesh, sharded_local_sims

    n = int(os.environ.get("EVAL_N", 1000))
    r, w, d = 240, 99, 256
    segment = int(os.environ.get("EVAL_SEGMENT", 64))
    backend = os.environ.get("EVAL_BACKEND", "auto")  # auto -> pallas on TPU
    xattn.set_backend(backend)

    rng = np.random.RandomState(0)
    img = rng.randn(n, r, d).astype(np.float32)
    lang = rng.randn(n, w, d).astype(np.float32)
    imask = ((rng.rand(n, r) > 0.2).astype(np.float32) - 1) * 100
    lmask = ((rng.rand(n, w) > 0.2).astype(np.float32) - 1) * 100

    mesh = create_mesh()
    # warmup/compile
    sims = sharded_local_sims(
        img, lang, imask, lmask, mesh, segment=segment, focal_type="equal"
    )
    assert np.isfinite(sims).all()
    t0 = time.perf_counter()
    sims = sharded_local_sims(
        img, lang, imask, lmask, mesh, segment=segment, focal_type="equal"
    )
    dt = time.perf_counter() - t0
    chunk = int(os.environ.get("DEMOVLP_EVAL_CHUNK", 4096))
    print(
        json.dumps(
            {
                "metric": "eval_local_sim_wallclock",
                "value": round(dt, 3),
                "unit": (
                    f"s for {n}x{n} gallery ({backend}, segment={segment}, "
                    f"chunk={min(n, chunk)})"
                ),
                "vs_baseline": 1.0,
            }
        )
    )


if __name__ == "__main__":
    main()
