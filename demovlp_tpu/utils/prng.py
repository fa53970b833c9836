"""PRNG implementation selection.

Dropout mask generation with JAX's default threefry2x32 costs ~11.6 ms of a
~110 ms b=128 pre-train step on v5e (measured, BENCH_NOTES.md): threefry is
a software counter-based generator that burns VPU cycles. XLA's native
RngBitGenerator ('rbg') produces the same-distribution masks at a fraction
of the cost (+12% end-to-end step throughput, same dropout rate/semantics —
only the specific pseudo-random stream differs, which training does not
depend on).

Opt out with DEMOVLP_PRNG=threefry (e.g. to reproduce a prior run's exact
masks).
"""
from __future__ import annotations

import os


def use_fast_prng() -> None:
    """Switch the default PRNG impl to 'rbg' (call before any key creation).
    No-op if DEMOVLP_PRNG requests otherwise or the config is unavailable."""
    impl = os.environ.get("DEMOVLP_PRNG", "rbg")
    if impl in ("", "default", "threefry"):
        return
    try:
        import jax

        jax.config.update("jax_default_prng_impl", impl)
    except Exception:
        pass
