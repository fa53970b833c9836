"""PRNG implementation selection.

Dropout mask generation with JAX's default threefry2x32 costs ~11.6 ms of a
~110 ms b=128 pre-train step on v5e (measured, BENCH_NOTES.md): threefry is
a software counter-based generator that burns VPU cycles. XLA's native
RngBitGenerator ('rbg') produces the same-distribution masks at a fraction
of the cost (+12% end-to-end step throughput, same dropout rate/semantics —
only the specific pseudo-random stream differs, which training does not
depend on).

The impl is scoped to the KEY, not to the process: `fast_prng_key` returns
an rbg-typed key for the dropout stream while param init keeps the default
threefry (deterministic golden values; and a global
`jax.config.update("jax_default_prng_impl", ...)` would leak into every
other computation in the process — it broke test isolation once).

Opt out with DEMOVLP_PRNG=threefry (e.g. to reproduce a prior run's exact
masks).
"""
from __future__ import annotations

import os


def fast_prng_key(seed: int):
    """A PRNG key for throughput-critical streams (dropout masks): 'rbg'
    impl by default, the library default when DEMOVLP_PRNG opts out.

    Returns a TYPED key (jax.random.key): typed keys carry their impl in the
    dtype, so fold_in/split downstream keep the rbg stream. (A raw
    PRNGKey(..., impl='rbg') uint32 array loses the impl and is re-parsed
    under the global default — wrong shape, TypeError.)"""
    import jax

    impl = os.environ.get("DEMOVLP_PRNG", "rbg")
    if impl in ("", "default", "threefry"):
        return jax.random.PRNGKey(seed)
    return jax.random.key(seed, impl=impl)
