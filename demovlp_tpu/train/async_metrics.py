"""One-step-delayed host fetch of per-step training metrics.

The train loops accumulate/log scalar metrics every step. Fetching a device
scalar (``float(m["loss"])``) blocks the host until that step finishes, so a
same-step fetch serializes host work (next batch's tokenize / MLM masking /
H2D transfer) with device compute — the device idles while the host prepares
the next batch. The reference has the same structure (``loss.item()`` every
step, trainer/trainer_dist.py:163-171) and pays the same stall on GPU.

``DeferredMetrics`` restores the pipeline: the loop *pushes* step ``i``'s
device metrics and the consumer runs on step ``i-1``'s — by then step ``i``
is already enqueued on the device, so the host blocks only on a computation
that completes while ``i`` executes, then preps batch ``i+1`` under step
``i``. Totals are identical; console/writer lines lag one step.
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Tuple


class DeferredMetrics:
    """Queue with exactly one in-flight entry.

    ``push(metrics, *ctx)`` hands over step ``i``'s device metrics plus any
    loop context (dl_idx, batch_idx, ...) and invokes ``consume`` on the
    previously pushed entry. ``flush()`` drains the final entry after the
    loop (forgetting it would drop the last step's contribution).
    """

    def __init__(self, consume: Callable[..., None]):
        self._consume = consume
        self._pending: Optional[Tuple[Any, tuple]] = None

    def push(self, metrics: Any, *ctx: Any) -> None:
        prev = self._pending
        self._pending = (metrics, ctx)
        if prev is not None:
            self._consume(prev[0], *prev[1])

    def flush(self) -> None:
        prev, self._pending = self._pending, None
        if prev is not None:
            self._consume(prev[0], *prev[1])
