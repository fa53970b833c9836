"""Frame sampling over linspace intervals (reference base/base_dataset.py:82-101).

Train: one random frame per interval; eval: the interval midpoint.

Deviation (documented): when an interval has width 1 the reference's
`random.choice(range(a, a))` raises and the whole SAMPLE is silently swapped
for a random other item (MSRVTT_dataset.py:152-157). We sample the single
available frame instead — same support, no silent data substitution.
"""
from __future__ import annotations

from typing import List

import numpy as np


def sample_frame_indices(
    num_segments: int,
    vlen: int,
    mode: str = "rand",
    rng: np.random.Generator | None = None,
    fix_start: int | None = None,
) -> List[int]:
    acc_samples = min(num_segments, vlen)
    intervals = np.linspace(start=0, stop=vlen, num=acc_samples + 1).astype(int)
    ranges = [
        (intervals[i], intervals[i + 1] - 1) for i in range(len(intervals) - 1)
    ]
    if mode == "rand":
        if rng is None:
            rng = np.random.default_rng()
        idxs = [
            int(rng.integers(lo, hi)) if hi > lo else int(lo) for lo, hi in ranges
        ]
        return sorted(idxs)
    if fix_start is not None:
        return [int(lo) + fix_start for lo, _ in ranges]
    if mode == "uniform":
        return [int((lo + hi) // 2) for lo, hi in ranges]
    raise NotImplementedError(mode)
