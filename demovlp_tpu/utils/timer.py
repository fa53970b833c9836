"""Wall-clock timer (reference utils/util.py:243-254)."""
from __future__ import annotations

import time


class Timer:
    def __init__(self):
        self.cache = time.time()

    def check(self) -> float:
        now = time.time()
        duration = now - self.cache
        self.cache = now
        return duration

    def reset(self) -> None:
        self.cache = time.time()
