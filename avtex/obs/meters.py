"""Wall-clock meters (reference: utils/utils.py:7-40, train.py:54-56)."""

from __future__ import annotations

import time


class AverageMeter:
    """Running average of a scalar (same contract as the reference's)."""

    def __init__(self) -> None:
        self.reset()

    def reset(self) -> None:
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1) -> None:
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)


class Timer:
    """Context-manager stopwatch; ``with Timer() as t: ...; t.elapsed``."""

    def __enter__(self) -> "Timer":
        self.start = time.perf_counter()
        self.elapsed = 0.0
        return self

    def __exit__(self, *exc) -> None:
        self.elapsed = time.perf_counter() - self.start
