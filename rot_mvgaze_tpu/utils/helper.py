"""Streaming scalar statistics (capability parity:
/root/reference/utils/helper.py:8-26 — the reference's running-average
meter; this implementation additionally tracks min/max and uses a
numerically stable incremental mean, so very long runs don't accumulate
summation error)."""

from __future__ import annotations

import math
from dataclasses import dataclass, field


@dataclass
class StreamingStats:
    """Incrementally tracks mean / last / min / max of a scalar stream.

    The mean is updated as ``avg += n * (val - avg) / count`` (weighted
    Welford step) rather than by a running sum, which stays accurate over
    millions of updates.
    """

    val: float = 0.0
    avg: float = 0.0
    count: int = 0
    min: float = field(default=math.inf)
    max: float = field(default=-math.inf)

    def reset(self) -> None:
        self.val, self.avg, self.count = 0.0, 0.0, 0
        self.min, self.max = math.inf, -math.inf

    def update(self, val: float, n: int = 1) -> None:
        val = float(val)
        self.val = val
        self.count += n
        self.avg += n * (val - self.avg) / self.count
        if val < self.min:
            self.min = val
        if val > self.max:
            self.max = val

    @property
    def sum(self) -> float:
        return self.avg * self.count


# Name kept for reference familiarity (utils/helper.py:8 there).
AverageMeter = StreamingStats
