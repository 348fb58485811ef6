"""Tracing / profiling hooks.

The reference has none (SURVEY.md §5: only a torchsummary param table at
startup, /root/reference/trainer.py:51). Here:

- :func:`trace` — context manager capturing a ``jax.profiler`` trace
  (viewable in TensorBoard / Perfetto) around any code region.
- :class:`StepTimer` — wall-clock step timing with ``block_until_ready``
  fencing and a running images/sec estimate.
- :func:`device_memory_stats` — live HBM usage of the addressable devices.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Dict, Iterator, Optional

import jax

from rot_mvgaze_tpu.utils.helper import AverageMeter


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a profiler trace of the enclosed region into ``log_dir``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Times jitted steps (fencing async dispatch) and tracks throughput."""

    def __init__(self, items_per_step: int = 0) -> None:
        self.items_per_step = items_per_step
        self.meter = AverageMeter()
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, result: Any = None) -> float:
        if result is not None:
            jax.block_until_ready(result)
        elif not getattr(self, "_warned_no_fence", False):
            # without a result to fence, JAX's async dispatch means this
            # records ENQUEUE time (microseconds), not step time — warn
            # once instead of silently reporting inflated throughput
            import warnings

            warnings.warn(
                "StepTimer.stop() called without a result to fence; with "
                "async dispatch the recorded time excludes device "
                "execution. Pass the step's output (or any array it "
                "produced) to measure real step time.",
                stacklevel=2,
            )
            self._warned_no_fence = True
        assert self._t0 is not None, "stop() without start()"
        dt = time.perf_counter() - self._t0
        self._t0 = None
        self.meter.update(dt)
        return dt

    @property
    def avg_step_seconds(self) -> float:
        return self.meter.avg

    @property
    def items_per_second(self) -> float:
        return self.items_per_step / self.meter.avg if self.meter.avg else 0.0


def device_memory_stats() -> Dict[str, Dict[str, int]]:
    """Per-device live memory stats (bytes), where the backend reports them."""
    out: Dict[str, Dict[str, int]] = {}
    for d in jax.local_devices():
        try:
            stats = d.memory_stats()
        except (AttributeError, NotImplementedError):
            stats = None
        if stats:
            out[str(d)] = {
                "bytes_in_use": int(stats.get("bytes_in_use", 0)),
                "peak_bytes_in_use": int(stats.get("peak_bytes_in_use", 0)),
                "bytes_limit": int(stats.get("bytes_limit", 0)),
            }
    return out
