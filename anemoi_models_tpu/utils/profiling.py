"""Profiling/observability helpers.

The reference has no tracing at all (SURVEY.md §5 — loggers only); here the
framework owns it: xplane traces via ``jax.profiler`` plus a simple step
timer with throughput accounting.
"""

from __future__ import annotations

import contextlib
import logging
import time
from typing import Iterator, Optional

import jax

LOGGER = logging.getLogger(__name__)

__all__ = ["trace", "StepTimer", "annotate"]


@contextlib.contextmanager
def trace(log_dir: str, enabled: bool = True) -> Iterator[None]:
    """Capture an xplane trace (view with TensorBoard / xprof)."""
    if not enabled:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region visible in profiler timelines."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Wall-clock step timer with items/s reporting.

    Usage::

        timer = StepTimer(items_per_step=grid_points)
        for batch in data:
            with timer:
                state, loss = step(state, batch)
        print(timer.summary())
    """

    def __init__(self, items_per_step: Optional[int] = None, warmup: int = 1) -> None:
        self.items_per_step = items_per_step
        self.warmup = warmup
        self.times: list[float] = []
        self._t0: Optional[float] = None

    def __enter__(self) -> "StepTimer":
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc) -> None:
        self.times.append(time.perf_counter() - self._t0)

    @property
    def steady_times(self) -> list[float]:
        return self.times[self.warmup:] if len(self.times) > self.warmup else self.times

    def mean_step_s(self) -> float:
        ts = self.steady_times
        return sum(ts) / max(len(ts), 1)

    def items_per_s(self) -> Optional[float]:
        if self.items_per_step is None:
            return None
        mean = self.mean_step_s()
        return self.items_per_step / mean if mean > 0 else None

    def summary(self) -> str:
        msg = f"steps={len(self.times)} mean={self.mean_step_s() * 1e3:.2f}ms"
        ips = self.items_per_s()
        if ips is not None:
            msg += f" items/s={ips:,.0f}"
        return msg
