"""Tracing / profiling utilities (survey §5.1).

The reference's only observability is unconditional stdout prints
(FUSION.cpp:297, 310-322; OccupancyGrid.hpp:317, 459-486).  Here:

* ``trace(dir)``    — context manager around ``jax.profiler`` producing a
                      Perfetto/XPlane trace of the device pipeline
                      (the ``--trace`` flag of the CLI).
* ``StageTimers``   — lightweight named wall-clock accumulators for host
                      pipeline stages (decode / device_put / step / export),
                      reported through ``FusionSession.metrics()``.
* ``annotate(name)``— ``jax.profiler.TraceAnnotation`` passthrough so host
                      stages show up on the trace timeline.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a device+host profiler trace into ``log_dir``."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Host-side trace annotation (no-op cost when not tracing)."""
    import jax
    return jax.profiler.TraceAnnotation(name)


class StageTimers:
    """Accumulating wall-clock timers keyed by stage name."""

    def __init__(self):
        self._total: Dict[str, float] = defaultdict(float)
        self._count: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.monotonic()
        try:
            yield
        finally:
            self._total[name] += time.monotonic() - t0
            self._count[name] += 1

    def report(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {
                "total_s": round(self._total[name], 6),
                "count": self._count[name],
                "mean_ms": round(1e3 * self._total[name]
                                 / max(self._count[name], 1), 3),
            }
            for name in sorted(self._total)
        }

    def reset(self) -> None:
        self._total.clear()
        self._count.clear()
