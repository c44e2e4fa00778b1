"""Profiling / tracing hooks (reference: gettimeofday pairs + CSV,
test_spmv.c:89-127; TPU equivalent: jax.profiler traces + the same metrics).
"""

from __future__ import annotations

import contextlib
import time

__all__ = ["trace", "Stopwatch"]


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto.

    NOTE: through the axon tunnel the device-side trace may be unavailable;
    host-side events still record.  For kernel-level timing prefer the
    honest protocol in bench/timing.py.
    """
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Stopwatch:
    """Reference-style paired wall timers (test_spmv.c:89-124)."""

    def __init__(self):
        self.laps = {}

    @contextlib.contextmanager
    def lap(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.laps[name] = self.laps.get(name, 0.0) + \
                (time.perf_counter() - t0)

    def report(self) -> str:
        return ", ".join(f"{k}={v*1e3:.2f}ms" for k, v in self.laps.items())
