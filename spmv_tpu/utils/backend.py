"""Backend probing that degrades instead of raising.

Round-2 post-mortem (VERDICT.md weak #1): the driver bench crashed with
``rc=1`` because a transient TPU-tunnel flake made ``jax.default_backend()``
raise ``RuntimeError`` inside ``_build_plan`` — an *optional* Pallas-routing
gate killed handle creation entirely.  Plan builders must treat "backend
unavailable" as "not a TPU" and fall through to the XLA plans (which a CPU
backend can still serve); the bench adds a bounded retry for first contact
so a 30-second flake doesn't forfeit the whole perf artifact.

Reference analog: the reference library has no device to lose, but its
harness survives per-method failures and still prints the CSV rows it has
(src/samples/test_spmv.c:62-156 — one method's error never aborts main).
"""

from __future__ import annotations

import time

__all__ = ["safe_default_backend", "is_tpu", "wait_for_backend"]


def safe_default_backend() -> str:
    """``jax.default_backend()`` that returns "none" instead of raising.

    ``RuntimeError`` is what xla_bridge raises when every requested platform
    fails to initialize (jax/_src/xla_bridge.py ``backends()``); any other
    exception is a real bug and propagates.
    """
    import jax
    try:
        return jax.default_backend()
    except RuntimeError:
        return "none"


def is_tpu() -> bool:
    """True iff a TPU backend is up — False on flake/absence, never raises."""
    return safe_default_backend() == "tpu"


def wait_for_backend(retries: int = 3, backoff: float = 30.0,
                     want: str = None, verbose: bool = False) -> str:
    """Bounded-retry first device contact; returns the backend name.

    Probes ``jax.default_backend()`` up to ``retries + 1`` times with
    ``backoff`` seconds between attempts (the tunnel's observed flake
    window).  Returns as soon as ANY backend initializes — even one that
    is not ``want`` (``want`` only labels the verbose log): xla_bridge
    caches a successful resolution, so further probes cannot change the
    answer.  Returns "none" when every attempt fails — callers degrade
    rather than crash.
    """
    import jax
    got = safe_default_backend()
    for attempt in range(retries):
        if got != "none":
            # only a FAILED init can be retried: once any backend is up,
            # xla_bridge caches the resolved answer and (deliberately —
            # live device arrays) we never clear it, so re-probing for
            # ``want`` would just burn retries·backoff re-reading the
            # cache (ADVICE round-3).
            return got
        if verbose:
            import sys
            print(f"[backend] got {got!r} (want {want!r}); retry "
                  f"{attempt + 1}/{retries} in {backoff:.0f}s",
                  file=sys.stderr, flush=True)
        time.sleep(backoff)
        # a failed init is cached by xla_bridge; clear it so the retry
        # actually re-contacts the device plugin (safe here: NO backend
        # initialized, so no live device arrays to invalidate)
        try:
            import jax.extend as jex
            jex.backend.clear_backends()
        except Exception:  # noqa: BLE001 — best-effort cache clear
            pass
        got = safe_default_backend()
    return got
