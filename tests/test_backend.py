"""Backend-flake degradation (VERDICT round-2 weak #1).

Round 2's driver bench died rc=1 because a transient TPU-tunnel failure made
``jax.default_backend()`` raise inside ``_build_plan``.  These tests pin the
contract: a backend-init failure degrades Pallas routing to the XLA plans,
it never kills handle creation; and the bench's first-contact retry loop
actually retries.
"""

import numpy as np
import pytest

import jax

from spmv_tpu import create_handle, spmv, Method
from spmv_tpu.io import generate
from spmv_tpu.oracle import spmv_golden
from spmv_tpu.utils.backend import (safe_default_backend, is_tpu,
                                    wait_for_backend)


def _boom():
    raise RuntimeError("Unable to initialize backend 'axon': UNAVAILABLE")


def test_safe_default_backend_normal():
    assert safe_default_backend() == "cpu"   # conftest pins cpu
    assert is_tpu() is False


def test_safe_default_backend_degrades(monkeypatch):
    monkeypatch.setattr(jax, "default_backend", _boom)
    assert safe_default_backend() == "none"
    assert is_tpu() is False


def test_handle_creation_survives_backend_flake(monkeypatch):
    """The round-2 crash scenario: every Pallas gate probe raises.  The
    handle must fall through to an XLA plan and produce correct results
    (reference analog: one method's failure never aborts the harness,
    test_spmv.c:62-156)."""
    monkeypatch.setattr(jax, "default_backend", _boom)
    a = generate.random_uniform(300, 300, 8, seed=3, dtype=np.float32)
    x = generate.make_x(a.n, dtype=np.float32, kind="normal", seed=1)
    for method in (Method.SELL_C_SIGMA, Method.CSR5, Method.DIA,
                   Method.AUTO):
        try:
            h = create_handle(a, method=method)
        except ValueError:
            continue            # DIA may be legitimately unprofitable
        y = np.asarray(spmv(h, x))
        np.testing.assert_allclose(y, spmv_golden(a, x), rtol=1e-5,
                                   atol=1e-5)


def test_wait_for_backend_retries(monkeypatch):
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("UNAVAILABLE")
        return "tpu"

    monkeypatch.setattr(jax, "default_backend", flaky)
    got = wait_for_backend(retries=3, backoff=0.0, want="tpu")
    assert got == "tpu"
    assert calls["n"] == 3


def test_wait_for_backend_gives_up(monkeypatch):
    monkeypatch.setattr(jax, "default_backend", _boom)
    assert wait_for_backend(retries=2, backoff=0.0, want="tpu") == "none"


def test_wait_for_backend_accepts_other_backend(monkeypatch):
    # want="tpu" but only cpu comes up: returns "cpu" after retries (the
    # bench then runs the XLA plans rather than crashing)
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    assert wait_for_backend(retries=1, backoff=0.0, want="tpu") == "cpu"
