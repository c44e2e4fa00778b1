"""tune(): full candidate coverage + the mtx_token winner cache
(reference partition-cache spirit, HyperGraphInterface.cpp:22-57)."""

import numpy as np

from spmv_tpu.io import generate
from spmv_tpu.inspector import tune
from spmv_tpu.oracle import spmv_golden


def test_tune_default_candidates_cover_all_plans():
    import inspect
    from spmv_tpu.types import Method
    src = inspect.getsource(tune)
    for m in ("CSR5", "BALANCED2", "SELL_C_SIGMA", "DIA", "BCSR",
              "BALANCED", "SERIAL"):
        assert f"Method.{m}" in src, f"{m} missing from tune defaults"


def test_tune_picks_winner_and_caches(tmp_path, monkeypatch):
    monkeypatch.setenv("SPMV_TPU_CACHE", str(tmp_path))
    a = generate.random_uniform(2000, 2000, 8, dtype=np.float32, seed=1)
    x = np.random.default_rng(0).standard_normal(a.n).astype(np.float32)
    h, results = tune(a, iters=2, repeats=1, x=x, mtx_token="t1")
    assert any(np.isfinite(v) for v in results.values())
    y = np.asarray(h(x))
    np.testing.assert_allclose(y, spmv_golden(a, x), rtol=1e-4, atol=1e-4)
    # second call: cache hit — no sweep (the timing helper is never used)
    import spmv_tpu.bench.timing as timing_mod

    def boom(*_a, **_k):
        raise AssertionError("cache miss: tune swept again")

    monkeypatch.setattr(timing_mod, "time_spmv_chain", boom)
    h2, results2 = tune(a, iters=2, repeats=1, x=x, mtx_token="t1")
    assert h2.method == h.method
    y2 = np.asarray(h2(x))
    np.testing.assert_allclose(y2, spmv_golden(a, x), rtol=1e-4, atol=1e-4)


def test_tune_budget_skips_tail(tmp_path, monkeypatch):
    # round-4 advisor: the sweep had no budget/early-stop knob.  A zero
    # budget must still produce a winner (best-so-far) and mark the
    # remaining candidates inf-skipped.
    from spmv_tpu.inspector import tune
    from spmv_tpu.io import generate

    a = generate.random_uniform(512, 512, 6, dtype=np.float32, seed=3)
    x = np.random.default_rng(0).standard_normal(a.n).astype(np.float32)
    h, results = tune(a, iters=2, repeats=1, x=x, budget_s=0.0)
    assert h is not None
    finite = [v for v in results.values() if v != float("inf")]
    # exactly one candidate measured before the budget gate engaged
    assert len(finite) == 1
    skipped = [v for v in results.values() if v == float("inf")]
    assert skipped, results
    y = np.asarray(h(x))
    np.testing.assert_allclose(y, spmv_golden(a, x), rtol=1e-4, atol=1e-4)
