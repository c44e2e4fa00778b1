"""Windowed-DMA slot-mode (8D) and double-float v2w kernels — the
n > V2_MAX_N extensions (VERDICT round-2 items 1/3).

Interpret-mode correctness; df cases assert structure + f32-level accuracy
only (XLA:CPU simplifies the error-free transforms — PERFNOTES.md EFT
caveat; the tight bound is validated on hardware).
"""

import numpy as np
import pytest

from spmv_tpu.types import CsrMatrix
from spmv_tpu.io import generate
from spmv_tpu.oracle import spmv_golden
from spmv_tpu.formats.sell8w import pack_sell8w, plan_v2
from spmv_tpu.formats.sell8d import pack_sell8d, _V2_MAX_N
from spmv_tpu.ops.pallas_sell import (build_sell8d_fn, build_sell8w_v2w_fn,
                                      V2_MAX_N)


def test_constant_mirror():
    assert _V2_MAX_N == V2_MAX_N


def _wide(n=2_500_000, m=4096, nnz_per_row=6, seed=4, dtype=np.float32):
    """Sparse matrix with n past the VMEM-resident-x envelope."""
    return generate.random_uniform(m, n, nnz_per_row, dtype=dtype,
                                   seed=seed)


@pytest.mark.parametrize("nw", [1, 2])
def test_slot_v2w_f32(nw):
    a = _wide()
    assert a.n > V2_MAX_N
    p, rest = pack_sell8d(a, max_pad_ratio=1e9, max_spill=0.3, nw=nw)
    fn = build_sell8d_fn(p, interpret=True)
    x = generate.make_x(a.n, np.float32, kind="normal", seed=2)
    y = np.asarray(fn(x), dtype=np.float64)
    if rest is not None:
        np.add.at(y, np.asarray(rest[0]),
                  np.asarray(rest[2], dtype=np.float64)
                  * x[np.asarray(rest[1])].astype(np.float64))
    g = spmv_golden(a.astype(np.float64), x.astype(np.float64))
    nz = np.abs(g).max()
    assert np.abs(y - g).max() / nz < 2e-5


@pytest.mark.parametrize("nw", [1, 2])
def test_slot_v2w_df(nw):
    a32 = _wide(seed=5)
    rng = np.random.default_rng(1)
    a = CsrMatrix(a32.m, a32.n, a32.rowptr, a32.colidx,
                  rng.standard_normal(a32.nnz))      # f64, >64 distinct
    p, rest = pack_sell8d(a, max_pad_ratio=1e9, max_spill=0.3, nw=nw)
    assert p.value_mode in ("df", "df16", "palette_df")
    fn = build_sell8d_fn(p, interpret=True)
    x = rng.standard_normal(a.n)
    y = np.asarray(fn(x))
    assert y.dtype == np.float64
    if rest is not None:
        np.add.at(y, np.asarray(rest[0]),
                  np.asarray(rest[2]) * x[np.asarray(rest[1])])
    g = spmv_golden(a, x)
    assert np.abs(y - g).max() / np.abs(g).max() < 2e-5


def test_row_v2w_df():
    # f64 row mode past VMEM residency: pack twice (hi, lo), windowed DMA
    a32 = generate.clustered(3000, 2_500_000, 9, spread=400,
                             dtype=np.float32, seed=6)
    rng = np.random.default_rng(2)
    vals = rng.standard_normal(a32.nnz)
    a = CsrMatrix(a32.m, a32.n, a32.rowptr, a32.colidx, vals)
    hi = pack_sell8w(a, max_pad_ratio=1e9)
    hi_back = np.asarray(a.vals.astype(np.float32), dtype=np.float64)
    lo = pack_sell8w(CsrMatrix(a.m, a.n, a.rowptr, a.colidx,
                               (a.vals - hi_back).astype(np.float32)))
    v2 = plan_v2(hi, lo_tiles=lo.vals)
    assert v2.value_mode in ("df", "df16", "palette_df")
    fn = build_sell8w_v2w_fn(v2, interpret=True)
    x = rng.standard_normal(a.n)
    y = np.asarray(fn(x))
    assert y.dtype == np.float64
    g = spmv_golden(a, x)
    assert np.abs(y - g).max() / np.abs(g).max() < 2e-5


def test_handle_routes_f64_large_n(monkeypatch):
    # the round-2 gap: f64 with n > 2M must now land on a Pallas plan
    # (plan build only; kernel math covered above)
    import spmv_tpu.handle as handle_mod
    monkeypatch.setattr(handle_mod, "_is_tpu", lambda: True)
    # window-local columns so the 8W pad gate passes at this scale (rows
    # of one 128-row slice must share x-windows: m large enough that a
    # slice spans ~1-2 windows)
    a32 = generate.clustered(300_000, 2_500_000, 9, spread=200,
                             dtype=np.float32, seed=6)
    rng = np.random.default_rng(2)
    a = CsrMatrix(a32.m, a32.n, a32.rowptr, a32.colidx,
                  rng.standard_normal(a32.nnz))
    from spmv_tpu.handle import create_handle
    from spmv_tpu.types import Method
    h = create_handle(a, method=Method.SELL_C_SIGMA)
    assert any(k in h.plan for k in ("sell8w_v2w", "sell8d",
                                     "sell8d_stripes", "hybrid")), \
        list(h.plan)


def test_csr5_f64_lands_on_pallas_plan(monkeypatch):
    """Method.CSR5 + f64 must ride the SELL-8D/hybrid df tier, not the
    XLA gather-floor scan — the reference's CSR5 is double-ONLY
    (src/src_spmv/csr5_spmv.cpp:16-37), so the explicit f64 request is
    exactly its home turf (VERDICT round-3 weak #5)."""
    import spmv_tpu.handle as handle_mod
    monkeypatch.setattr(handle_mod, "_is_tpu", lambda: True)
    a32 = generate.random_uniform(20_000, 20_000, 12, dtype=np.float32,
                                  seed=8)
    rng = np.random.default_rng(3)
    a = CsrMatrix(a32.m, a32.n, a32.rowptr, a32.colidx,
                  rng.standard_normal(a32.nnz))
    from spmv_tpu.handle import create_handle
    from spmv_tpu.types import Method
    h = create_handle(a, method=Method.CSR5)
    assert any(k in h.plan for k in ("sell8d", "sell8w_v2", "hybrid")), \
        list(h.plan)
    vm = h.plan.get("value_mode")
    if vm is None and "hybrid" in h.plan:
        vm = h.plan["hybrid"][1].get("value_mode")
    assert vm in ("df", "df16", "palette_df"), vm


def test_hybrid_df_fold_by_x_extension(monkeypatch):
    """f64 hybrid folds its dense output BY X-EXTENSION (round 4): the
    light plan carries 1.0-valued entries at (fold_rows[j], n + j) and
    the executor appends yh.f64 + yl.f64 (exact — both f32 planes) to x.
    No standalone fold kernel (~300 ns/grid-step), no m-length f64
    scatter (~0.9 ms) — handle.py _append_fold_entries."""
    import jax.numpy as jnp

    import spmv_tpu.handle as handle_mod
    from spmv_tpu.handle import create_handle
    from spmv_tpu.types import Method
    from spmv_tpu.ops.pallas_sell import build_sell8w_v2_fn, build_sell8d_fn

    monkeypatch.setattr(handle_mod, "_is_tpu", lambda: True)
    a32 = generate.power_law(30_000, 30_000, 20 * 30_000,
                             dtype=np.float32, seed=3)
    rng = np.random.default_rng(5)
    a = CsrMatrix(a32.m, a32.n, a32.rowptr, a32.colidx,
                  rng.standard_normal(a32.nnz))
    h = create_handle(a, method=Method.SELL_C_SIGMA)
    assert "hybrid" in h.plan, list(h.plan)
    pd, psp = h.plan["hybrid"]
    assert pd.get("fold_planes_ext"), list(pd)
    k = len(np.asarray(pd["fold_rows"]))
    # the light plan's column space includes the k fold columns
    assert psp["sell8d"].n == a.n + k

    # full hybrid df path (interpret executors) vs golden
    f1p = build_sell8w_v2_fn(pd["sell8w_v2"], planes=True,
                             interpret=True)
    f2i = build_sell8d_fn(psp["sell8d"], interpret=True)
    x = rng.standard_normal(a.n)
    yh, yl = f1p(jnp.asarray(x))
    x2 = np.concatenate([x, np.asarray(yh, dtype=np.float64)
                         + np.asarray(yl, dtype=np.float64)])
    x2j = jnp.asarray(x2)
    y = np.asarray(f2i(x2j), dtype=np.float64)
    if "rest_rows" in psp:
        rr = np.asarray(psp["rest_rows"])
        rc = np.asarray(psp["rest_cols"])
        rv = np.asarray(psp["rest_vals"])
        np.add.at(y, rr, rv * x2[rc])
    g = spmv_golden(a, x)
    scale = max(np.abs(g).max(), 1.0)
    # interpret mode simplifies the EFT chain — f32-level bound here,
    # the tight df bound is checked on hardware (probe_r4_fixes)
    np.testing.assert_allclose(y / scale, g / scale, atol=3e-6)


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_slot_chunked_execution(monkeypatch, dtype):
    """Tile streams past the SMEM scalar-prefetch budget split into
    block-range chunks whose partials add back exactly (the 437k-tile
    compile crash, baselines/validate_scattered4m_onchip)."""
    import spmv_tpu.ops.pallas_sell as ps

    a32 = generate.random_uniform(40_000, 8_192, 10, dtype=np.float32,
                                  seed=9)
    if dtype is np.float64:
        rng = np.random.default_rng(3)
        a = CsrMatrix(a32.m, a32.n, a32.rowptr, a32.colidx,
                      rng.standard_normal(a32.nnz))
    else:
        a = a32
    p, rest = pack_sell8d(a, max_pad_ratio=1e9, max_spill=0.3, nw=2)
    assert rest is None or len(rest[0]) < 0.3 * a.nnz
    # force ~4 chunks
    monkeypatch.setattr(ps, "_MAX_PREFETCH_INT32",
                        max((p.nsteps // 4) * (p.g + 1), p.g + 1))
    fn = build_sell8d_fn(p, interpret=True)
    assert ps._slot_chunks(np.asarray(p.ginfo), p.g) is not None
    x = generate.make_x(a.n, a.dtype, kind="normal", seed=2)
    y = np.asarray(fn(x), dtype=np.float64)
    if rest is not None:
        np.add.at(y, np.asarray(rest[0]),
                  np.asarray(rest[2], dtype=np.float64)
                  * np.asarray(x, dtype=np.float64)[np.asarray(rest[1])])
    g = spmv_golden(a.astype(np.float64), x.astype(np.float64))
    scale = max(np.abs(g).max(), 1.0)
    np.testing.assert_allclose(y / scale, g / scale, atol=3e-6)
