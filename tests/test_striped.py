"""Column-striped resident slot mode (round 4).

Past the VMEM-x envelope (n > V2_MAX_N) the windowed slot kernels pay an
nw*4 KB x-window DMA per tile (~236 ns at nw=8 vs ~29 resident,
formats/sell8d.py _TILE_NS_W); the striped plan slices the matrix into
bundle-aligned column stripes of <= V2_MAX_N columns, packs each as an
independent Sell8D with a COMPACTED output-block space, and runs the
resident kernel per stripe on x[lo:hi] (handle._make_bound).  Reference
parity target: the SELL fast path has no n limit
(src/src_spmv/sell_C_Sigma_spmv.c:249-352).
"""

import numpy as np
import pytest

from spmv_tpu.formats.sell8d import (MAX_SPILL_STRIPED, STRIPE_ALIGN,
                                     _V2_MAX_N, column_stripe_bounds,
                                     pack_sell8d_striped)
from spmv_tpu.io import generate
from spmv_tpu.oracle import spmv_golden
from spmv_tpu.types import CsrMatrix


def test_stripe_bounds_alignment_and_cover():
    for n in (2_000_001, 4_000_000, 9_999_999, 40_000_000):
        b = column_stripe_bounds(n)
        assert b[0][0] == 0 and b[-1][1] == n
        for (l0, h0), (l1, h1) in zip(b, b[1:]):
            assert h0 == l1
        for lo, hi in b:
            assert lo % STRIPE_ALIGN == 0
            assert hi - lo <= _V2_MAX_N
    assert column_stripe_bounds(1_000_000) == [(0, 1_000_000)]


def _striped_exec(a, x, stripes, rest, interpret=True):
    """Reference executor: resident kernel per stripe + block scatter-add
    + the straggler remainder — mirrors handle._make_bound."""
    import jax.numpy as jnp

    from spmv_tpu.ops.pallas_sell import build_sell8d_fn

    df = any(pk.value_mode in ("df", "df16", "palette_df")
             for _, _, _, pk in stripes)
    nsl = -(-a.m // 1024)
    out = jnp.zeros((nsl, 1024), jnp.float64 if df else jnp.float32)
    for lo, hi, vis, pk in stripes:
        f = build_sell8d_fn(pk, interpret=interpret)
        o = f(jnp.asarray(x[lo:hi]))
        out = out.at[jnp.asarray(vis)].add(o.reshape(-1, 1024))
    y = np.asarray(out.reshape(-1)[:a.m], dtype=np.float64)
    if rest is not None:
        rows, cols, vals = rest
        np.add.at(y, rows,
                  vals.astype(np.float64) * x[cols].astype(np.float64))
    return y


def test_striped_parity_f32():
    a = generate.random_uniform(20_000, 4_100_000, 12,
                                dtype=np.float32, seed=11)
    stripes, rest, pad = pack_sell8d_striped(a, max_pad_ratio=192.0, nw=8)
    assert len(stripes) == 3
    # compacted block spaces: every stripe's nslices <= global, ginfo
    # block ids are dense 0..nslices-1
    for lo, hi, vis, pk in stripes:
        gi = np.asarray(pk.ginfo)
        assert pk.nslices == len(vis)
        assert set(np.unique(gi >> 1)) == set(range(pk.nslices))
    x = np.random.default_rng(0).standard_normal(a.n).astype(np.float32)
    y = _striped_exec(a, x, stripes, rest)
    g = spmv_golden(a.astype(np.float64), x.astype(np.float64))
    assert np.abs(y - g).max() / max(np.abs(g).max(), 1) < 2e-5


def test_striped_parity_f64_df16():
    a32 = generate.random_uniform(12_000, 4_100_000, 10,
                                  dtype=np.float32, seed=12)
    rng = np.random.default_rng(1)
    a = CsrMatrix(a32.m, a32.n, a32.rowptr, a32.colidx,
                  rng.standard_normal(a32.nnz))
    stripes, rest, pad = pack_sell8d_striped(a, max_pad_ratio=192.0, nw=8)
    assert all(pk.value_mode in ("df", "df16", "palette_df")
               for _, _, _, pk in stripes)
    x = rng.standard_normal(a.n)
    y = _striped_exec(a, x, stripes, rest)
    g = spmv_golden(a, x)
    # interpret mode (XLA:CPU) simplifies the error-free transforms, so
    # assert f32-level accuracy here; the tight df16 bound is validated
    # on hardware (tests/test_sell8d.py::test_f64_double_float_slot_mode
    # has the same caveat)
    assert np.abs(y - g).max() / max(np.abs(g).max(), 1) < 2e-5


def test_striped_empty_stripe_skipped():
    # all columns in the middle stripe band empty: only 2 stripes emitted
    rng = np.random.default_rng(2)
    m, n = 8_000, 4_100_000
    bounds = column_stripe_bounds(n)
    lo1, hi1 = bounds[1]
    rows = np.repeat(np.arange(m), 4)
    cols = rng.integers(0, bounds[0][1], size=len(rows))
    half = len(rows) // 2
    cols[half:] = rng.integers(bounds[2][0], n, size=len(rows) - half)
    a = CsrMatrix.from_coo(m, n, rows, cols,
                           rng.standard_normal(len(rows))
                           .astype(np.float32))
    stripes, rest, pad = pack_sell8d_striped(a, max_pad_ratio=400.0, nw=8)
    assert len(stripes) == 2
    assert all(not (lo1 <= lo < hi1) for lo, hi, _, _ in stripes)
    x = rng.standard_normal(n).astype(np.float32)
    y = _striped_exec(a, x, stripes, rest)
    g = spmv_golden(a.astype(np.float64), x.astype(np.float64))
    assert np.abs(y - g).max() / max(np.abs(g).max(), 1) < 2e-5


def test_striped_compacts_untouched_slices():
    # round-4 advisor (medium): the touched-slice compaction was a no-op
    # because pack_sell8d padded every slice to >= g tiles, so each
    # stripe carried g zero tiles per UNTOUCHED slice.  Build a matrix
    # where the second stripe only touches the bottom row-slice: its pack
    # must drop the untouched slices entirely (nslices < ceil(m/1024))
    # and the vis scatter-add in the executor must reassemble exactly.
    rng = np.random.default_rng(3)
    m, n = 64_000, 4_100_000          # 63 row slices
    bounds = column_stripe_bounds(n)
    # stripe 0: all rows; stripe 1: only rows in the last slice
    r0 = np.repeat(np.arange(m), 2)
    c0 = rng.integers(0, bounds[0][1], size=len(r0))
    last = np.arange(m - 1024, m)
    r1 = np.repeat(last, 4)
    c1 = rng.integers(bounds[1][0], bounds[1][1], size=len(r1))
    rows = np.concatenate([r0, r1])
    cols = np.concatenate([c0, c1])
    a = CsrMatrix.from_coo(m, n, rows, cols,
                           rng.standard_normal(len(rows))
                           .astype(np.float32))
    stripes, rest, pad = pack_sell8d_striped(a, max_pad_ratio=400.0, nw=8)
    nsl_tot = -(-m // 1024)
    by_lo = {lo: (vis, pk) for lo, hi, vis, pk in stripes}
    vis1, pk1 = by_lo[bounds[1][0]]
    assert pk1.nslices < nsl_tot          # compaction engaged
    # the last 1024 rows straddle at most 2 of the 63 slices (m is not
    # slice-aligned)
    assert pk1.nslices == len(vis1) <= 2
    assert nsl_tot - 1 in vis1
    # stripe 0 touches every slice and stays dense
    vis0, pk0 = by_lo[0]
    assert pk0.nslices == nsl_tot
    x = rng.standard_normal(n).astype(np.float32)
    y = _striped_exec(a, x, stripes, rest)
    g = spmv_golden(a.astype(np.float64), x.astype(np.float64))
    assert np.abs(y - g).max() / max(np.abs(g).max(), 1) < 2e-5


def test_striped_rest_has_global_columns():
    a = generate.random_uniform(20_000, 4_100_000, 12,
                                dtype=np.float32, seed=13)
    stripes, rest, pad = pack_sell8d_striped(
        a, max_pad_ratio=192.0, nw=8, max_spill=MAX_SPILL_STRIPED)
    if rest is not None:
        assert rest[1].max() < a.n
        # stripes past the first must contribute globally-rebased ids
        kept = sum(pk.nnz_stored for _, _, _, pk in stripes)
        assert kept + len(rest[0]) == a.nnz


def test_handle_routes_striped(monkeypatch):
    import spmv_tpu.handle as handle_mod
    from spmv_tpu.handle import create_handle
    from spmv_tpu.types import Method

    monkeypatch.setattr(handle_mod, "_is_tpu", lambda: True)
    # dense enough that the realized pad (pairs floor + slot collisions)
    # clears the 32.0 allowance — d=12 at this shape floors at ~43
    a = generate.random_uniform(30_000, 4_100_000, 64,
                                dtype=np.float32, seed=14)
    h = create_handle(a, method=Method.SELL_C_SIGMA)
    assert "sell8d_stripes" in h.plan, list(h.plan)
    assert "striped" in repr(h)


def test_striped_gate_vetoes_on_overhead(monkeypatch):
    # round-4 advisor + VERDICT item 4: the striped-vs-windowed choice is
    # a COST decision, not unconditional.  With the per-exec stripe
    # overhead priced prohibitively, AUTO must take the windowed slot
    # pack for the same matrix it would otherwise stripe.
    import spmv_tpu.handle as handle_mod
    from spmv_tpu.formats import sell8d as sell8d_fmt
    from spmv_tpu.handle import create_handle
    from spmv_tpu.types import Method

    monkeypatch.setattr(handle_mod, "_is_tpu", lambda: True)
    a = generate.random_uniform(30_000, 4_100_000, 64,
                                dtype=np.float32, seed=30)
    h = create_handle(a, method=Method.SELL_C_SIGMA)
    assert "sell8d_stripes" in h.plan, list(h.plan)

    monkeypatch.setattr(sell8d_fmt, "stripe_overhead_ns",
                        lambda n: 1e12)
    h2 = create_handle(a, method=Method.SELL_C_SIGMA)
    assert "sell8d_stripes" not in h2.plan, list(h2.plan)
    assert "sell8d" in h2.plan           # windowed slot pack instead


def test_pad_gate_retries_shallow_cap():
    # uniform scatter at d=32: the auto cap chooser's economics pick a
    # deep cap whose pad busts tight budgets; the striped pack must fall
    # back to cap=1 + spill instead of raising (measured pad 33.1 vs 31.0)
    a = generate.random_uniform(40_000, 4_100_000, 32,
                                dtype=np.float32, seed=15)
    stripes, rest, pad = pack_sell8d_striped(a, max_pad_ratio=32.0, nw=8)
    assert pad <= 32.0
    with pytest.raises(ValueError):
        pack_sell8d_striped(a, max_pad_ratio=4.0, nw=8)
