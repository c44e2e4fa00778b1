"""SELL-8D deep-slice (slot-mode) format + kernel tests.

The layout inverts SELL-8W's row↔lane assignment: slices of 1024 rows,
slot position = row, tiles stack in depth per (slice, window) pair — the
scattered-matrix tier (uniform/power-law light rows), where SELL-8W sits
at its (slice, window)-pairs pad floor (PERFNOTES.md tier-3 analysis).
The intended regime is LOW window occupancy (a few nnz per row per
1024-column window); dense windows belong to SELL-8W and are covered here
only by the gate tests.
"""

import numpy as np
import pytest

from spmv_tpu.formats.sell8d import (estimate_sell8d_auto,
                                     estimate_sell8d_tiles, pack_sell8d,
                                     Sell8D)
from spmv_tpu.formats.sell8w import WINDOW
from spmv_tpu.io import generate
from spmv_tpu.oracle import spmv_golden
from spmv_tpu.ops.pallas_sell import build_sell8d_fn
from spmv_tpu.types import CsrMatrix


def _golden_rest(rest, x, m):
    y = np.zeros(m, np.float64)
    if rest is not None:
        rows, cols, vals = rest
        np.add.at(y, rows, vals.astype(np.float64) * x[cols])
    return y


def _check(a, atol=2e-5, **kw):
    packed, rest = pack_sell8d(a, **kw)
    fn = build_sell8d_fn(packed, interpret=True)
    x = np.random.default_rng(5).standard_normal(a.n).astype(np.float32)
    y = np.asarray(fn(x)) + _golden_rest(rest, x, a.m)
    g = spmv_golden(a, x)
    assert np.abs(y - g).max() / max(np.abs(g).max(), 1e-30) < atol
    return packed, rest


def test_uniform_scattered():
    # ~0.9 nnz per row per window — the design-target occupancy
    a = generate.random_uniform(9000, 9000, 8, dtype=np.float32, seed=3)
    packed, _ = _check(a, max_pad_ratio=40.0, max_spill=0.05)
    assert packed.nslices == 9
    # deep-slice pad must beat the 8W pairs floor on uniform scatter
    from spmv_tpu.formats.sell8w import estimate_sell8w_tiles
    assert estimate_sell8d_tiles(a) < estimate_sell8w_tiles(a)


def test_powerlaw_light_rows():
    # power-law tail rows; a pinned depth cap spills the heavy heads (the
    # handle's hybrid routes those to SELL-8W / the straggler path)
    a = generate.power_law(8000, 8000, 10 * 8000, dtype=np.float32, seed=2)
    _check(a, max_pad_ratio=80.0, depth_cap=4, max_spill=0.8)


def test_rect():
    a = generate.random_uniform(2100, 900, 4, dtype=np.float32, seed=8)
    _check(a, max_pad_ratio=100.0, max_spill=0.05)


def test_values_bf16_and_f32():
    rng = np.random.default_rng(0)
    m = n = 4000
    a = generate.random_uniform(m, n, 5, dtype=np.float32, seed=4)
    # >64 distinct bf16-exact values → bf16 mode
    vals = (rng.integers(1, 5000, a.nnz) * 2.0 ** -3).astype(np.float32)
    a_bf = CsrMatrix(m, n, a.rowptr, a.colidx,
                     np.asarray(vals, dtype=np.float32))
    p, _ = _check(a_bf, max_pad_ratio=100.0, max_spill=0.05)
    assert p.value_mode in ("bf16", "f32")


def test_estimate_matches_pack():
    a = generate.random_uniform(9000, 9000, 7, dtype=np.float32, seed=1)
    tiles, cap, spilled = estimate_sell8d_auto(a)
    packed, rest = pack_sell8d(a, max_pad_ratio=100.0, max_spill=0.05)
    # the estimate is a LOWER bound (budget tiles); the pack adds per-slice
    # G-padding plus conflict-overflow depth levels (which on hostile
    # structure can exceed the budget substantially — the pad gate is the
    # real protection; this scattered seed stays close)
    assert packed.ntiles >= tiles
    assert packed.ntiles <= tiles * 1.3 + packed.nslices * packed.g


def test_depth_cap_pins_tiles():
    a = generate.random_uniform(5000, 5000, 8, dtype=np.float32, seed=6)
    p1, r1 = pack_sell8d(a, max_pad_ratio=100.0, depth_cap=1,
                         max_spill=1.0)
    pa, ra = pack_sell8d(a, max_pad_ratio=100.0, max_spill=0.05)
    assert p1.ntiles <= pa.ntiles
    # cap=1 keeps at most one nnz per (row, window) group
    x = np.ones(a.n, np.float32)
    fn = build_sell8d_fn(p1, interpret=True)
    y = np.asarray(fn(x)) + _golden_rest(r1, x, a.m)
    np.testing.assert_allclose(y, spmv_golden(a, x), rtol=1e-5)


def test_spill_gate_raises_on_capped_tail():
    # a pinned depth cap spills the rank tail; a tiny spill allowance must
    # raise, never corrupt.  (Conflict leftovers no longer spill — the
    # overflow phase absorbs them into fresh depth levels.)
    a = generate.random_uniform(3000, 3000, 12, dtype=np.float32, seed=3)
    with pytest.raises(ValueError):
        pack_sell8d(a, max_pad_ratio=100.0, depth_cap=1, max_spill=0.001)


def test_dense_windows_resolve_via_overflow():
    # dense-window occupancy floods the shared s-table; overflow levels
    # must absorb the conflicts exactly
    a = generate.random_uniform(3000, 3000, 12, dtype=np.float32, seed=3)
    _check(a, max_pad_ratio=100.0, max_spill=0.02)


def test_hostile_duplicate_cells():
    # many rows hitting the same (sublane, residue) cells with different
    # sub-rows forces conflicts; with an unbounded spill allowance the
    # result must still be exact
    rng = np.random.default_rng(7)
    m = n = 2048
    rows = np.repeat(np.arange(m), 4)
    cols = (rng.integers(0, 8, len(rows)) * 128
            + rng.integers(0, 4, len(rows))).astype(np.int64)
    order = np.lexsort((cols, rows))
    rows, cols = rows[order], cols[order]
    rowptr = np.zeros(m + 1, np.int64)
    np.add.at(rowptr, rows + 1, 1)
    np.cumsum(rowptr, out=rowptr)
    vals = rng.standard_normal(len(rows)).astype(np.float32)
    a = CsrMatrix(m, n, rowptr, cols, vals)
    _check(a, max_pad_ratio=600.0, max_spill=1.0)


def test_empty_slice_zeroed():
    # rows 1024..2047 entirely empty: their output block must still be
    # zero-initialized (per-slice min-G padding)
    m = n = 3072
    rows = np.concatenate([np.arange(1024), np.arange(2048, 3072)])
    rowptr = np.zeros(m + 1, np.int64)
    np.add.at(rowptr, rows + 1, 1)
    np.cumsum(rowptr, out=rowptr)
    cols = np.arange(2048) % n
    vals = np.ones(2048, np.float32)
    a = CsrMatrix(m, n, rowptr, cols.astype(np.int64), vals)
    packed, rest = pack_sell8d(a, max_pad_ratio=60.0)
    fn = build_sell8d_fn(packed, interpret=True)
    x = np.ones(n, np.float32)
    y = np.asarray(fn(x)) + _golden_rest(rest, x, m)
    assert np.abs(y[1024:2048]).max() == 0.0
    np.testing.assert_allclose(y, spmv_golden(a, x), rtol=1e-5)


def test_unsorted_columns():
    # colidx unsorted within rows: the rank/group machinery must fall back
    # to the sorted path and stay exact
    rng = np.random.default_rng(11)
    a = generate.random_uniform(3000, 3000, 5, dtype=np.float32, seed=9)
    rowptr = np.asarray(a.rowptr)
    colidx = np.asarray(a.colidx).copy()
    vals = np.asarray(a.vals).copy()
    for i in range(0, a.m, 7):       # shuffle a sample of rows
        s, e = rowptr[i], rowptr[i + 1]
        p = rng.permutation(e - s)
        colidx[s:e] = colidx[s:e][p]
        vals[s:e] = vals[s:e][p]
    b = CsrMatrix(a.m, a.n, rowptr, colidx, vals)
    _check(b, max_pad_ratio=100.0, max_spill=0.05)


def test_window_bundles_nw():
    # bundle widths: same numerics, monotonically fewer tiles on scatter
    a = generate.random_uniform(9000, 9000, 8, dtype=np.float32, seed=3)
    x = np.random.default_rng(5).standard_normal(a.n).astype(np.float32)
    g = spmv_golden(a, x)
    tiles = []
    for nw in (1, 2, 4, 8):
        p, r = pack_sell8d(a, max_pad_ratio=60.0, max_spill=0.10, nw=nw)
        fn = build_sell8d_fn(p, interpret=True)
        y = np.asarray(fn(x)) + _golden_rest(r, x, a.m)
        assert np.abs(y - g).max() / np.abs(g).max() < 2e-5
        tiles.append(p.ntiles)
    assert tiles[-1] <= tiles[0]


def test_nw_chooser():
    a = generate.random_uniform(9000, 9000, 8, dtype=np.float32, seed=3)
    tiles, cap, spilled, nw = estimate_sell8d_auto(a, nw=None)
    assert nw in (1, 2, 4, 8)
    assert tiles > 0


def test_density_split_hybrid():
    # powerlaw-ish mix: heavy window segments + scattered remainder; the
    # two packs must cover the matrix exactly
    from spmv_tpu.formats.sell8d import split_by_window_density
    a = generate.power_law(8000, 8000, 10 * 8000, dtype=np.float32, seed=2)
    dense, sparse, frac = split_by_window_density(a)
    assert dense is not None and sparse is not None
    assert dense.nnz + sparse.nnz == a.nnz
    assert 0.0 < frac < 1.0
    x = np.random.default_rng(5).standard_normal(a.n).astype(np.float32)
    g = spmv_golden(a, x)
    y = np.zeros(a.m, np.float64)
    # sparse side through 8D bundles (auto cap + chooser nw), dense side
    # through the golden (the handle packs it as SELL-8W; exactness of
    # that path has its own tests)
    _t, _c, _s, nw = estimate_sell8d_auto(sparse, nw=None)
    p, r = pack_sell8d(sparse, max_pad_ratio=200.0, max_spill=0.2, nw=nw)
    fn = build_sell8d_fn(p, interpret=True)
    y += np.asarray(fn(x))
    y += _golden_rest(r, x, a.m)
    y += spmv_golden(dense, x)
    assert np.abs(y - g).max() / np.abs(g).max() < 2e-5


def test_prepare_hybrid_fold_exact():
    # compact dense part + scatter-add fold must reproduce the golden
    from spmv_tpu.formats.sell8d import prepare_hybrid
    a = generate.power_law(8000, 8000, 10 * 8000, dtype=np.float32, seed=2)
    prep = prepare_hybrid(a)
    assert prep is not None
    assert prep.dense_sorted.nnz + prep.sparse.nnz == a.nnz
    assert prep.dense_sorted.m == len(prep.fold_rows)
    x = np.random.default_rng(5).standard_normal(a.n).astype(np.float32)
    y = np.zeros(a.m, np.float64)
    yd = spmv_golden(prep.dense_sorted, x)      # compact row space
    np.add.at(y, prep.fold_rows, yd)
    y += spmv_golden(prep.sparse, x)
    g = spmv_golden(a, x)
    assert np.abs(y - g).max() / np.abs(g).max() < 1e-6


def test_f64_double_float_slot_mode():
    # f64 input packs aligned hi/lo planes; interpret mode (XLA:CPU)
    # simplifies the error-free transforms, so assert structure + f32-level
    # accuracy here; the tight ≤1e-12 bound is validated on hardware
    # (baselines/validate_sell8d_onchip.py — PERFNOTES.md EFT caveat)
    a32 = generate.random_uniform(6000, 6000, 6, dtype=np.float32, seed=5)
    rng = np.random.default_rng(3)
    vals = rng.standard_normal(a32.nnz)          # f64, >64 distinct
    a = CsrMatrix(a32.m, a32.n, a32.rowptr, a32.colidx, vals)
    for nw in (1, 4):
        p, r = pack_sell8d(a, max_pad_ratio=100.0, max_spill=0.05, nw=nw)
        assert p.value_mode == "df16"
        assert p.vals_lo is not None and p.vals_lo.dtype == np.int16
        fn = build_sell8d_fn(p, interpret=True)
        x = rng.standard_normal(a.n)
        y = np.asarray(fn(x)).astype(np.float64)
        if r is not None:
            np.add.at(y, r[0], r[2] * x[r[1]])
        g = spmv_golden(a, x)
        assert np.abs(y - g).max() / np.abs(g).max() < 1e-5


def test_f64_palette_df():
    # few distinct f64 values → palette_df (hi/lo palettes share codes)
    a32 = generate.random_uniform(5000, 5000, 5, dtype=np.float32, seed=6)
    rng = np.random.default_rng(4)
    vals = (rng.integers(1, 8, a32.nnz) * (1.0 / 3.0))   # inexact in f32
    a = CsrMatrix(a32.m, a32.n, a32.rowptr, a32.colidx, vals)
    p, r = pack_sell8d(a, max_pad_ratio=100.0, max_spill=0.05, nw=2)
    assert p.value_mode == "palette_df"
    fn = build_sell8d_fn(p, interpret=True)
    x = rng.standard_normal(a.n)
    y = np.asarray(fn(x)).astype(np.float64)
    if r is not None:
        np.add.at(y, r[0], r[2] * x[r[1]])
    g = spmv_golden(a, x)
    assert np.abs(y - g).max() / np.abs(g).max() < 1e-5


def test_f64_shared_palette_and_forced_modes():
    # f64 packs must honor the shared palette (multi-shard contract) and
    # the forced-mode error contracts (second code-review round)
    a32 = generate.random_uniform(3000, 3000, 4, dtype=np.float32, seed=9)
    rng = np.random.default_rng(5)
    uniq = np.array([1.0 / 3.0, 2.0 / 3.0, 1.25])        # f32-inexact
    vals = uniq[rng.integers(0, 3, a32.nnz)]
    a = CsrMatrix(a32.m, a32.n, a32.rowptr, a32.colidx, vals)
    p, r = pack_sell8d(a, max_pad_ratio=100.0, max_spill=0.05,
                       palette_values=np.sort(uniq))
    assert p.value_mode == "palette_df"
    fn = build_sell8d_fn(p, interpret=True)
    x = rng.standard_normal(a.n)
    y = np.asarray(fn(x)).astype(np.float64)
    y += _golden_rest(r, x, a.m)
    g = spmv_golden(a, x)
    assert np.abs(y - g).max() / np.abs(g).max() < 1e-5
    # values outside the shared palette must raise, not mis-code
    with pytest.raises(ValueError):
        pack_sell8d(a, max_pad_ratio=100.0,
                    palette_values=np.sort(uniq)[:2])
    # f32-only modes are incompatible with f64 input
    with pytest.raises(ValueError):
        pack_sell8d(a, max_pad_ratio=100.0, force_value_mode="bf16")
    # forced palette_df with too many distinct values must raise
    many = CsrMatrix(a32.m, a32.n, a32.rowptr, a32.colidx,
                     rng.standard_normal(a32.nnz))
    with pytest.raises(ValueError):
        pack_sell8d(many, max_pad_ratio=100.0,
                    force_value_mode="palette_df")
    # forced df must use the value stream even when a palette would fit
    p2, _ = pack_sell8d(a, max_pad_ratio=100.0, max_spill=0.05,
                        force_value_mode="df")
    assert p2.value_mode == "df" and p2.vals_lo is not None


def test_pair_level_spill_drops_isolated_singles():
    """Round 4: a (slice, bundle) pair whose whole payload is cheaper as
    XLA stragglers than as tiles must spill entirely, budgeted within
    max_spill; reconstruction stays exact.  At the CALIBRATED prices
    (28 ns/straggler end-to-end vs 20-29 ns resident tiles) the rule
    only fires where tiles genuinely cost more — the windowed-DMA
    regime (n > 2M: 47-236 ns/tile), exactly where isolated links
    otherwise pay a whole 4 KB x-window DMA for 1 nonzero."""
    rng = np.random.default_rng(11)
    m, n = 40_000, 2_500_000
    # local band (good slot structure) + isolated far singles
    rows_l = np.repeat(np.arange(m, dtype=np.int64), 3)
    cols_l = np.clip(rows_l * 60 + rng.integers(-256, 257,
                                                size=len(rows_l)),
                     0, n - 1)
    rows_s = np.sort(rng.choice(m, 1500, replace=False)).astype(np.int64)
    cols_s = rng.integers(0, n, 1500)       # scattered: ~1 nnz per pair
    a = CsrMatrix.from_coo(
        m, n, np.concatenate([rows_l, rows_s]),
        np.concatenate([cols_l, cols_s]),
        rng.standard_normal(len(rows_l) + 1500).astype(np.float32))
    p, rest = pack_sell8d(a, max_pad_ratio=100.0, nw=1, max_spill=0.02)
    assert rest is not None and len(rest[0]) >= 1200  # singles spilled
    # without the rule the 1500 isolated windowed tiles would add ~12 pad
    assert p.pad_ratio <= 78.0, p.pad_ratio   # no-rule would be ~89
    fn = build_sell8d_fn(p, interpret=True)
    x = rng.standard_normal(a.n).astype(np.float32)
    y = np.asarray(fn(x)).astype(np.float64)
    np.add.at(y, rest[0], (rest[2] * x[rest[1]]).astype(np.float64))
    g = spmv_golden(a, x)
    assert np.abs(y - g).max() / np.abs(g).max() < 2e-5
    # native and Python packs agree on the rule (same budget semantics)
    pp, restp = pack_sell8d(a, max_pad_ratio=100.0, nw=1, max_spill=0.02,
                            use_native=False)
    assert restp is not None and len(restp[0]) >= 1200


def test_pair_spill_set_unit():
    from spmv_tpu.formats.sell8d import _pair_spill_set
    pairs = np.array([5, 9, 17], dtype=np.int64)
    dcap = np.array([1, 3, 1], dtype=np.int64)
    kept = np.array([1, 3000, 2], dtype=np.int64)
    # the single wins (1·15 < 1·20); kept=2 at d=1 costs 30 > 20 and the
    # dense pair costs 45000 — neither spills
    out = _pair_spill_set(pairs, dcap, kept, 20.0, 15.0, budget=100)
    assert out is not None and set(out) == {5}
    # zero budget disables the rule entirely
    assert _pair_spill_set(pairs, dcap, kept, 20.0, 15.0, 0) is None
    # at tile_ns=40 the kept=2 pair qualifies too, but a 1-nnz budget
    # only admits the best-win prefix (pair 5: win 25 vs pair 17: 10)
    out = _pair_spill_set(pairs, dcap, kept, 40.0, 15.0, budget=1)
    assert out is not None and set(out) == {5}


def test_auto_g_cost_model():
    """g="auto" picks the step/tile-cost-optimal grouping and stays
    reconstruction-exact (probe_webbase_r4e: the fixed-g heuristic cost
    webbase 0.13 ms/exec — ~75 ns/step vs ~g/2 pad tiles per slice)."""
    from spmv_tpu.formats.sell8d import _choose_g, _STEP_NS, _TILE_NS

    # many tiles per slice → step cost dominates → large g
    assert _choose_g(np.full(10, 300, np.int64), _TILE_NS[2], False) == 32
    # windowed kernels cap at 16
    assert _choose_g(np.full(10, 300, np.int64), _TILE_NS[2], True) == 16
    # few tiles per slice → padding dominates → small g
    assert _choose_g(np.full(4000, 3, np.int64), _TILE_NS[2], False) == 8

    rng = np.random.default_rng(5)
    a = generate.webbase_like(60_000, 60_000, 200_000, dtype=np.float32,
                              seed=3, spread=256)
    pa, ra = pack_sell8d(a, max_pad_ratio=1e9, nw=2, g="auto",
                         max_spill=0.3)
    pn, rn = pack_sell8d(a, max_pad_ratio=1e9, nw=2, g="auto",
                         max_spill=0.3, use_native=False)
    assert pa.g == pn.g and pa.g in (8, 16, 32)
    assert pa.nsteps == pa.ntiles // pa.g
    # grid invariant: each step's tiles stay within one output slice
    sg = pa.ginfo >> 1
    assert len(sg) == pa.nsteps
    fn = build_sell8d_fn(pa, interpret=True)
    x = rng.standard_normal(a.n).astype(np.float32)
    y = np.asarray(fn(x)).astype(np.float64)
    if ra is not None:
        np.add.at(y, np.asarray(ra[0]),
                  (np.asarray(ra[2]) * x[np.asarray(ra[1])])
                  .astype(np.float64))
    g = spmv_golden(a, x)
    assert np.abs(y - g).max() / max(np.abs(g).max(), 1e-30) < 2e-5


def test_split_offpalette():
    """Palette-with-exceptions: duplicate-summed exact values regain
    palette mode by moving the rare distinct values to the rest stream
    (webbase heavy part: 429 distinct values, 1,433 exception nnz)."""
    from spmv_tpu.formats.sell8w import split_offpalette, value_palette

    a = generate.webbase_like(60_000, 60_000, 200_000, dtype=np.float32,
                              seed=3, spread=256)
    assert value_palette(np.asarray(a.vals)) is None  # the summed tail
    am, off = split_offpalette(a)
    assert off is not None and 0 < len(off[0]) <= 0.01 * a.nnz
    assert value_palette(np.asarray(am.vals)) is not None
    x = np.random.default_rng(0).standard_normal(a.n)
    y = spmv_golden(am, x.astype(np.float32)).astype(np.float64)
    np.add.at(y, np.asarray(off[0], np.int64),
              np.asarray(off[2], np.float64) * x[np.asarray(off[1])])
    g = spmv_golden(a, x.astype(np.float32))
    assert np.abs(y - g).max() / np.abs(g).max() < 1e-6

    # already-palettable values: no split
    small = CsrMatrix.from_coo(
        100, 100, np.arange(100, dtype=np.int64),
        np.arange(100, dtype=np.int64),
        np.full(100, 0.5, dtype=np.float32))
    am2, off2 = split_offpalette(small)
    assert off2 is None and am2 is small
