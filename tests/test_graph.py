"""Graph tier: hub-column split + heavy-row COO2 + light SELL-8D.

The web-graph regime (formats/graph.py): ultra-sparse power-law rows with
crawl locality and popular hub columns — the matrix family where every
single-format plan's pad estimate explodes (PERFNOTES.md tier table).
Reference analog: the structural problem METIS reordering solves at
OPT_LEVEL=3 (HyperGraphInterface.cpp:59-147).
"""

import numpy as np
import pytest

from spmv_tpu.types import CsrMatrix
from spmv_tpu.io import generate
from spmv_tpu.oracle import spmv_golden
from spmv_tpu.formats.graph import prepare_graph_split
from spmv_tpu.formats.sell8d import pack_sell8d
from spmv_tpu.formats.sell8w import pack_sell8w, split_stragglers
from spmv_tpu.ops.pallas_sell import build_sell8d_fn, build_sell8w_v2_fn


def _web(m=20_000, nnz=60_000, seed=11):
    return generate.webbase_like(m, m, nnz, dtype=np.float32, seed=seed,
                                 spread=256)


def test_prepare_decomposition_exact():
    a = _web()
    prep = prepare_graph_split(a)
    assert prep is not None
    assert prep.hub_cols is not None and len(prep.hub_cols) > 0
    assert prep.n_ext == a.n + len(prep.hub_cols)
    nnz_parts = prep.light.nnz + (prep.heavy.nnz if prep.heavy else 0)
    assert nnz_parts == a.nnz
    # golden through the decomposition: x_ext = [x, x[hub]] feeds the
    # remapped parts; heavy output folds back by fold_rows
    x = np.random.default_rng(5).standard_normal(a.n).astype(np.float32)
    x_ext = np.concatenate([x, x[prep.hub_cols]])
    y = spmv_golden(prep.light, x_ext)
    if prep.heavy is not None:
        np.add.at(y, prep.fold_rows, spmv_golden(prep.heavy, x_ext))
    g = spmv_golden(a, x)
    assert np.abs(y - g).max() / np.abs(g).max() < 1e-6


def test_graph_estimate_beats_plain():
    # the split's whole reason to exist: plain 8D pad explodes, the graph
    # split stays bounded (measured 105 → ~13 at 1M rows)
    from spmv_tpu.formats.sell8d import estimate_sell8d_auto
    from spmv_tpu.formats.sell8w import WINDOW
    a = _web()
    t_plain, _c, _s, _w = estimate_sell8d_auto(a, nw=None)
    prep = prepare_graph_split(a)
    assert prep is not None
    assert prep.tiles < 0.6 * t_plain
    assert prep.pad_ratio(a.nnz) < 48.0


def test_graph_exec_interpret():
    # full composite through the real kernels in interpret mode
    a = _web(m=12_000, nnz=36_000)
    prep = prepare_graph_split(a)
    assert prep is not None and prep.heavy is not None
    packed, rest = pack_sell8d(prep.light, max_pad_ratio=200.0,
                               max_spill=0.2, nw=prep.nw)
    light_fn = build_sell8d_fn(packed, interpret=True)
    hm2, hrest, hfrac = split_stragglers(prep.heavy)
    hm = hm2 if hrest is not None else prep.heavy
    pw = pack_sell8w(hm, max_pad_ratio=500.0)
    heavy_fn = build_sell8w_v2_fn(pw, interpret=True)
    x = np.random.default_rng(7).standard_normal(a.n).astype(np.float32)
    import jax.numpy as jnp
    x_ext = jnp.concatenate([jnp.asarray(x), jnp.asarray(x)[
        jnp.asarray(prep.hub_cols.astype(np.int32))]])
    y = np.asarray(light_fn(x_ext), dtype=np.float64)
    if rest is not None:
        rows_r, cols_r, vals_r = rest
        np.add.at(y, np.asarray(rows_r),
                  np.asarray(vals_r, dtype=np.float64)
                  * np.asarray(x_ext)[np.asarray(cols_r)])
    yh = np.asarray(heavy_fn(x_ext), dtype=np.float64)
    if hrest is not None:
        np.add.at(yh, np.asarray(hrest[0]),
                  np.asarray(hrest[2], dtype=np.float64)
                  * np.asarray(x_ext)[np.asarray(hrest[1])])
    np.add.at(y, prep.fold_rows, yh)
    g = spmv_golden(a, x)
    assert np.abs(y - g).max() / np.abs(g).max() < 2e-5


def test_fold_kernel_matches_scatter():
    # the large-fold path packs F (y[fold[i]] += yh[i]) as a binary
    # near-diagonal SELL-8W; it must equal the scatter-add exactly
    m, m2 = 4096, 900
    rng = np.random.default_rng(3)
    fold = np.sort(rng.choice(m, size=m2, replace=True)).astype(np.int64)
    yh = rng.standard_normal(m2).astype(np.float32)
    f_mat = CsrMatrix.from_coo(m, m2, fold, np.arange(m2, dtype=np.int64),
                               np.ones(m2, dtype=np.float32),
                               sum_duplicates=False)
    packed_f = pack_sell8w(f_mat, max_pad_ratio=1e9)
    fn = build_sell8w_v2_fn(packed_f, interpret=True)
    got = np.asarray(fn(yh))
    want = np.zeros(m, np.float32)
    np.add.at(want, fold, yh)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_no_hubs_no_heavy_returns_none():
    # a plain banded matrix has neither hubs nor heavy rows — the graph
    # split must bow out instead of degenerating into a copy of the 8D plan
    a = generate.banded(3000, 3000, 2, dtype=np.float32)
    assert prepare_graph_split(a) is None


def test_auto_routes_to_graph_plan(monkeypatch):
    # simulate the TPU gate: AUTO on a webbase-shaped matrix must land on
    # the graph plan (plan BUILD only — kernels execute on hardware;
    # their math is covered by test_graph_exec_interpret)
    import spmv_tpu.handle as handle_mod
    monkeypatch.setattr(handle_mod, "_is_tpu", lambda: True)
    a = _web()
    from spmv_tpu.handle import create_handle
    from spmv_tpu.types import Method
    h = create_handle(a, method=Method.AUTO)
    assert "graph" in h.plan
    assert h.method == Method.SELL_C_SIGMA
    assert "pallas=graph" in repr(h)
    assert h.plan["pad_ratio"] < 48.0


def test_handle_gate():
    from spmv_tpu.handle import _graph_gate
    a = _web()
    prep = prepare_graph_split(a)
    assert _graph_gate(a, prep)
    assert not _graph_gate(a, None)
    # f64 is outside the COO2 heavy pass envelope
    a64 = CsrMatrix(a.m, a.n, a.rowptr, a.colidx,
                    a.vals.astype(np.float64))
    assert not _graph_gate(a64, prepare_graph_split(a64))
