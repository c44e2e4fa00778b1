"""SELL-8W packer + Pallas kernel tests (interpret mode on CPU).

The kernel-level golden-validation pattern follows the reference's intended
microkernel tests (src/samples/test_lineProduct.c — bit-rotted there,
working here).
"""

import numpy as np
import pytest

from spmv_tpu.io import generate
from spmv_tpu.oracle import spmv_golden
from spmv_tpu.formats.sell8w import pack_sell8w, Sell8W, SUB, LANES, WINDOW
from spmv_tpu.ops.pallas_sell import build_sell8w_fn


def _check(a, seed=0, **pack_kw):
    p = pack_sell8w(a.astype(np.float32), **pack_kw)
    _verify_pack_invariants(p, a)
    fn = build_sell8w_fn(p, interpret=True)
    x = np.random.default_rng(seed).standard_normal(a.n).astype(np.float32)
    y = np.asarray(fn(x))
    ref = spmv_golden(a.astype(np.float64), x.astype(np.float64))
    scale = max(np.abs(ref).max(), 1.0)
    np.testing.assert_allclose(y / scale, ref / scale, atol=3e-6)
    return p


def _verify_pack_invariants(p: Sell8W, a):
    # slice ids non-decreasing (kernel requirement)
    assert np.all(np.diff(p.slice_ids) >= 0)
    # every slice group covered
    groups = set((p.slice_ids // SUB).tolist())
    assert groups == set(range(-(-p.nslices // SUB)))
    # matrix reconstruction: slot (i,j) of tile t holds A[row, col] with
    # row = slice*128 + j, col = w*1024 + stab[i, r_ij]*128 + r_ij where the
    # s-channel is laid out per-residue (formats/sell8w.py)
    stab = (p.meta.astype(np.int64) >> 7)
    r = (p.meta.astype(np.int64) & 127)
    nz = p.vals != 0
    n_pad = -(-a.n // WINDOW) * WINDOW
    got = {}
    for t in range(p.ntiles):
        for i in range(SUB):
            for j in range(LANES):
                if nz[t, i, j]:
                    rr = int(r[t, i, j])
                    col = (int(p.window_ids[t]) * WINDOW
                           + int(stab[t, i, rr]) * LANES + rr)
                    row = int(p.slice_ids[t]) * LANES + j
                    assert col < n_pad
                    got[(row, col)] = got.get((row, col), 0.0) \
                        + float(p.vals[t, i, j])
    dense = a.to_dense()
    for (row, col), v in got.items():
        assert abs(dense[row, col] - v) < 1e-6
    assert len(got) == int((dense != 0).sum())


def test_banded():
    _check(generate.banded(700, 700, 3, seed=1))


def test_rect_wide():
    _check(generate.random_uniform(300, 2500, 12, seed=2))


def test_powerlaw():
    _check(generate.power_law(800, 800, 16000, seed=3))


def test_empty_rows_and_tail():
    a = generate.with_empty_rows(
        generate.random_uniform(500, 400, 6, seed=4), 0.5)
    _check(a)


def test_tiny_and_empty():
    _check(generate.banded(3, 3, 1))
    from spmv_tpu.types import CsrMatrix
    empty = CsrMatrix(4, 4, np.zeros(5, np.int32), np.zeros(0, np.int32),
                      np.zeros(0, np.float32))
    p = pack_sell8w(empty)
    fn = build_sell8w_fn(p, interpret=True)
    np.testing.assert_array_equal(np.asarray(fn(np.ones(4, np.float32))),
                                  np.zeros(4))


def test_pad_gate():
    # scattered random over a wide n → padding explodes → ValueError
    a = generate.random_uniform(600, 200_000, 4, seed=5)
    with pytest.raises(ValueError):
        pack_sell8w(a.astype(np.float32), max_pad_ratio=2.0)


def test_single_megarow():
    m, n = 200, 1000
    rng = np.random.default_rng(7)
    rows = np.concatenate([np.zeros(3000, dtype=np.int32),
                           rng.integers(1, m, size=400).astype(np.int32)])
    cols = rng.integers(0, n, size=rows.size).astype(np.int32)
    vals = generate.exact_values(rng, rows.size)
    from spmv_tpu.types import CsrMatrix
    _check(CsrMatrix.from_coo(m, n, rows, cols, vals))


def test_pallas_dia_kernel():
    from spmv_tpu.formats.dia import pack_dia
    from spmv_tpu.ops.pallas_dia import build_dia_fn
    for name, a in [
        ("banded", generate.banded(3000, 3000, 4, seed=1).astype(np.float32)),
        ("banded-neg-wide", generate.banded(2500, 2500, 130, seed=2,
                                            exact=False).astype(np.float32)),
        ("rect", generate.banded(500, 900, 3, seed=3).astype(np.float32)),
    ]:
        d = pack_dia(a)
        if d.data.shape[0] > 33:
            continue
        fn = build_dia_fn(d, interpret=True)
        x = np.random.default_rng(0).standard_normal(a.n).astype(np.float32)
        y = np.asarray(fn(x))
        ref = spmv_golden(a.astype(np.float64), x.astype(np.float64))
        scale = max(np.abs(ref).max(), 1.0)
        np.testing.assert_allclose(y / scale, ref / scale, atol=3e-6,
                                   err_msg=name)


def test_pallas_dia_big_offsets():
    # offsets beyond one 128-block in both directions (q != 0 paths)
    import numpy as np
    from spmv_tpu.types import CsrMatrix
    from spmv_tpu.formats.dia import pack_dia
    from spmv_tpu.ops.pallas_dia import build_dia_fn
    m = 2000
    rows, cols, vals = [], [], []
    rng = np.random.default_rng(5)
    for off in (-300, -129, -1, 0, 200, 513):
        r = np.arange(max(0, -off), min(m, m - off))
        rows.append(r); cols.append(r + off)
        vals.append(rng.standard_normal(len(r)))
    a = CsrMatrix.from_coo(m, m, np.concatenate(rows), np.concatenate(cols),
                           np.concatenate(vals).astype(np.float32))
    d = pack_dia(a)
    fn = build_dia_fn(d, interpret=True)
    x = rng.standard_normal(m).astype(np.float32)
    y = np.asarray(fn(x))
    ref = spmv_golden(a.astype(np.float64), x.astype(np.float64))
    scale = max(np.abs(ref).max(), 1.0)
    np.testing.assert_allclose(y / scale, ref / scale, atol=3e-6)
