"""COO2 two-pass format + kernels (interpret mode)."""

import numpy as np
import pytest

from spmv_tpu.io import generate
from spmv_tpu.oracle import spmv_golden
from spmv_tpu.formats.coo2 import pack_coo2
from spmv_tpu.ops.pallas_coo2 import build_coo2_fn


def _check(a, seed=0, **kw):
    p = pack_coo2(a.astype(np.float32), **kw)
    fn = build_coo2_fn(p, interpret=True)
    x = np.random.default_rng(seed).standard_normal(a.n).astype(np.float32)
    y = np.asarray(fn(x))
    ref = spmv_golden(a.astype(np.float64), x.astype(np.float64))
    scale = max(np.abs(ref).max(), 1.0)
    np.testing.assert_allclose(y / scale, ref / scale, atol=3e-6)
    return p


def test_uniform_dense_rows():
    p = _check(generate.random_uniform(2000, 2000, 40, seed=42))
    assert p.pad_ratio_pass1 < 1.3


def test_powerlaw():
    _check(generate.power_law(1500, 1500, 40000, seed=3))


def test_rect():
    _check(generate.random_uniform(700, 2500, 15, seed=2))


def test_empty_rows():
    a = generate.with_empty_rows(
        generate.random_uniform(600, 500, 8, seed=4), 0.4)
    _check(a)


def test_pad2_gate():
    # scattered thin rows over wide n → pass-2 padding explodes
    a = generate.random_uniform(2000, 300_000, 4, seed=5)
    with pytest.raises(ValueError):
        pack_coo2(a.astype(np.float32), max_pad2=8.0)


def test_positions_consistency():
    # exact=False → gaussian values, none exactly zero, so slot counting works
    a = generate.random_uniform(1000, 1000, 20, seed=7,
                                exact=False).astype(np.float32)
    p = pack_coo2(a)
    # pass-1 tiles hold each nonzero exactly once; the R matrix has one 1.0
    # per nonzero pointing at that slot
    r = p.reduce_plan
    assert r.nnz_stored == a.nnz
    nzslots = int((p.vals != 0).sum())
    assert nzslots == a.nnz
