"""Krylov solvers on the handle API (spmv_tpu.solvers) — the execute-many
workload the reference's vestigial ITSOL types point at (data-types.h)."""

import numpy as np

from spmv_tpu import create_handle, spmv, Method, CsrMatrix
from spmv_tpu.io import generate
from spmv_tpu.solvers import bicgstab, cg, power_iteration


def _spd(m=800, seed=1):
    a = generate.diag_plus_random(m, nnz_per_row=6, seed=seed)
    rows = np.repeat(np.arange(a.m), a.row_lengths)
    return CsrMatrix.from_coo(
        a.m, a.n,
        np.concatenate([rows, a.colidx]),
        np.concatenate([a.colidx, rows]),
        np.concatenate([a.vals, a.vals]) * 0.5)


def test_cg_solves_spd():
    a = _spd()
    h = create_handle(a, method=Method.AUTO)
    b = np.random.default_rng(2).standard_normal(a.n)
    x, res, iters = cg(h, b, tol=1e-8)
    assert res < 1e-7 and 0 < iters < 1000
    np.testing.assert_allclose(np.asarray(spmv(h, x)), b, rtol=0, atol=1e-6)


def test_bicgstab_solves_nonsymmetric():
    a = generate.diag_plus_random(600, nnz_per_row=5, seed=3)
    h = create_handle(a, method=Method.BALANCED)
    b = np.random.default_rng(4).standard_normal(a.n)
    x, res, iters = bicgstab(h, b, tol=1e-8)
    assert res < 1e-7 and 0 < iters < 1000
    np.testing.assert_allclose(np.asarray(spmv(h, x)), b, rtol=0, atol=1e-6)


def test_power_iteration():
    a = _spd(400, seed=5)
    h = create_handle(a)
    lam, v = power_iteration(h, iters=200)
    # residual of the eigen equation
    av = np.asarray(spmv(h, np.asarray(v)))
    assert np.abs(av - lam * np.asarray(v)).max() < 1e-3 * abs(lam)


def test_solvers_accept_plain_callables():
    """Distributed plans / raw closures work too (anything x -> y)."""
    a = _spd(300, seed=6)
    h = create_handle(a)
    b = np.random.default_rng(7).standard_normal(a.n)
    x, res, _ = cg(lambda v: h._bound(v), b, tol=1e-8)
    assert res < 1e-7
