"""Locality layer tests (reference C13 semantics: permute in, un-permute out)."""

import numpy as np
import pytest

from spmv_tpu.io import generate
from spmv_tpu.oracle import spmv_golden
from spmv_tpu.formats import reorder


def test_rcm_reduces_bandwidth():
    # a banded matrix scrambled by a random symmetric permutation
    a = generate.banded(300, 300, 3, seed=1)
    rng = np.random.default_rng(0)
    scramble = rng.permutation(300)
    scrambled, _ = reorder.reorder_symmetric(a, scramble)
    assert reorder.bandwidth(scrambled) > 50
    perm = reorder.rcm_order(scrambled)
    restored, _ = reorder.reorder_symmetric(scrambled, perm)
    assert reorder.bandwidth(restored) <= 10  # RCM recovers the band


def test_reorder_symmetric_contract(matrices):
    for name in ("uniform", "powerlaw"):
        a0 = matrices[name]
        if a0.m != a0.n:
            continue
        a = a0
        rng = np.random.default_rng(3)
        perm = rng.permutation(a.m)
        ap, _ = reorder.reorder_symmetric(a, perm)
        x = rng.standard_normal(a.n)
        y_ref = spmv_golden(a, x)
        y_p = spmv_golden(ap, x[perm])
        y = np.empty_like(y_p)
        y[perm] = y_p
        np.testing.assert_allclose(y, y_ref, rtol=1e-12, atol=1e-12,
                                   err_msg=name)


def test_reorder_rows_only():
    a = generate.random_uniform(50, 70, 5, seed=2)
    perm = np.random.default_rng(1).permutation(50)
    ap = reorder.reorder_rows(a, perm)
    x = np.random.default_rng(2).standard_normal(70)
    np.testing.assert_allclose(spmv_golden(ap, x), spmv_golden(a, x)[perm],
                               rtol=1e-12)


def test_cached_order(tmp_path):
    a = generate.banded(100, 100, 2)
    p1 = reorder.cached_order(a, "tok", kind="rcm", cache_dir=str(tmp_path))
    p2 = reorder.cached_order(a, "tok", kind="rcm", cache_dir=str(tmp_path))
    np.testing.assert_array_equal(p1, p2)
    assert len(list(tmp_path.iterdir())) == 1


def test_window_cluster_order_valid_perm():
    a = generate.random_uniform(200, 300, 6, seed=5)
    p = reorder.window_cluster_order(a)
    assert sorted(p.tolist()) == list(range(300))
