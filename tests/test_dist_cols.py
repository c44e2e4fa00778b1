"""Column-sharded SELL-8D over the mesh (round 5, VERDICT item 6).

The mesh counterpart of the single-chip column-striped resident tier:
each device owns one bundle-aligned column block (its x slice IS the
natural P(axis) shard — no gather, no halo), runs the resident slot
kernel, and the partials reduce with one psum over ICI.  Reference
analog: the NUMA sample's x-splitting option (numa.c:268-439).
"""

import numpy as np
import pytest

from spmv_tpu.io import generate
from spmv_tpu.oracle import spmv_golden
from spmv_tpu.parallel import build_dist_sell8d_cols_plan, make_mesh_1d
from spmv_tpu.types import CsrMatrix


def _check(a, plan, rtol=2e-5, atol=1e-6):
    x = generate.make_x(a.n, a.dtype, kind="normal", seed=3)
    y = np.asarray(plan(x))
    ref = spmv_golden(a.astype(np.float64), x.astype(np.float64))
    np.testing.assert_allclose(np.asarray(y, dtype=np.float64), ref,
                               rtol=rtol, atol=atol)


def test_cols_plan_f32_parity():
    # n must exceed ndev*STRIPE_ALIGN for a real multi-block split
    a = generate.random_uniform(20_000, 8 * 8192 + 5_000, 12,
                                dtype=np.float32, seed=1)
    plan = build_dist_sell8d_cols_plan(a, make_mesh_1d(8),
                                       max_pad_ratio=256.0,
                                       interpret=True)
    assert plan.cw % 8192 == 0 and plan.cw * 8 >= a.n
    _check(a, plan)


def test_cols_plan_f64_parity():
    a32 = generate.random_uniform(12_000, 8 * 8192 + 100, 8,
                                  dtype=np.float32, seed=2)
    rng = np.random.default_rng(5)
    a = CsrMatrix(a32.m, a32.n, a32.rowptr, a32.colidx,
                  rng.standard_normal(a32.nnz))
    plan = build_dist_sell8d_cols_plan(a, make_mesh_1d(8),
                                       max_pad_ratio=256.0,
                                       interpret=True)
    assert plan.value_mode in ("df", "df16", "palette_df")
    # interpret mode collapses the EFTs — f32-level bound (same caveat
    # as tests/test_striped.py)
    _check(a, plan)


def test_cols_plan_rejects_oversized_shard():
    # width per shard would exceed the VMEM-x envelope
    a = generate.random_uniform(1000, 40_000_000, 2, dtype=np.float32,
                                seed=4)
    with pytest.raises(ValueError, match="VMEM-x envelope"):
        build_dist_sell8d_cols_plan(a, make_mesh_1d(4))


def test_cols_plan_empty_shard_and_rest():
    # all nnz in the first and last blocks; middle shards run the default
    # zero stream
    rng = np.random.default_rng(6)
    m, n = 4_000, 8 * 8192
    rows = np.repeat(np.arange(m), 3)
    cols = np.where(rng.random(len(rows)) < 0.5,
                    rng.integers(0, 8192, len(rows)),
                    rng.integers(n - 8192, n, len(rows)))
    a = CsrMatrix.from_coo(m, n, rows, cols,
                           rng.standard_normal(len(rows))
                           .astype(np.float32))
    plan = build_dist_sell8d_cols_plan(a, make_mesh_1d(8),
                                       max_pad_ratio=512.0,
                                       interpret=True)
    _check(a, plan)
