"""v2w kernel (grouped steps + per-tile window DMAs, any n)."""

import numpy as np

from spmv_tpu.formats.sell8w import pack_sell8w
from spmv_tpu.io import generate
from spmv_tpu.oracle import spmv_golden


def test_v2w_matches_golden():
    from spmv_tpu.ops.pallas_sell import build_sell8w_v2w_fn
    a = generate.clustered(700, 700, 9, spread=150, dtype=np.float32,
                           seed=1)
    fn = build_sell8w_v2w_fn(pack_sell8w(a), g=4, interpret=True)
    x = generate.make_x(a.n, np.float32, kind="normal", seed=2)
    np.testing.assert_allclose(
        np.asarray(fn(x)),
        spmv_golden(a.astype(np.float64), x.astype(np.float64)),
        rtol=2e-5, atol=1e-5)


def test_v2w_binary_reduce():
    from spmv_tpu.ops.pallas_sell import build_sell8w_v2w_fn
    from spmv_tpu.types import CsrMatrix
    rng = np.random.default_rng(3)
    # R-like 0/1 matrix with clustered positions
    a = generate.clustered(400, 4096, 6, spread=300, dtype=np.float32,
                           seed=3)
    a = CsrMatrix(a.m, a.n, a.rowptr, a.colidx,
                  np.ones(a.nnz, dtype=np.float32))
    fn = build_sell8w_v2w_fn(pack_sell8w(a), g=4, binary=True,
                             interpret=True)
    x = rng.standard_normal(a.n).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(fn(x)),
        spmv_golden(a.astype(np.float64), x.astype(np.float64)),
        rtol=2e-5, atol=1e-4)


def test_v2w_f32_mode_nonexact_values():
    from spmv_tpu.ops.pallas_sell import build_sell8w_v2w_fn
    a = generate.clustered(500, 500, 7, spread=120, dtype=np.float32,
                           seed=5, exact=False)
    fn = build_sell8w_v2w_fn(pack_sell8w(a), g=8, interpret=True)
    x = generate.make_x(a.n, np.float32, kind="normal", seed=6)
    np.testing.assert_allclose(
        np.asarray(fn(x)),
        spmv_golden(a.astype(np.float64), x.astype(np.float64)),
        rtol=2e-5, atol=1e-4)
