"""Core types, generators, oracle, and Matrix Market I/O."""

import numpy as np
import pytest

from spmv_tpu.types import CsrMatrix
from spmv_tpu.oracle import spmv_golden, rmse
from spmv_tpu.io import mmio, generate


def test_from_coo_dedup_and_sort():
    a = CsrMatrix.from_coo(3, 3, [2, 0, 0, 1], [1, 2, 2, 0], [1.0, 2.0, 3.0, 4.0])
    dense = a.to_dense()
    expect = np.zeros((3, 3))
    expect[2, 1] = 1.0
    expect[0, 2] = 5.0  # duplicates summed
    expect[1, 0] = 4.0
    np.testing.assert_array_equal(dense, expect)
    assert a.nnz == 3


def test_from_dense_roundtrip():
    rng = np.random.default_rng(0)
    d = rng.random((7, 11)) * (rng.random((7, 11)) < 0.3)
    a = CsrMatrix.from_dense(d)
    np.testing.assert_array_equal(a.to_dense(), d)


def test_validation_errors():
    with pytest.raises(ValueError):
        CsrMatrix(2, 2, [0, 1], [0], [1.0])          # rowptr wrong length
    with pytest.raises(ValueError):
        CsrMatrix(2, 2, [0, 1, 1], [5], [1.0])        # colidx out of range
    with pytest.raises(ValueError):
        CsrMatrix(2, 2, [0, 2, 1], [0, 1], [1.0, 1])  # decreasing rowptr


def test_transpose():
    a = generate.random_uniform(40, 25, 4, seed=9)
    np.testing.assert_allclose(a.transpose().to_dense(), a.to_dense().T)


def test_permute_rows():
    a = generate.random_uniform(30, 20, 5, seed=3)
    perm = np.random.default_rng(0).permutation(30)
    np.testing.assert_array_equal(a.permute_rows(perm).to_dense(),
                                  a.to_dense()[perm])


def test_oracle_matches_dense(matrices):
    for name, a in matrices.items():
        x = generate.make_x(a.n, kind="normal", seed=1)
        np.testing.assert_allclose(
            spmv_golden(a, x), a.to_dense() @ x, rtol=1e-10, atol=1e-10,
            err_msg=name)


def test_rmse_zero_for_exact():
    y = np.array([1.0, 2.0])
    assert rmse(y, y) == 0.0


@pytest.mark.parametrize("symmetry,header_field", [
    ("general", "real"),
    ("symmetric", "real"),
    ("general", "pattern"),
])
def test_mmio_roundtrip(tmp_path, symmetry, header_field):
    rng = np.random.default_rng(4)
    m = n = 12
    # build lower-triangular-or-general COO
    rows = rng.integers(0, m, 30)
    cols = rng.integers(0, n, 30)
    if symmetry == "symmetric":
        rows, cols = np.maximum(rows, cols), np.minimum(rows, cols)
    vals = np.ones(30) if header_field == "pattern" else rng.random(30)
    path = tmp_path / "t.mtx"
    with open(path, "w") as f:
        f.write(f"%%MatrixMarket matrix coordinate {header_field} {symmetry}\n")
        f.write("% comment line\n")
        f.write(f"{m} {n} {len(rows)}\n")
        for r, c, v in zip(rows, cols, vals):
            if header_field == "pattern":
                f.write(f"{r+1} {c+1}\n")
            else:
                f.write(f"{r+1} {c+1} {v}\n")
    a = mmio.read_mtx(str(path))
    dense = np.zeros((m, n))
    for r, c, v in zip(rows, cols, vals):
        dense[r, c] += v
        if symmetry == "symmetric" and r != c:
            dense[c, r] += v
    np.testing.assert_allclose(a.to_dense(), dense, rtol=1e-12)


def test_mmio_cache(tmp_path):
    a = generate.random_uniform(20, 20, 3, seed=8)
    mtx = tmp_path / "m.mtx"
    mmio.write_mtx(str(mtx), a)
    b1 = mmio.load_matrix(str(mtx), cache_dir=str(tmp_path / "cache"))
    assert (tmp_path / "cache").exists()
    b2 = mmio.load_matrix(str(mtx), cache_dir=str(tmp_path / "cache"))
    np.testing.assert_array_equal(b1.to_dense(), a.to_dense())
    np.testing.assert_array_equal(b2.to_dense(), a.to_dense())


def test_exact_value_fixture_is_dyadic():
    rng = np.random.default_rng(0)
    v = generate.exact_values(rng, 1000, np.float32)
    assert np.all(v * 8 == np.round(v * 8))


def test_bfloat16_end_to_end():
    import numpy as np
    import jax.numpy as jnp
    import ml_dtypes
    from spmv_tpu.io import generate
    from spmv_tpu import create_handle, spmv, Method
    from spmv_tpu.oracle import spmv_golden
    a = generate.banded(200, 200, 2, seed=1).astype(ml_dtypes.bfloat16)
    h = create_handle(a, method=Method.SERIAL)
    x = np.ones(a.n, np.float32)
    y = np.asarray(spmv(h, x))
    ref = spmv_golden(a.astype(np.float64), x.astype(np.float64))
    # values are dyadic k/8 -> exact in bf16; f32 accumulation -> exact
    np.testing.assert_array_equal(y, ref.astype(np.float32))


def test_submodule_api_surface():
    import spmv_tpu as st
    assert callable(st.io.mmio.load_matrix)
    assert callable(st.formats.reorder.rcm_order)
    assert callable(st.parallel.build_dist_plan)
    assert callable(st.bench.time_spmv)
    assert callable(st.utils.roofline_gflops)
