"""On-chip validation of the double-float (f64) SELL-8W tier.

Interpret mode (XLA:CPU) simplifies error-free-transform patterns and
reports f32-grade error; the REAL kernel (Mosaic) preserves IEEE order.
Recorded output lives in validate_df_onchip.out; re-run after any kernel
change.  Measured 2026-08-17: palette_df exact (0.0), df 1.8e-12 maxrel,
clustered100k 5.7e-14 maxrel.
"""
from spmv_tpu.utils import enable_compile_cache
enable_compile_cache()
import jax
import numpy as np
jax.config.update('jax_enable_x64', True)
from spmv_tpu.types import CsrMatrix
from spmv_tpu.oracle import spmv_golden
from spmv_tpu.formats.sell8w import pack_sell8w, plan_v2
from spmv_tpu.ops.pallas_sell import build_sell8w_v2_fn
from spmv_tpu.io import generate


def mk(mat, g=16):
    hi = pack_sell8w(mat)
    hib = mat.vals.astype(np.float32).astype(np.float64)
    lo = pack_sell8w(CsrMatrix(mat.m, mat.n, mat.rowptr, mat.colidx,
                               (mat.vals - hib).astype(np.float32)))
    return plan_v2(hi, g=g, lo_tiles=lo.vals)


def main():
    rng = np.random.default_rng(0)
    m, n, per = 16, 128, 12
    rows = np.repeat(np.arange(m), per)
    cols = rng.integers(0, n, size=rows.size)
    a = CsrMatrix.from_coo(m, n, rows, cols,
                           rng.integers(0, 8, size=rows.size) * 0.125)
    x = rng.standard_normal(n).astype(np.float32).astype(np.float64)
    fn = build_sell8w_v2_fn(mk(a, g=1))
    print("palette_df maxerr:", np.abs(np.asarray(fn(x))
                                       - spmv_golden(a, x)).max())

    b = CsrMatrix.from_coo(m, n, rows, cols, rng.standard_normal(rows.size))
    fnb = build_sell8w_v2_fn(mk(b, g=1))
    gb = spmv_golden(b, x)
    print("df maxrel:", (np.abs(np.asarray(fnb(x)) - gb)
                         / np.maximum(np.abs(gb), 1e-10)).max())

    c = generate.clustered(100_000, 100_000, 24, spread=400,
                           dtype=np.float64, seed=11, exact=False)
    fnc = build_sell8w_v2_fn(mk(c))
    xc = np.random.default_rng(1).standard_normal(c.n)
    gc = spmv_golden(c, xc)
    print("clustered100k df maxrel:",
          (np.abs(np.asarray(fnc(xc)) - gc) / np.abs(gc).max()).max())
    assert (np.abs(np.asarray(fnc(xc)) - gc) / np.abs(gc).max()).max() < 1e-12


if __name__ == "__main__":
    main()
