"""On-chip validation of the f64 double-float SELL-8D slot-mode path.

Interpret mode cannot validate the EFTs (XLA:CPU simplifies them); this
checks the tight bound on hardware and times uniform100k f64 through the
handle.  Run on the TPU:  python baselines/validate_sell8d_f64_onchip.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from spmv_tpu.utils import enable_compile_cache               # noqa: E402

enable_compile_cache()

import jax                                                    # noqa: E402

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp                                       # noqa: E402

from spmv_tpu import create_handle, Method                    # noqa: E402
from spmv_tpu.bench.timing import time_spmv_chain             # noqa: E402
from spmv_tpu.io import generate                              # noqa: E402
from spmv_tpu.oracle import spmv_golden                       # noqa: E402
from spmv_tpu.types import CsrMatrix                          # noqa: E402


def main():
    print("backend:", jax.default_backend())
    a32 = generate.random_uniform(100_000, 100_000, 40,
                                  dtype=np.float32, seed=42)
    rng = np.random.default_rng(7)
    vals = rng.standard_normal(a32.nnz)                 # f64, >64 distinct
    a = CsrMatrix(a32.m, a32.n, a32.rowptr, a32.colidx, vals)
    t0 = time.perf_counter()
    h = create_handle(a, method=Method.AUTO)
    predeal = (time.perf_counter() - t0) * 1e3
    print(f"uniform100k f64: {h} predeal {predeal:.0f} ms")
    x = rng.standard_normal(a.n)
    xj = jnp.asarray(x)
    y = np.asarray(jax.block_until_ready(h(xj))).astype(np.float64)
    g = spmv_golden(a, x)
    rel = np.abs(y - g).max() / np.abs(g).max()
    print(f"uniform100k f64: max-rel {rel:.2e}")
    assert rel < 1e-11, rel
    for w in range(2):
        r = time_spmv_chain(h._bound, xj, iters=10, k=32, repeats=2)
        gf = 2 * a.nnz / r["inclusive"] / 1e9
        gfm = 2 * a.nnz / r["marginal"] / 1e9
        print(f"w{w}: incl {r['inclusive']*1e3:.3f} ms = {gf:.2f} GF/s "
              f"marg {gfm:.2f} GF/s (reference f64 best 8.18)")
        if w == 0:
            time.sleep(8)


if __name__ == "__main__":
    main()
