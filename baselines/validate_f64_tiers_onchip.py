"""On-chip validation: the round-3 f64 tiers.

1. banded1m f64 → double-float Pallas DIA (reference CPU best on the same
   matrix: SellCSigma x4 = 12.51 GF/s, baselines/reference_cpu_banded1m.csv)
2. powerlaw100k f64 → row-split hybrid with df kernels (reference 5.09)
3. f64 with n > V2_MAX_N → windowed df kernels (the round-2 envelope gap)

Run on the TPU:  python baselines/validate_f64_tiers_onchip.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from spmv_tpu.utils import enable_compile_cache               # noqa: E402

enable_compile_cache()

import jax                                                    # noqa: E402
import jax.numpy as jnp                                       # noqa: E402

from spmv_tpu import create_handle, Method                    # noqa: E402
from spmv_tpu.types import CsrMatrix                          # noqa: E402
from spmv_tpu.bench.timing import time_spmv_chain             # noqa: E402
from spmv_tpu.io import generate                              # noqa: E402
from spmv_tpu.oracle import spmv_golden                       # noqa: E402


def _f64(a, seed=7):
    vals = np.random.default_rng(seed).standard_normal(a.nnz)
    return CsrMatrix(a.m, a.n, a.rowptr, a.colidx, vals)


def run(name, a, ref, tol=1e-11):
    t0 = time.perf_counter()
    h = create_handle(a, method=Method.AUTO)
    predeal = (time.perf_counter() - t0) * 1e3
    print(f"{name}: {h} predeal {predeal:.0f} ms")
    x = np.random.default_rng(0).standard_normal(a.n)
    xj = jnp.asarray(x)
    y = np.asarray(jax.block_until_ready(h(xj)))
    g = spmv_golden(a, x)
    rel = np.abs(y - g).max() / np.abs(g).max()
    print(f"{name}: rel err {rel:.2e}")
    assert rel < tol, rel
    for w in range(2):
        r = time_spmv_chain(h._bound, xj, iters=10, k=32, repeats=2)
        gf = 2 * a.nnz / r["inclusive"] / 1e9
        gfm = 2 * a.nnz / r["marginal"] / 1e9
        print(f"{name} w{w}: incl {r['inclusive']*1e3:.3f} ms = {gf:.2f} "
              f"GF/s ({gf/ref:.2f}x ref) marg {gfm:.2f} GF/s, bubble "
              f"{r['bubble']*1e3:.2f}", flush=True)
        if w == 0:
            time.sleep(8)


def main():
    print("backend:", jax.default_backend())
    run("banded1m_f64",
        _f64(generate.banded(1_000_000, 1_000_000, 4, dtype=np.float32,
                             seed=7)), ref=12.51)
    run("powerlaw100k_f64",
        _f64(generate.power_law(100_000, 100_000, 40 * 100_000,
                                dtype=np.float32, seed=2)), ref=5.09)
    # f64 past VMEM residency (round-2: "lands on the XLA floor")
    a32 = generate.clustered(2_500_000, 2_500_000, 12, spread=300,
                             dtype=np.float32, seed=6)
    run("clustered2.5m_f64", _f64(a32), ref=9.64, tol=1e-10)


if __name__ == "__main__":
    main()
