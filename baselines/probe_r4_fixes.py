"""Verify the round-4 fix stack on-chip: webbase + powerlaw_f64 AUTO.

After: pair-level spill + adaptive graph/fold g + compact rest streams
(f32: compact sums + small scatter-add; f64: compact f64 sums placed via
hi/lo f32 planes — no m-length f64 scatter).  Expected from the
decomposition (probe_webbase_r4.out): webbase 1.50 → ~1.1 ms marg,
powerlaw_f64 0.77 → ~0.65 ms marg.

Run on the TPU:  python baselines/probe_r4_fixes.py
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


def run(name, a, ref, tol):
    t0 = time.perf_counter()
    h = create_handle(a, method=Method.AUTO)
    predeal = (time.perf_counter() - t0) * 1e3
    x = np.random.default_rng(0).standard_normal(a.n).astype(
        np.asarray(a.vals).dtype)
    xj = jnp.asarray(x)
    y = np.asarray(jax.block_until_ready(h(xj))).astype(np.float64)
    g = spmv_golden(a.astype(np.float64), x.astype(np.float64))
    rel = np.abs(y - g).max() / max(np.abs(g).max(), 1e-30)
    print(f"{name}: {h.method_name} mode={h.plan.get('value_mode')} "
          f"predeal {predeal:.0f} ms rel {rel:.2e}", flush=True)
    assert rel < tol, (name, rel)
    for w in range(2):
        r = time_spmv_chain(h._bound, xj, iters=10, k=32, repeats=2)
        gf = 2 * a.nnz / r["inclusive"] / 1e9
        print(f"  w{w}: incl {gf:.2f} GF/s "
              f"(marg {2*a.nnz/r['marginal']/1e9:.2f}) "
              f"vs_ref {gf/ref:.2f}", flush=True)
        if w == 0:
            time.sleep(8)


def main():
    print("backend:", jax.default_backend(), flush=True)
    run("webbase1m",
        generate.webbase_like(1_000_000, 1_000_000, 3_100_000,
                              dtype=np.float32, seed=11), 2.84, 2e-4)
    a32 = generate.power_law(100_000, 100_000, 40 * 100_000,
                             dtype=np.float32, seed=2)
    vals = np.random.default_rng(7).standard_normal(a32.nnz)
    run("powerlaw100k_f64",
        CsrMatrix(a32.m, a32.n, a32.rowptr, a32.colidx, vals), 5.09,
        1e-10)
    run("uniform100k_f64",
        CsrMatrix(*(lambda a: (a.m, a.n, a.rowptr, a.colidx,
                               np.random.default_rng(7)
                               .standard_normal(a.nnz)))(
            generate.random_uniform(100_000, 100_000, 40,
                                    dtype=np.float32, seed=42))),
        8.18, 1e-10)
    print("R4 FIXES OK")


if __name__ == "__main__":
    main()
