"""On-chip validation: AUTO routing for uniform (8D bundles) and powerlaw
(density-split hybrid) after the nw-bundle work.

Run on the TPU:  python baselines/validate_hybrid_onchip.py
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
from spmv_tpu.bench.timing import time_spmv_chain             # noqa: E402
from spmv_tpu.io import generate                              # noqa: E402
from spmv_tpu.oracle import spmv_golden                       # noqa: E402


def run(name, a, ref):
    t0 = time.perf_counter()
    h = create_handle(a, method=Method.AUTO)
    predeal = (time.perf_counter() - t0) * 1e3
    print(f"{name}: {h} predeal {predeal:.0f} ms")
    x = np.random.default_rng(0).standard_normal(a.n).astype(np.float32)
    xj = jnp.asarray(x)
    y = np.asarray(jax.block_until_ready(h(xj)))
    g = spmv_golden(a, x)
    rel = np.abs(y - g).max() / np.abs(g).max()
    print(f"{name}: rel err {rel:.2e}")
    assert rel < 5e-5, rel
    for w in range(2):
        r = time_spmv_chain(h._bound, xj, iters=10, k=32, repeats=2)
        gf = 2 * a.nnz / r["inclusive"] / 1e9
        gfm = 2 * a.nnz / r["marginal"] / 1e9
        print(f"{name} w{w}: incl {r['inclusive']*1e3:.3f} ms = {gf:.2f} "
              f"GF/s ({gf/ref:.2f}x ref) marg {gfm:.2f} GF/s, bubble "
              f"{r['bubble']*1e3:.2f}")
        if w == 0:
            time.sleep(8)


def main():
    print("backend:", jax.default_backend())
    run("uniform100k",
        generate.random_uniform(100_000, 100_000, 40, dtype=np.float32,
                                seed=42), ref=8.18)
    run("powerlaw100k",
        generate.power_law(100_000, 100_000, 40 * 100_000,
                           dtype=np.float32, seed=2), ref=5.09)   # reference Parallel x4 (reference_cpu_powerlaw100k.csv)


if __name__ == "__main__":
    main()
