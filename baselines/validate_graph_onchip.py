"""On-chip validation: the graph tier (hub split + heavy 8W + light 8D +
binary fold kernel) on the webbase-shaped ultra-sparse matrix.

Run on the TPU:  python baselines/validate_graph_onchip.py
Reference CPU best on the identical .mtx: SellCSigma x4 = 2.84 GF/s avg
(baselines/reference_cpu_webbase1m.csv).
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


def main():
    print("backend:", jax.default_backend())
    a = generate.webbase_like(1_000_000, 1_000_000, 3_100_000,
                              dtype=np.float32, seed=11)
    ref = 2.84
    t0 = time.perf_counter()
    h = create_handle(a, method=Method.AUTO)
    predeal = (time.perf_counter() - t0) * 1e3
    print(f"webbase1m: {h} predeal {predeal:.0f} ms")
    assert "graph" in h.plan, f"expected the graph plan, got {h.plan.keys()}"
    x = np.random.default_rng(0).standard_normal(a.n).astype(np.float32)
    xj = jnp.asarray(x)
    y = np.asarray(jax.block_until_ready(h(xj)))
    g = spmv_golden(a, x)
    rel = np.abs(y - g).max() / np.abs(g).max()
    print(f"webbase1m: rel err {rel:.2e}")
    assert rel < 5e-5, rel
    for w in range(2):
        r = time_spmv_chain(h._bound, xj, iters=10, k=32, repeats=2)
        gf = 2 * a.nnz / r["inclusive"] / 1e9
        gfm = 2 * a.nnz / r["marginal"] / 1e9
        print(f"webbase1m w{w}: incl {r['inclusive']*1e3:.3f} ms = {gf:.2f} "
              f"GF/s ({gf/ref:.2f}x ref) marg {gfm:.2f} GF/s, bubble "
              f"{r['bubble']*1e3:.2f}")
        if w == 0:
            time.sleep(8)


if __name__ == "__main__":
    main()
