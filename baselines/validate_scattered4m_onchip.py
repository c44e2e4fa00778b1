"""On-chip validation, VERDICT round-2 item 3 "done" bar: a ≥4M-row
SCATTERED matrix past VMEM residency (n > V2_MAX_N) on the Pallas
windowed slot-mode path, co-timed against the XLA plan it used to land
on (round 2: "n > 2M uniform scatter sits at the XLA gather floor").

Run on the TPU:  python baselines/validate_scattered4m_onchip.py
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
    m = 4_000_000
    a = generate.random_uniform(m, m, 8, dtype=np.float32, seed=13)
    print(f"scattered4m: {a.m} rows, nnz {a.nnz}, n > V2_MAX_N", flush=True)
    x = np.random.default_rng(0).standard_normal(a.n).astype(np.float32)
    xj = jnp.asarray(x)
    g = spmv_golden(a.astype(np.float64), x.astype(np.float64))
    scale = max(np.abs(g).max(), 1.0)

    handles = {}
    for label, method in (("auto", Method.AUTO),
                          ("xla_balanced", Method.BALANCED)):
        t0 = time.perf_counter()
        h = create_handle(a, method=method)
        print(f"{label}: {h} predeal "
              f"{(time.perf_counter()-t0)*1e3:.0f} ms", flush=True)
        y = np.asarray(jax.block_until_ready(h(xj)), dtype=np.float64)
        rel = np.abs(y - g).max() / scale
        print(f"{label}: rel err {rel:.2e}")
        assert rel < 3e-5, rel
        handles[label] = h
    assert any(k in handles["auto"].plan
               for k in ("sell8d", "hybrid", "sell8w_v2w", "graph")), \
        list(handles["auto"].plan)

    res = {}
    for w in range(2):
        print(f"--- window {w} ---")
        for label, h in handles.items():
            r = time_spmv_chain(h._bound, xj, iters=8, k=32, repeats=2)
            gf = 2 * a.nnz / r["inclusive"] / 1e9
            print(f"  {label}: incl {r['inclusive']*1e3:.3f} ms "
                  f"({gf:.2f} GF/s) marg {r['marginal']*1e3:.3f} ms",
                  flush=True)
            res.setdefault(label, []).append(r["inclusive"])
        if w == 0:
            time.sleep(8)
    speedup = min(res["xla_balanced"]) / min(res["auto"])
    print(f"pallas vs xla speedup: {speedup:.1f}x (target >= 5)")


if __name__ == "__main__":
    main()
