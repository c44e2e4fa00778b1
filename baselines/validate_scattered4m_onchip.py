"""On-chip validation, VERDICT round-2 item 3 "done" bar: a ≥4M-row
SCATTERED matrix on the Pallas slot-mode path, co-timed against the XLA
plan (round 2: large scattered matrices sat on the XLA gather floor).

Config: tall uniform scatter 4M×262144, 8 nnz/row (32M nnz) — a 437k-
tile slot plan that exercises the chunked execution path (the stream
exceeds the SMEM scalar-prefetch budget; pallas_sell._slot_chunks).
Rows are fully scattered; the column space keeps the (slice, window)
pair floor below the pad budget — m=n=4M uniform-8 has pairs-floor pad
≈ 61 on the COARSEST windowed grid, i.e. NO windowed format can serve
it (PERFNOTES "ultra-sparse pairs-floor regime"; the reference's CPU
caches hit the same wall: x = 32 MB ≫ L2).  That shape is also
exercised here to prove the pairs pre-gate: AUTO must fall back to the
XLA plan in seconds, not minutes (was 188 s before the gate).

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
    a = generate.random_uniform(4_000_000, 262_144, 8,
                                dtype=np.float32, seed=13)
    print(f"scattered4m: {a.m} rows x {a.n}, nnz {a.nnz}", flush=True)
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
        # f32 accumulation at 8 nnz/row: both plans are f32-accurate
        assert rel < 2e-4, rel
        handles[label] = h
    assert any(k in handles["auto"].plan
               for k in ("sell8d", "hybrid", "sell8w_v2", "sell8w_v2w",
                         "graph")), list(handles["auto"].plan)

    res = {}
    for w in range(2):
        print(f"--- window {w} ---")
        for label, h in handles.items():
            # k=4: the chunked 437k-tile plan is MULTIPLE pallas calls
            # per exec and the chained protocol unrolls k of them —
            # k=32 lowered for >30 min (this is exactly where the
            # round-3 artifact truncated); per-SpMV ≥10 ms ≫ the ~3 ms
            # bubble, so k=4 already amortizes it (PERFNOTES round-4)
            r = time_spmv_chain(h._bound, xj, iters=8, k=4, repeats=2)
            gf = 2 * a.nnz / r["inclusive"] / 1e9
            print(f"  {label}: incl {r['inclusive']*1e3:.3f} ms "
                  f"({gf:.2f} GF/s) marg {r['marginal']*1e3:.3f} ms",
                  flush=True)
            res.setdefault(label, []).append(r["inclusive"])
        if w == 0:
            time.sleep(8)
    speedup = min(res["xla_balanced"]) / min(res["auto"])
    print(f"pallas vs xla speedup: {speedup:.1f}x (target >= 5)")

    # the pairs-floor shape: AUTO must give up FAST (was 188 s)
    b = generate.random_uniform(4_000_000, 4_000_000, 8,
                                dtype=np.float32, seed=13)
    t0 = time.perf_counter()
    hb = create_handle(b, method=Method.AUTO)
    dt = time.perf_counter() - t0
    print(f"pairs-floor 4Mx4M d=8: {hb} predeal {dt*1e3:.0f} ms "
          f"(gate target < 30 s; was 188 s)")
    assert dt < 60.0, dt


if __name__ == "__main__":
    main()
