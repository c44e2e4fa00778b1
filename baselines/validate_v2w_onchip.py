"""On-chip validation + timing of the v2w kernels (grouped steps with
per-tile window DMAs): the COO2/CSR5 two-pass path and the big-n SELL-8W
fallback.  Run after any kernel change; output recorded in
validate_v2w_onchip.out."""
import json

from spmv_tpu.utils import enable_compile_cache
enable_compile_cache()

import jax.numpy as jnp
import numpy as np

from spmv_tpu import create_handle, Method
from spmv_tpu.bench.timing import time_spmv_chain
from spmv_tpu.io import generate
from spmv_tpu.oracle import spmv_golden, rmse


def main():
    # CSR5 (COO2 two-pass, both passes grouped now)
    a = generate.clustered(200_000, 200_000, 32, spread=512,
                           dtype=np.float32, seed=9)
    h = create_handle(a, method=Method.CSR5)
    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal(a.n).astype(np.float32))
    y = np.asarray(h._bound(x))
    g = spmv_golden(a.astype(np.float64), np.asarray(x, np.float64))
    r = time_spmv_chain(h._bound, x, iters=10, k=8, repeats=2)
    print(json.dumps({
        "cfg": "clustered200k_csr5_v2w", "rmse": rmse(y, g),
        "gflops": round(2 * a.nnz / r["inclusive"] / 1e9, 2),
        "gflops_marginal": round(2 * a.nnz / r["marginal"] / 1e9, 2),
        "was_round1": "9.4 ms/iter (v1 one-tile reduce)"}), flush=True)

    # big-n SELL-8W → v2w route (n > V2_MAX_N)
    b = generate.clustered(2_500_000, 2_500_000, 16, spread=600,
                           dtype=np.float32, seed=10)
    hb = create_handle(b, method=Method.SELL_C_SIGMA)
    assert "sell8w_v2w" in hb.plan, sorted(hb.plan)
    xb = jnp.asarray(np.random.default_rng(1)
                     .standard_normal(b.n).astype(np.float32))
    yb = np.asarray(hb._bound(xb))
    gb = spmv_golden(b.astype(np.float64), np.asarray(xb, np.float64))
    rb = time_spmv_chain(hb._bound, xb, iters=10, k=8, repeats=2)
    print(json.dumps({
        "cfg": "clustered2.5m_sell8w_v2w", "nnz": b.nnz,
        "rel": float(np.abs(yb - gb).max() / np.abs(gb).max()),
        "value_mode": hb.plan.get("value_mode"),
        "gflops": round(2 * b.nnz / rb["inclusive"] / 1e9, 2),
        "gflops_marginal": round(2 * b.nnz / rb["marginal"] / 1e9, 2)}),
        flush=True)


if __name__ == "__main__":
    main()
