"""Probe 5: characterize the ~2.9 ms per-dispatch floor + production v2 path.

1. production clustered200k via create_handle (correctness + latency)
2. chain-4: fori body applies the SpMV 4x (dependent) — is the floor a
   per-iteration bubble (chain-4 ~ floor + 3 x stream) or per-call?
3. tiny pallas kernel (1 tile) and tiny XLA op — what pays the floor?
4. banded4m DIA chain-4 — same question for the headline config.
"""
import json

from spmv_tpu.utils import enable_compile_cache
enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from spmv_tpu.bench.timing import time_op_samples, time_spmv_samples
from spmv_tpu.io import generate
from spmv_tpu import create_handle, Method
from spmv_tpu.oracle import spmv_golden, rmse


def chain_time(fn, x0, k):
    def step(x):
        y = x
        for _ in range(k):
            y = fn(y)
            scale = jnp.exp2(-jnp.ceil(jnp.log2(jnp.maximum(
                jnp.max(jnp.abs(y)), 1e-30))))
            y = y * scale
        return y
    dts = time_op_samples(step, x0, iters=10, repeats=2)
    return min(dts) / k, [round(d * 1e3, 3) for d in dts]


def main():
    a = generate.clustered(200_000, 200_000, 32, spread=512,
                           dtype=np.float32, seed=9)
    h = create_handle(a, method=Method.SELL_C_SIGMA)
    print(json.dumps({"plan": sorted(h.plan.keys()),
                      "value_mode": h.plan.get("value_mode"),
                      "pad": round(h.plan["pad_ratio"], 2)}), flush=True)
    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal(a.n).astype(np.float32))
    y = np.asarray(h._bound(x))
    g = spmv_golden(a.astype(np.float64),
                    np.asarray(x).astype(np.float64))
    print(json.dumps({"check": "clustered200k v2", "rmse": rmse(y, g),
                      "rel": float(np.abs(y - g).max()
                                   / np.abs(g).max())}), flush=True)

    dt1, s1 = chain_time(h._bound, x, 1)
    dt4, s4 = chain_time(h._bound, x, 4)
    print(json.dumps({"cfg": "clustered200k_v2", "per_spmv_ms_k1":
                      round(dt1 * 1e3, 3), "per_spmv_ms_k4":
                      round(dt4 * 1e3, 3),
                      "gflops_k1": round(2 * a.nnz / dt1 / 1e9, 2),
                      "gflops_k4": round(2 * a.nnz / dt4 / 1e9, 2),
                      "all_k1": s1, "all_k4": s4}), flush=True)

    # tiny ops: what pays the floor?
    def tiny_kern(v_ref, o_ref):
        o_ref[:] = v_ref[:] * 2.0

    @jax.jit
    def tiny_pallas(v):
        return pl.pallas_call(
            tiny_kern,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        )(v)

    dts = time_op_samples(lambda v: tiny_pallas(v) * 0.5,
                          jnp.ones((8, 128), jnp.float32), iters=10,
                          repeats=2)
    print(json.dumps({"tiny_pallas_ms": round(min(dts) * 1e3, 3)}),
          flush=True)

    dts = time_op_samples(lambda v: v * 0.5 + jnp.max(v) * 1e-9,
                          jnp.ones((8, 128), jnp.float32), iters=10,
                          repeats=2)
    print(json.dumps({"tiny_xla_ms": round(min(dts) * 1e3, 3)}), flush=True)

    ab = generate.banded(4_000_000, 4_000_000, 4, dtype=np.float32, seed=7)
    hb = create_handle(ab, method=Method.AUTO)
    xb = jnp.asarray(np.random.default_rng(1)
                     .standard_normal(ab.n).astype(np.float32))
    dt1, s1 = chain_time(hb._bound, xb, 1)
    dt4, s4 = chain_time(hb._bound, xb, 4)
    print(json.dumps({"cfg": "banded4m_dia", "method": hb.method_name,
                      "per_spmv_ms_k1": round(dt1 * 1e3, 3),
                      "per_spmv_ms_k4": round(dt4 * 1e3, 3),
                      "gflops_k1": round(2 * ab.nnz / dt1 / 1e9, 2),
                      "gflops_k4": round(2 * ab.nnz / dt4 / 1e9, 2),
                      "all_k1": s1, "all_k4": s4}), flush=True)


if __name__ == "__main__":
    main()
