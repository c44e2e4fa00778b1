"""Round-2 probe: where do the non-banded configs stand on the chip today?

Co-times a pure streaming op in the same windows so the throttle state is
known.  Prints one JSON line per measurement.
"""
import json
import time

from spmv_tpu.utils import enable_compile_cache
enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np

from spmv_tpu import create_handle, Method
from spmv_tpu.bench.timing import time_spmv_samples, time_op_samples
from spmv_tpu.io import generate


def stream_rate_gbs(nbytes=128 * 1024 * 1024):
    """Marginal streaming bandwidth right now (read+write f32 saxpy)."""
    n = nbytes // 4
    x = jnp.ones((n,), jnp.float32)

    def step(x):
        return x * 1.0000001 + 1e-9

    dts = time_op_samples(step, x, iters=10, repeats=2)
    dt = min(dts)
    return 2 * n * 4 / dt / 1e9


def probe(name, a, method):
    t0 = time.perf_counter()
    h = create_handle(a, method=method)
    predeal = time.perf_counter() - t0
    x = jnp.asarray(np.random.default_rng(0).standard_normal(a.n).astype(np.float32))
    dts = time_spmv_samples(h._bound, x, iters=10, repeats=3)
    dt = min(dts)
    sr = stream_rate_gbs()
    rec = {
        "name": name, "method": h.method_name, "plan": sorted(h.plan.keys()),
        "nnz": a.nnz, "predeal_s": round(predeal, 3),
        "dt_ms": round(dt * 1e3, 3), "gflops": round(2 * a.nnz / dt / 1e9, 2),
        "costream_gbs": round(sr, 1),
        "implied_B_per_nnz": round(dt * sr * 1e9 / a.nnz, 1),
    }
    if "pad_ratio" in h.plan:
        rec["pad"] = round(h.plan["pad_ratio"], 2)
    print(json.dumps(rec), flush=True)
    return rec


def pad_estimates():
    from spmv_tpu.formats.sell8w import estimate_sell8w_tiles, WINDOW
    out = {}
    for name, gen in [
        ("clustered200k", lambda: generate.clustered(200_000, 200_000, 32, spread=512, dtype=np.float32, seed=9)),
        ("powerlaw100k", lambda: generate.power_law(100_000, 100_000, 40 * 100_000, dtype=np.float32, seed=2)),
        ("uniform100k", lambda: generate.random_uniform(100_000, 100_000, 40, dtype=np.float32, seed=42)),
    ]:
        a = gen()
        est = estimate_sell8w_tiles(a) * WINDOW / max(a.nnz, 1)
        out[name] = round(est, 2)
        # column-frequency reorder estimate (cols sorted by popularity)
        counts = np.bincount(a.colidx, minlength=a.n)
        rank = np.empty(a.n, dtype=np.int32)
        rank[np.argsort(-counts, kind="stable")] = np.arange(a.n, dtype=np.int32)
        b = type(a)(a.m, a.n, a.rowptr, rank[a.colidx], a.vals)
        est2 = estimate_sell8w_tiles(b) * WINDOW / max(a.nnz, 1)
        out[name + "+colfreq"] = round(est2, 2)
    print(json.dumps({"pad_estimates": out}), flush=True)


def main():
    print(json.dumps({"backend": jax.default_backend(),
                      "stream_gbs_now": round(stream_rate_gbs(), 1)}), flush=True)
    pad_estimates()
    a = generate.clustered(200_000, 200_000, 32, spread=512, dtype=np.float32, seed=9)
    probe("clustered200k", a, Method.SELL_C_SIGMA)
    ap = generate.power_law(100_000, 100_000, 40 * 100_000, dtype=np.float32, seed=2)
    probe("powerlaw100k", ap, Method.AUTO)
    ab = generate.banded(4_000_000, 4_000_000, 4, dtype=np.float32, seed=7)
    probe("banded4m", ab, Method.AUTO)


if __name__ == "__main__":
    main()
