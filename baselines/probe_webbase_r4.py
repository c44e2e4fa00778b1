"""Round-4 webbase decomposition + rest-cost probe.

BENCH shows webbase1m at a thin 1.13-1.14x; the round-4 pack changes
(pair-level spill + adaptive g) cut the light part's tile stream 25.4k →
~20k tiles.  This probe decomposes the graph plan on-chip — light part
(with/without its rest straggler stream), heavy part, fold, x_ext — and
measures the f64 rest-stream cost suspected in the powerlaw hybrid
(light modeled 160 µs vs 275 measured; rest runs an m-length f64
segment-sum, the known software-f64 path).

Run on the TPU:  python baselines/probe_webbase_r4.py
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
from spmv_tpu.handle import _make_bound                       # noqa: E402
from spmv_tpu.io import generate                              # noqa: E402
from spmv_tpu.oracle import spmv_golden                       # noqa: E402
from spmv_tpu.types import CsrMatrix                          # noqa: E402


def probe_webbase():
    a = generate.webbase_like(1_000_000, 1_000_000, 3_100_000,
                              dtype=np.float32, seed=11)
    t0 = time.perf_counter()
    h = create_handle(a, method=Method.AUTO)
    predeal = (time.perf_counter() - t0) * 1e3
    print(f"webbase1m: {h} predeal {predeal:.0f} ms plan={list(h.plan)}",
          flush=True)
    x = np.random.default_rng(0).standard_normal(a.n).astype(np.float32)
    xj = jnp.asarray(x)
    y = np.asarray(jax.block_until_ready(h(xj))).astype(np.float64)
    g = spmv_golden(a.astype(np.float64), x.astype(np.float64))
    rel = np.abs(y - g).max() / max(np.abs(g).max(), 1e-30)
    print(f"webbase1m: rel err {rel:.2e}", flush=True)
    assert rel < 2e-4, rel

    parts = {"full": h._bound}
    p = h.plan
    if "graph" in p:
        hub = p.get("hub_cols")
        light_fn = _make_bound(h.method, p["light"], a.m)
        if hub is not None:
            parts["light+xext"] = lambda xv: light_fn(
                jnp.concatenate([xv, xv[hub]]))
        else:
            parts["light"] = light_fn
        if "heavy" in p:
            m2 = p["heavy"]["sell8w"].m
            heavy_fn = _make_bound(h.method, p["heavy"], m2)
            if hub is not None:
                parts["heavy+xext"] = lambda xv: heavy_fn(
                    jnp.concatenate([xv, xv[hub]]))
            else:
                parts["heavy"] = heavy_fn
            if "fold8w" in p:
                fold_fn = _make_bound(h.method, p["fold8w"], a.m)
                parts["heavy+fold"] = lambda xv: fold_fn(heavy_fn(
                    jnp.concatenate([xv, xv[hub]]) if hub is not None
                    else xv))
        # light without its rest stream (isolates the straggler cost)
        pl = dict(p["light"])
        had_rest = pl.pop("rest_rows", None) is not None
        pl.pop("rest_cols", None)
        pl.pop("rest_vals", None)
        if had_rest:
            light_inner = _make_bound(h.method, pl, a.m)
            if hub is not None:
                parts["light-norest"] = lambda xv: light_inner(
                    jnp.concatenate([xv, xv[hub]]))
            else:
                parts["light-norest"] = light_inner
    nnz = a.nnz
    for w in range(2):
        for name, fn in parts.items():
            r = time_spmv_chain(fn, xj, iters=8, k=32, repeats=2)
            print(f"  w{w} {name}: incl {r['inclusive']*1e3:.3f} ms "
                  f"marg {r['marginal']*1e3:.3f} ms "
                  f"({2*nnz/r['inclusive']/1e9:.2f} GF/s-incl)",
                  flush=True)
        if w == 0:
            time.sleep(8)


def probe_powerlaw_rest():
    a32 = generate.power_law(100_000, 100_000, 40 * 100_000,
                             dtype=np.float32, seed=2)
    vals = np.random.default_rng(7).standard_normal(a32.nnz)
    a = CsrMatrix(a32.m, a32.n, a32.rowptr, a32.colidx, vals)
    h = create_handle(a, method=Method.AUTO)
    print(f"powerlaw100k_f64 plan: {list(h.plan)}", flush=True)
    if "hybrid" not in h.plan:
        return
    _pd, psp = h.plan["hybrid"]
    x = np.random.default_rng(0).standard_normal(a.n)
    xj = jnp.asarray(x)
    variants = {"light-bound": _make_bound(h.method, psp, a.m)}
    if "rest_rows" in psp:
        pl = dict(psp)
        pl.pop("rest_rows")
        pl.pop("rest_cols", None)
        pl.pop("rest_vals", None)
        variants["light-norest"] = _make_bound(h.method, pl, a.m)
        print(f"  rest stream: {len(np.asarray(psp['rest_rows']))} nnz "
              f"(f64)", flush=True)
    for w in range(2):
        line = [f"w{w}:"]
        for name, fn in variants.items():
            r = time_spmv_chain(fn, xj, iters=10, k=32, repeats=2)
            line.append(f"{name} marg {r['marginal']*1e3:.3f} ms")
        print("  " + " | ".join(line), flush=True)
        if w == 0:
            time.sleep(8)


def main():
    print("backend:", jax.default_backend(), flush=True)
    probe_webbase()
    probe_powerlaw_rest()
    print("WEBBASE R4 PROBE OK")


if __name__ == "__main__":
    main()
