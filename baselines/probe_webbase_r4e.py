"""Webbase decisive decomposition — kernel-isolated g/fold variants.

Earlier decompositions don't add up: parts (heavy 0.44 + light 0.98 +
"xext 0.00") = 1.42 ms vs full 1.78 ms.  The xext measurement was bogus:
``concat(x, x[hub])[:n]`` folds to identity under XLA.  This probe
times the light kernel with CONSTANT glue (output re-padded with a
slice of the input, same for every variant, so differences are
kernel-only), the fold-entry cost (nofold pack), g in {8,16}, and full
plans: current, light-g16, heavy-straggler-split.

Run on the TPU:  python baselines/probe_webbase_r4e.py
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
from spmv_tpu.handle import _make_bound, _append_fold_entries  # noqa: E402
from spmv_tpu.io import generate                              # noqa: E402
from spmv_tpu.formats import graph as graph_fmt               # noqa: E402
from spmv_tpu.formats import sell8w as w_fmt                  # noqa: E402
from spmv_tpu.formats import sell8d as d_fmt                  # noqa: E402


def bench(tag, fn, x0, nnz):
    r = time_spmv_chain(fn, x0, iters=8, k=32, repeats=2)
    print(f"  {tag}: incl {r['inclusive']*1e3:.3f} ms "
          f"marg {r['marginal']*1e3:.3f} ms "
          f"({2*nnz/r['inclusive']/1e9:.2f} GF/s-incl)", flush=True)
    return r["marginal"]


def main():
    print("backend:", jax.default_backend(), flush=True)
    a = generate.webbase_like(1_000_000, 1_000_000, 3_100_000,
                              dtype=np.float32, seed=11)
    h = create_handle(a, method=Method.AUTO)
    p = h.plan
    hub = p["hub_cols"]
    k_hub = len(np.asarray(hub))
    fold_k = p["fold_k"]
    n_ext2 = a.n + k_hub + fold_k
    hv = p["heavy"]["sell8w_v2"]
    print(f"plan: light tiles={p['light']['sell8d'].ntiles} "
          f"g={p['light']['sell8d'].g} nw={p['light']['sell8d'].nw} "
          f"mode={p['light']['sell8d'].value_mode} "
          f"heavy tiles={hv.ntiles} hmode={hv.value_mode} "
          f"rest={len(np.asarray(p['light'].get('rest_rows', [])))} "
          f"hubs={k_hub} fold_k={fold_k}", flush=True)

    # repacks (host): light+fold at g=16, light nofold at g=8
    prep = graph_fmt.prepare_graph_split(a)
    lm = _append_fold_entries(prep.light, prep.fold_rows, np.float32)
    pk16, rest16 = d_fmt.pack_sell8d(lm, max_pad_ratio=48.0,
                                     nw=prep.nw, g=16)
    pk8nf, rest8nf = d_fmt.pack_sell8d(prep.light, max_pad_ratio=48.0,
                                       nw=prep.nw, g=8)
    print(f"repacks: g16 tiles={pk16.ntiles} "
          f"rest={0 if rest16 is None else len(rest16[0])} | "
          f"nofold-g8 tiles={pk8nf.ntiles} "
          f"rest={0 if rest8nf is None else len(rest8nf[0])}", flush=True)

    # light kernels WITHOUT rest streams, constant glue:
    # chain over v of length n_ext2; step = concat(light(v), v[a.n:])
    l8 = _make_bound(h.method, {"sell8d": p["light"]["sell8d"]}, a.m)
    l16 = _make_bound(h.method, {"sell8d": pk16}, a.m)
    lnf = _make_bound(h.method, {"sell8d": pk8nf}, a.m)
    x = np.random.default_rng(0).standard_normal(a.n).astype(np.float32)
    v0 = jnp.asarray(np.concatenate(
        [x, np.zeros(n_ext2 - a.n, np.float32)]))

    def step_l8(v):
        return jnp.concatenate([l8(v), v[a.n:]])

    def step_l16(v):
        return jnp.concatenate([l16(v), v[a.n:]])

    def step_lnf(v):
        return jnp.concatenate([lnf(v[: a.n + k_hub]), v[a.n:]])

    def step_glue(v):
        # the glue alone: same output concat over an elementwise op
        return jnp.concatenate([v[: a.m] * jnp.float32(1.0000001),
                                v[a.n:]])

    nnz = a.nnz
    for w in range(2):
        print(f"--- window {w} ---", flush=True)
        bench("glue-only", step_glue, v0, nnz)
        t8 = bench("light g8 +fold", step_l8, v0, nnz)
        t16 = bench("light g16+fold", step_l16, v0, nnz)
        tnf = bench("light g8 nofold", step_lnf, v0, nnz)
        print(f"  per-tile: g8 {t8*1e9/p['light']['sell8d'].ntiles:.1f} "
              f"g16 {t16*1e9/pk16.ntiles:.1f} "
              f"nofold {tnf*1e9/pk8nf.ntiles:.1f} ns", flush=True)
        # full plans
        xj = jnp.asarray(x)
        bench("FULL current", h._bound, xj, nnz)
        # full with g16 light (rest of plan identical)
        p16 = dict(p)
        pl16 = dict(p["light"])
        pl16["sell8d"] = pk16
        p16["light"] = pl16
        bench("FULL light-g16", _make_bound(h.method, p16, a.m), xj, nnz)
        # full with heavy straggler split: repack heavy, stragglers ride
        # the rest stream (mapped to original rows)
        hm2, hrest, _ = w_fmt.split_stragglers(prep.heavy)
        pkh2 = w_fmt.pack_sell8w(hm2, max_pad_ratio=48.0)
        v2h2 = w_fmt.plan_v2(pkh2)
        psplit = dict(p)
        psplit["heavy"] = {"sell8w": pkh2, "sell8w_v2": v2h2,
                           "pad_ratio": pkh2.pad_ratio,
                           "value_mode": v2h2.value_mode}
        plsp = dict(p["light"])
        hr_rows = prep.fold_rows[np.asarray(hrest[0])]
        rr = np.concatenate([np.asarray(p["light"]["rest_rows"]),
                             hr_rows.astype(np.int64)])
        rc = np.concatenate([np.asarray(p["light"]["rest_cols"]),
                             np.asarray(hrest[1], dtype=np.int64)])
        rv = np.concatenate([np.asarray(p["light"]["rest_vals"]),
                             np.asarray(hrest[2], dtype=np.float32)])
        plsp["rest_rows"] = jax.device_put(rr.astype(np.int32))
        plsp["rest_cols"] = jax.device_put(rc.astype(np.int32))
        plsp["rest_vals"] = jax.device_put(rv)
        psplit["light"] = plsp
        print(f"  [split: heavy tiles {hv.ntiles} -> {v2h2.ntiles}, "
              f"rest +{len(hr_rows)}]", flush=True)
        bench("FULL heavy-split", _make_bound(h.method, psplit, a.m),
              xj, nnz)
        if w == 0:
            time.sleep(8)
    print("WEBBASE R4E OK")


if __name__ == "__main__":
    main()
