"""Webbase decomposition #3 — under the x-extension fold plan.

powerlaw_f64 reached 1.23x with the same machinery; webbase sits at
0.97x (1.87 ms marg).  Decompose: hub-gather cost (x[hub] at K hubs),
light kernel (with merged fold entries), heavy kernel, rest.

Run on the TPU:  python baselines/probe_webbase_r4c.py
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
from spmv_tpu.bench.timing import time_spmv_chain, time_op    # noqa: E402
from spmv_tpu.handle import _make_bound                       # noqa: E402
from spmv_tpu.io import generate                              # noqa: E402


def main():
    print("backend:", jax.default_backend(), flush=True)
    a = generate.webbase_like(1_000_000, 1_000_000, 3_100_000,
                              dtype=np.float32, seed=11)
    h = create_handle(a, method=Method.AUTO)
    p = h.plan
    hub = p.get("hub_cols")
    k_hub = 0 if hub is None else len(np.asarray(hub))
    lp = p["light"]
    print(f"plan: light ntiles={lp['sell8d'].ntiles} g={lp['sell8d'].g} "
          f"nw={lp['sell8d'].nw} mode={lp['sell8d'].value_mode} "
          f"n={lp['sell8d'].n} "
          f"rest={len(np.asarray(lp.get('rest_rows', [])))} "
          f"hubs={k_hub} "
          f"heavy_ntiles={p['heavy']['sell8w_v2'].ntiles if 'heavy' in p else 0}",
          flush=True)
    x = np.random.default_rng(0).standard_normal(a.n).astype(np.float32)
    xj = jnp.asarray(x)

    light_fn = _make_bound(h.method, lp, a.m)
    m2 = p["heavy"]["sell8w"].m
    heavy_fn = _make_bound(h.method, p["heavy"], m2)
    yh_len = m2

    def xext_only(xv):
        # hub gather + concat alone (returns x-shaped: renormed prefix)
        return jnp.concatenate([xv, xv[hub]])[: a.n]

    def heavy_only(xv):
        return heavy_fn(jnp.concatenate([xv, xv[hub]]))

    def light_only(xv):
        # feed zeros for the fold block — isolates the light kernel
        xe = jnp.concatenate([xv, xv[hub],
                              jnp.zeros(yh_len, xv.dtype)])
        return light_fn(xe)

    parts = {"full": h._bound, "xext": xext_only, "heavy+xext": heavy_only,
             "light+xext(zeros)": light_only}
    nnz = a.nnz
    for w in range(2):
        for name, fn in parts.items():
            r = time_spmv_chain(fn, xj, iters=8, k=32, repeats=2)
            print(f"  w{w} {name}: incl {r['inclusive']*1e3:.3f} ms "
                  f"marg {r['marginal']*1e3:.3f} ms", flush=True)
        if w == 0:
            time.sleep(8)
    print("WEBBASE R4C OK")


if __name__ == "__main__":
    main()
