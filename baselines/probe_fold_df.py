"""Probe: the f64 hybrid fold combiner.

powerlaw100k_f64 decomposition (baselines/probe_df_costs.out): dense part
0.364 ms + sparse part 0.271 ms but the combined bound costs 1.554 ms —
the ~0.92 ms gap is the fold `f2(x).at[fr].add(f1(x))` in f64 (an
f64 scatter-add; in f32 the identical structure costs ~0).  Times fold
variants on-chip to pick the combiner:

  A  current: y.at[fr].add(d)                       (unsorted, add)
  G  sorted+unique flags: y.at[fr_s].add(d[o], unique+sorted)
  S  scatter-SET into a zero plane + vector add (fr unique)
  S2 two f32 scatter-sets (hi/lo planes) + f64 adds  (the exact-df plan)
  N  no fold (lower bound, wrong result)

Run on the TPU:  python baselines/probe_fold_df.py
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
from spmv_tpu.handle import _make_bound                       # noqa: E402
from spmv_tpu.types import CsrMatrix                          # noqa: E402
from spmv_tpu.bench.timing import time_spmv_chain             # noqa: E402
from spmv_tpu.io import generate                              # noqa: E402


def main():
    print("jax backend:", jax.default_backend())
    a32 = generate.power_law(100_000, 100_000, 40 * 100_000,
                             dtype=np.float32, seed=2)
    vals = np.random.default_rng(7).standard_normal(a32.nnz)
    a = CsrMatrix(a32.m, a32.n, a32.rowptr, a32.colidx, vals)
    h = create_handle(a, method=Method.AUTO)
    p = h.plan
    assert "hybrid" in p, list(p)
    pd, psp = p["hybrid"]
    fr = pd["fold_rows"]
    k = int(fr.shape[0])
    print(f"heavy rows k={k}, m={a.m}")
    f1 = _make_bound(h.method, pd, pd.get("m_rows", a.m))
    f2 = _make_bound(h.method, psp, a.m)

    o = np.argsort(np.asarray(fr))
    fr_s = jnp.asarray(np.asarray(fr)[o])
    oj = jnp.asarray(o)

    def v_A(x):
        return f2(x).at[fr].add(f1(x))

    def v_G(x):
        return f2(x).at[fr_s].add(f1(x)[oj], unique_indices=True,
                                  indices_are_sorted=True)

    def v_S(x):
        fold = jnp.zeros(a.m, jnp.float64).at[fr_s].set(
            f1(x)[oj], unique_indices=True, indices_are_sorted=True)
        return f2(x) + fold

    def v_S2(x):
        d = f1(x)
        dh = d.astype(jnp.float32)
        dl = (d - dh.astype(jnp.float64)).astype(jnp.float32)
        z = jnp.zeros(a.m, jnp.float32)
        fh = z.at[fr_s].set(dh[oj], unique_indices=True,
                            indices_are_sorted=True)
        fl = z.at[fr_s].set(dl[oj], unique_indices=True,
                            indices_are_sorted=True)
        return f2(x) + fh.astype(jnp.float64) + fl.astype(jnp.float64)

    def v_N(x):
        return f2(x) + jnp.sum(f1(x)) * 1e-300   # keep f1 live, no fold

    x = np.random.default_rng(0).standard_normal(a.n)
    xj = jnp.asarray(x)
    # correctness spot-check for the exact variants
    yA = np.asarray(v_A(xj))
    for nm, fn in (("G", v_G), ("S", v_S), ("S2", v_S2)):
        yv = np.asarray(fn(xj))
        rel = np.abs(yv - yA).max() / np.abs(yA).max()
        print(f"variant {nm}: maxrel vs A = {rel:.2e}")
        assert rel < 1e-9, (nm, rel)

    for w in range(2):
        print(f"--- window {w} ---")
        for nm, fn in (("A", v_A), ("G", v_G), ("S", v_S), ("S2", v_S2),
                       ("N", v_N)):
            r = time_spmv_chain(fn, xj, iters=10, k=32, repeats=2)
            print(f"  {nm}: incl {r['inclusive']*1e3:.3f} ms "
                  f"({2*a.nnz/r['inclusive']/1e9:.2f} GF/s) "
                  f"marg {r['marginal']*1e3:.3f} ms", flush=True)
        if w == 0:
            time.sleep(8)


if __name__ == "__main__":
    main()
