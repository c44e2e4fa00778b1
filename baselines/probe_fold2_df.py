"""Probe round 2: shaving the f64 hybrid fold below variant S2.

S2 (two f32 scatter-sets, probe_fold_df.out) = 0.80 ms marg vs the
0.62 ms no-fold floor.  Candidates:

  S2  reference point from round 1
  S4  ONE f32 scatter: concat(dh[o], dl[o]) into a (2m,) plane at
      indices concat(fr_s, fr_s+m) — still sorted+unique — then
      y + z[:m].f64 + z[m:].f64
  F   binary near-diagonal 8W fold kernel per plane (graph-plan style):
      pre-gather planes into fr-sorted order, F nnz at (fr_s[i], i)
      is column-monotone → ~1 tile per 128-row slice

Run on the TPU:  python baselines/probe_fold2_df.py
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
    pd, psp = h.plan["hybrid"]
    fr = np.asarray(pd["fold_rows"])
    k = len(fr)
    m = a.m
    print(f"heavy rows k={k}, m={m}")
    f1 = _make_bound(h.method, pd, pd.get("m_rows", m))
    f2 = _make_bound(h.method, psp, m)

    o = np.argsort(fr)
    fr_s = fr[o]
    oj = jnp.asarray(o)
    idx2 = jnp.asarray(np.concatenate([fr_s, fr_s + m]))
    frs_j = jnp.asarray(fr_s)

    def v_S2(x):
        d = f1(x)
        dh = d.astype(jnp.float32)
        dl = (d - dh.astype(jnp.float64)).astype(jnp.float32)
        z = jnp.zeros(m, jnp.float32)
        fh = z.at[frs_j].set(dh[oj], unique_indices=True,
                             indices_are_sorted=True)
        fl = z.at[frs_j].set(dl[oj], unique_indices=True,
                             indices_are_sorted=True)
        return f2(x) + fh.astype(jnp.float64) + fl.astype(jnp.float64)

    def v_S4(x):
        d = f1(x)[oj]
        dh = d.astype(jnp.float32)
        dl = (d - dh.astype(jnp.float64)).astype(jnp.float32)
        z = jnp.zeros(2 * m, jnp.float32).at[idx2].set(
            jnp.concatenate([dh, dl]), unique_indices=True,
            indices_are_sorted=True)
        return (f2(x) + z[:m].astype(jnp.float64)
                + z[m:].astype(jnp.float64))

    # F: binary near-diagonal fold kernel (graph-plan machinery)
    from spmv_tpu.formats import sell8w as sell8w_fmt
    f_mat = CsrMatrix.from_coo(
        m, k, fr_s.astype(np.int64), np.arange(k, dtype=np.int64),
        np.ones(k, dtype=np.float32), sum_duplicates=False)
    packed_f = sell8w_fmt.pack_sell8w(f_mat, max_pad_ratio=1e9)
    v2f = sell8w_fmt.plan_v2(packed_f)
    print(f"fold kernel: ntiles={packed_f.ntiles} vm={v2f.value_mode}")
    fold_plan = {"sell8w": packed_f, "sell8w_v2": v2f,
                 "pad_ratio": packed_f.pad_ratio,
                 "value_mode": v2f.value_mode}
    fold_fn = _make_bound(h.method, fold_plan, m)

    def v_F(x):
        d = f1(x)[oj]
        dh = d.astype(jnp.float32)
        dl = (d - dh.astype(jnp.float64)).astype(jnp.float32)
        return (f2(x) + fold_fn(dh).astype(jnp.float64)
                + fold_fn(dl).astype(jnp.float64))

    x = np.random.default_rng(0).standard_normal(a.n)
    xj = jnp.asarray(x)
    yA = np.asarray(f2(xj).at[pd["fold_rows"]].add(f1(xj)))
    for nm, fn in (("S2", v_S2), ("S4", v_S4), ("F", v_F)):
        yv = np.asarray(fn(xj))
        rel = np.abs(yv - yA).max() / np.abs(yA).max()
        print(f"variant {nm}: maxrel vs A = {rel:.2e}")
        assert rel < 1e-9, (nm, rel)

    for w in range(2):
        print(f"--- window {w} ---")
        for nm, fn in (("S2", v_S2), ("S4", v_S4), ("F", v_F)):
            r = time_spmv_chain(fn, xj, iters=10, k=32, repeats=2)
            print(f"  {nm}: incl {r['inclusive']*1e3:.3f} ms "
                  f"({2*a.nnz/r['inclusive']/1e9:.2f} GF/s) "
                  f"marg {r['marginal']*1e3:.3f} ms", flush=True)
        if w == 0:
            time.sleep(8)


if __name__ == "__main__":
    main()
