"""On-chip decomposition of powerlaw100k_f64 (the round-3 loser, 0.49x)
and df per-tile cost calibration.

For each config: build the AUTO handle, print the realized plan (parts,
tile counts, nw, value modes, straggler size), then co-time the full
bound and each hybrid part separately — per-tile ns for the df kernels
fall straight out.  The f32 twin is co-timed in the same window so the
df/f32 ratios are throttle-independent (PERFNOTES.md: never trust a
single absolute number).

Run on the TPU:  python baselines/probe_df_costs.py
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


def _f64(a, seed=7):
    vals = np.random.default_rng(seed).standard_normal(a.nnz)
    return CsrMatrix(a.m, a.n, a.rowptr, a.colidx, vals)


def _plan_summary(p, indent="  "):
    out = []
    if "hybrid" in p:
        pd, psp = p["hybrid"]
        out.append(f"{indent}hybrid dense: " + _plan_summary(pd, ""))
        out.append(f"{indent}hybrid sparse: " + _plan_summary(psp, ""))
        return "\n".join(out)
    bits = []
    for k in ("sell8w", "sell8d"):
        if k in p:
            pk = p[k]
            bits.append(f"{k} ntiles={pk.ntiles} "
                        f"vm={getattr(pk, 'value_mode', '?')}"
                        + (f" nw={pk.nw}" if hasattr(pk, "nw") else ""))
    for k in ("sell8w_v2", "sell8w_v2w"):
        if k in p:
            bits.append(f"{k} vm={p[k].value_mode}")
    if "rest_rows" in p:
        bits.append(f"rest={p['rest_rows'].shape[0]}")
    if "mega_sub_rows" in p:
        bits.append(f"megasub={p['mega_sub_rows'].shape[0]}")
    return indent + ", ".join(bits)


def _time(fn, xj, label, nnz):
    r = time_spmv_chain(fn, xj, iters=10, k=32, repeats=2)
    ms = r["inclusive"] * 1e3
    mg = r["marginal"] * 1e3
    print(f"  {label}: incl {ms:.3f} ms ({2*nnz/r['inclusive']/1e9:.2f} "
          f"GF/s) marg {mg:.3f} ms", flush=True)
    return r["marginal"]


def probe(name, a, parts=True):
    t0 = time.perf_counter()
    h = create_handle(a, method=Method.AUTO)
    print(f"{name}: predeal {(time.perf_counter()-t0)*1e3:.0f} ms")
    print(_plan_summary(h.plan))
    x = np.random.default_rng(0).standard_normal(a.n).astype(
        np.asarray(a.vals).dtype)
    xj = jnp.asarray(x)
    tm = _time(h._bound, xj, "full", a.nnz)
    res = {"full": tm}
    if parts and "hybrid" in h.plan:
        pd, psp = h.plan["hybrid"]
        m2 = pd.get("m_rows", a.m)
        fd = _make_bound(h.method, pd, m2)
        fs = _make_bound(h.method, psp, a.m)
        res["dense"] = _time(fd, xj, "dense part", a.nnz)
        res["sparse"] = _time(fs, xj, "sparse part", a.nnz)
        nt_d = pd["sell8w"].ntiles
        nt_s = psp["sell8d"].ntiles
        print(f"  per-tile: dense {res['dense']*1e9/max(nt_d,1):.1f} "
              f"ns/tile ({nt_d} tiles), sparse "
              f"{res['sparse']*1e9/max(nt_s,1):.1f} ns/tile "
              f"({nt_s} tiles)  [marginal per-SpMV]", flush=True)
    return res


def main():
    print("jax backend:", jax.default_backend())
    pl32 = generate.power_law(100_000, 100_000, 40 * 100_000,
                              dtype=np.float32, seed=2)
    pl64 = _f64(pl32)
    un32 = generate.random_uniform(100_000, 100_000, 40,
                                   dtype=np.float32, seed=42)
    un64 = _f64(un32)
    for w in range(2):
        print(f"--- window {w} ---")
        probe("powerlaw100k_f32", pl32)
        probe("powerlaw100k_f64", pl64)
        probe("uniform100k_f64", un64)
        if w == 0:
            time.sleep(8)


if __name__ == "__main__":
    main()
