"""Round-4 compute-bound probes: FMA fusion, df16 nw sweep, hybrid split.

The df16 on-chip probe (probe_df16_onchip.out) showed df and df16 run at
the SAME ~44 ns/tile — the slot df kernel is COMPUTE-bound in that window
(32 gathers + 16 selects + ~22 EFT ops per slot at nw=8), not stream-bound.
Three probes, one TPU session:

1. **FMA exactness**: if Mosaic lowers ``a*b - p`` (p = fl(a*b) fed as an
   input) to a fused multiply-add, the result is EXACTLY the Dekker error
   term and two_product drops from 10 ops to 2.  If the target has no FMA,
   the expression is exactly 0.  Either way the probe is decisive.
2. **df16 slot nw sweep** {1,2,4,8} on uniform100k f64: per-tile cost vs
   pad — the df gather count doubles the f32 kernel's, so the optimal nw
   may be narrower than f32's; recalibrates cost_tables' df16 row.
3. **powerlaw hybrid decomposition**: dense-8W-df16 part, light-8D-df16
   part, and the fold, chain-timed separately through the plan's own
   bound functions — locates the 0.99x-vs-reference residual.

Run on the TPU:  python baselines/probe_r4_compute.py
"""

import functools
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
from jax.experimental import pallas as pl                     # noqa: E402

from spmv_tpu import create_handle, Method                    # noqa: E402
from spmv_tpu.bench.timing import time_spmv_chain             # noqa: E402
from spmv_tpu.formats.sell8d import pack_sell8d               # noqa: E402
from spmv_tpu.io import generate                              # noqa: E402
from spmv_tpu.ops.pallas_sell import build_sell8d_fn          # noqa: E402
from spmv_tpu.oracle import spmv_golden                       # noqa: E402
from spmv_tpu.types import CsrMatrix                          # noqa: E402


def probe_fma():
    def kern(a_ref, b_ref, p_ref, e_ref):
        e_ref[:] = a_ref[:] * b_ref[:] - p_ref[:]

    rng = np.random.default_rng(0)
    a = rng.standard_normal((8, 128)).astype(np.float32)
    b = rng.standard_normal((8, 128)).astype(np.float32)
    p = a * b                                       # fl(a*b), numpy f32
    with jax.enable_x64(False):
        e = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        )(jnp.asarray(a), jnp.asarray(b), jnp.asarray(p))
    e = np.asarray(jax.block_until_ready(e)).astype(np.float64)
    true_err = (a.astype(np.float64) * b.astype(np.float64)
                - p.astype(np.float64))
    exact = np.array_equal(e, true_err)
    zero = not e.any()
    print(f"FMA probe: fused-exact={exact} all-zero={zero} "
          f"max|e-true|={np.abs(e - true_err).max():.3e}", flush=True)
    return exact


def probe_nw_sweep():
    a32 = generate.random_uniform(100_000, 100_000, 40,
                                  dtype=np.float32, seed=42)
    vals = np.random.default_rng(7).standard_normal(a32.nnz)
    a = CsrMatrix(a32.m, a32.n, a32.rowptr, a32.colidx, vals)
    x = np.random.default_rng(3).standard_normal(a.n)
    xj = jnp.asarray(x)
    g = spmv_golden(a, x)
    fns = {}
    for nw in (1, 2, 4, 8):
        p, rest = pack_sell8d(a, max_pad_ratio=32.0, nw=nw,
                              max_spill=0.05)
        fn = build_sell8d_fn(p)
        y = np.asarray(jax.block_until_ready(fn(xj)))
        if rest is not None:
            np.add.at(y, np.asarray(rest[0]),
                      np.asarray(rest[2]) * x[np.asarray(rest[1])])
        rel = np.abs(y - g).max() / np.abs(g).max()
        assert rel < 1e-11, (nw, rel)
        fns[nw] = (fn, p.ntiles, p.pad_ratio)
        print(f"nw={nw}: ntiles={p.ntiles} pad={p.pad_ratio:.2f} "
              f"mode={p.value_mode} rel={rel:.1e}", flush=True)
    for w in range(2):
        line = [f"w{w}:"]
        for nw, (fn, ntiles, _pad) in fns.items():
            r = time_spmv_chain(fn, xj, iters=10, k=32, repeats=2)
            line.append(f"nw{nw} {r['marginal']*1e3:.3f}ms "
                        f"({r['marginal']/ntiles*1e9:.1f}ns/t)")
        print("  " + " | ".join(line), flush=True)
        if w == 0:
            time.sleep(8)


def probe_hybrid_split():
    a32 = generate.power_law(100_000, 100_000, 40 * 100_000,
                             dtype=np.float32, seed=2)
    vals = np.random.default_rng(7).standard_normal(a32.nnz)
    a = CsrMatrix(a32.m, a32.n, a32.rowptr, a32.colidx, vals)
    h = create_handle(a, method=Method.AUTO)
    print(f"powerlaw100k_f64 plan: {list(h.plan)} "
          f"value_mode={h.plan.get('value_mode')}", flush=True)
    if "hybrid" not in h.plan:
        print("no hybrid — skip split probe")
        return
    from spmv_tpu.handle import _make_bound
    from spmv_tpu.ops.pallas_sell import build_sell8w_v2_fn
    pd, psp = h.plan["hybrid"]
    x = np.random.default_rng(0).standard_normal(a.n)
    xj = jnp.asarray(x)
    light_fn = _make_bound(Method.SELL_C_SIGMA, psp, a.m)
    parts = {"light8d": light_fn, "full": h._bound}
    if "fold8w" in pd:
        dense_planes = build_sell8w_v2_fn(pd["sell8w_v2"], planes=True)
        fold_fn = _make_bound(Method.SELL_C_SIGMA, pd["fold8w"], a.m)
        o2 = pd["fold_order2"]

        def dense_only(xv):
            yh, yl = dense_planes(xv)
            return yh

        def dense_plus_fold(xv):
            yh, yl = dense_planes(xv)
            return fold_fn(jnp.concatenate([yh, yl])[o2])

        parts["dense8w"] = dense_only
        parts["dense+fold"] = dense_plus_fold
    nnz = a.nnz
    for w in range(2):
        for name, fn in parts.items():
            r = time_spmv_chain(fn, xj, iters=10, k=32, repeats=2)
            print(f"  w{w} {name}: incl {r['inclusive']*1e3:.3f} ms "
                  f"marg {r['marginal']*1e3:.3f} ms "
                  f"({2*nnz/r['marginal']/1e9:.2f} GF/s-marg)", flush=True)
        if w == 0:
            time.sleep(8)


def main():
    print("backend:", jax.default_backend(), flush=True)
    probe_fma()
    probe_nw_sweep()
    probe_hybrid_split()
    print("R4 COMPUTE PROBE OK")


if __name__ == "__main__":
    main()
