"""Feature tour: every major capability in one script.

Run on any backend (CPU works; TPU uses the Pallas fast paths):

    python examples/tour.py
"""

import os
import sys

# allow `python examples/<name>.py` without installing the package
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax.numpy as jnp

import spmv_tpu as st
from spmv_tpu.io import generate


def jax_backend_is_cpu() -> bool:
    import jax
    return jax.default_backend() == "cpu"


def main():
    # -- structures and the inspector ------------------------------------
    zoo = {
        "banded": generate.banded(2000, 2000, 4, dtype=np.float32),
        "clustered": generate.clustered(2000, 2000, 24, spread=300,
                                        dtype=np.float32),
        "blocky": generate.block_random(4, 4, 2, fill=0.4,
                                        dtype=np.float32),
        "scattered": generate.random_uniform(2000, 2000, 30,
                                             dtype=np.float32),
    }
    for name, a in zoo.items():
        feats = st.featurize(a)
        h = st.create_handle(a)              # Method.AUTO
        x = np.random.default_rng(0).standard_normal(a.n).astype(np.float32)
        y = np.asarray(st.spmv(h, x))
        ref = st.spmv_golden(a.astype(np.float64), x.astype(np.float64))
        err = np.abs(y - ref).max() / max(np.abs(ref).max(), 1)
        print(f"{name:10s} -> {h!r}  relerr={err:.1e}")

    # -- measurement-based tuning ----------------------------------------
    h, timings = st.tune(zoo["banded"], iters=3, repeats=1)
    print("tune picked:", h.method_name,
          {k: f"{v*1e3:.2f}ms" for k, v in timings.items()})

    # -- f64 (double-float Pallas tier on TPU; plain f64 on CPU) ----------
    a64 = generate.clustered(2000, 2000, 16, spread=250, dtype=np.float64)
    h64 = st.create_handle(a64, method=st.Method.SELL_C_SIGMA)
    x64 = np.random.default_rng(2).standard_normal(2000)
    y64 = np.asarray(st.spmv(h64, x64))
    ref64 = st.spmv_golden(a64, x64)
    print(f"f64 handle: {h64!r}  maxrel="
          f"{np.abs(y64-ref64).max()/np.abs(ref64).max():.1e}")

    # -- the scattered tier: SELL-8D slot-mode bundles ---------------------
    # (on TPU the handle routes here automatically; the format is also
    # usable directly — interpret mode makes it CPU-runnable)
    from spmv_tpu.formats.sell8d import (estimate_sell8d_auto, pack_sell8d,
                                         prepare_hybrid)
    from spmv_tpu.ops.pallas_sell import build_sell8d_fn
    asc = zoo["scattered"]
    tiles, cap, spilled, nw = estimate_sell8d_auto(asc, nw=None)
    p8d, rest = pack_sell8d(asc, max_pad_ratio=60.0, nw=nw)
    fn = build_sell8d_fn(p8d, interpret=jax_backend_is_cpu())
    x = np.random.default_rng(3).standard_normal(asc.n).astype(np.float32)
    y = np.asarray(fn(x))
    if rest is not None:
        np.add.at(y, rest[0], rest[2] * x[rest[1]])
    ref = st.spmv_golden(asc, x)
    print(f"sell8d nw={nw} pad={p8d.pad_ratio:.2f} mode={p8d.value_mode} "
          f"relerr={np.abs(y-ref).max()/np.abs(ref).max():.1e}")
    # heavy-tailed mixes split by row: heavy rows -> row mode, light -> 8D
    prep = prepare_hybrid(generate.power_law(4000, 4000, 40_000,
                                             dtype=np.float32, seed=3))
    if prep is not None:
        print(f"hybrid split: dense_frac={prep.dense_frac:.2f} "
              f"(8W tiles {prep.td} + 8D tiles {prep.ts}, nw={prep.nw})")

    # -- locality reordering ----------------------------------------------
    scramble = np.random.default_rng(1).permutation(2000)
    scrambled, _ = st.formats.reorder.reorder_symmetric(
        zoo["clustered"], scramble)
    h2 = st.create_handle(scrambled, method=st.Method.BALANCED,
                          reorder="cluster")   # label-propagation (METIS role)
    x = np.ones(2000, np.float32)
    print("reordered handle:", repr(h2), "perm set:", h2.perm is not None)

    # -- handle lifecycle: clear + re-prep (reference parity) --------------
    h2.clear()
    h2.prepare(st.Method.BALANCED_YID)
    print("re-prepped:", h2.method_name)

    # -- multi-chip (virtual mesh on CPU, real mesh on a pod) -------------
    import jax
    if len(jax.devices()) > 1 or jax.default_backend() == "cpu":
        from spmv_tpu.parallel import (build_dist_plan, dist_spmv,
                                       make_mesh_1d)
        mesh = make_mesh_1d(min(len(jax.devices()), 8))
        plan = build_dist_plan(zoo["banded"].astype(np.float64), mesh,
                               x_mode="halo")
        y = np.asarray(dist_spmv(plan, np.ones(2000)))
        print(f"dist halo spmv on {plan.ndev} device(s): y[:3] = {y[:3]}")

    # -- the roofline model ------------------------------------------------
    a = zoo["banded"]
    print("roofline @150 GB/s (csr model):",
          f"{st.utils.roofline_gflops(a.m, a.n, a.nnz, 150.0):.1f} GFLOP/s")


if __name__ == "__main__":
    main()
