"""On-chip df16 validation + calibration: the round-4 f64 stream attack.

The df kernels are stream-bound (PERFNOTES.md round-3 tables: slot df
nw=8 69 ns/tile at 10 KB/tile ≈ the ~145 GB/s co-timed stream rate), so
the int16-quantized lo plane (df16, formats/sell8w.df16_encode_lo) should
cut per-tile time by ~the byte ratio (10 → 8 KB).  This probe:

1. packs uniform100k f64 ONCE per value mode on identical placements
   (placement is value-independent) and co-times df vs df16 raw kernels;
2. asserts the df16 accuracy contract on hardware (~2^-40 value repr →
   ≤ 1e-11 max-rel at 40 nnz/row);
3. times the AUTO handles (uniform + powerlaw, now df16) in two windows.

Run on the TPU:  python baselines/probe_df16_onchip.py
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
from spmv_tpu.formats.sell8d import pack_sell8d, estimate_sell8d_auto  # noqa: E402
from spmv_tpu.io import generate                              # noqa: E402
from spmv_tpu.ops.pallas_sell import build_sell8d_fn          # noqa: E402
from spmv_tpu.oracle import spmv_golden                       # noqa: E402
from spmv_tpu.types import CsrMatrix                          # noqa: E402


def _f64(a32, seed=7):
    vals = np.random.default_rng(seed).standard_normal(a32.nnz)
    return CsrMatrix(a32.m, a32.n, a32.rowptr, a32.colidx, vals)


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(3)

    # --- raw-kernel co-timed comparison on identical placements ---------
    a = _f64(generate.random_uniform(100_000, 100_000, 40,
                                     dtype=np.float32, seed=42))
    x = rng.standard_normal(a.n)
    xj = jnp.asarray(x)
    g = spmv_golden(a, x)
    _t, _c, _s, nw = estimate_sell8d_auto(a, nw=None)
    print(f"uniform100k f64: chosen nw={nw}", flush=True)
    fns = {}
    for mode in ("df16", "df"):
        p, rest = pack_sell8d(a, max_pad_ratio=32.0, nw=nw,
                              force_value_mode=mode)
        assert rest is None or len(rest[0]) <= 0.02 * a.nnz
        fn = build_sell8d_fn(p)
        y = np.asarray(jax.block_until_ready(fn(xj)))
        if rest is not None:
            np.add.at(y, np.asarray(rest[0]),
                      np.asarray(rest[2]) * x[np.asarray(rest[1])])
        rel = np.abs(y - g).max() / np.abs(g).max()
        print(f"  {mode}: ntiles={p.ntiles} pad={p.pad_ratio:.2f} "
              f"max-rel {rel:.2e}", flush=True)
        assert rel < (1e-11 if mode == "df16" else 1e-12), (mode, rel)
        fns[mode] = (fn, p.ntiles)

    # co-timed: alternate modes within one window so the throttle state
    # cancels; report per-tile ns for the cost tables
    for w in range(2):
        line = [f"w{w}:"]
        for mode in ("df", "df16"):
            fn, ntiles = fns[mode]
            r = time_spmv_chain(fn, xj, iters=10, k=32, repeats=2)
            line.append(
                f"{mode} incl {r['inclusive']*1e3:.3f} ms "
                f"marg {r['marginal']*1e3:.3f} ms "
                f"({r['marginal']/ntiles*1e9:.1f} ns/tile)")
        print("  " + " | ".join(line), flush=True)
        if w == 0:
            time.sleep(8)

    # --- AUTO handles (what the bench runs) ------------------------------
    for name, a2 in (
        ("uniform100k_f64", a),
        ("powerlaw100k_f64",
         _f64(generate.power_law(100_000, 100_000, 40 * 100_000,
                                 dtype=np.float32, seed=2))),
    ):
        t0 = time.perf_counter()
        h = create_handle(a2, method=Method.AUTO)
        predeal = (time.perf_counter() - t0) * 1e3
        x2 = np.random.default_rng(0).standard_normal(a2.n)
        x2j = jnp.asarray(x2)
        y = np.asarray(jax.block_until_ready(h(x2j))).astype(np.float64)
        g2 = spmv_golden(a2, x2)
        rel = np.abs(y - g2).max() / np.abs(g2).max()
        vm = h.plan.get("value_mode")
        print(f"{name}: {h.method_name} value_mode={vm} "
              f"predeal {predeal:.0f} ms max-rel {rel:.2e}", flush=True)
        assert rel < 1e-10, (name, rel)
        ref = 8.18 if name.startswith("uniform") else 5.09
        for w in range(2):
            r = time_spmv_chain(h._bound, x2j, iters=10, k=32, repeats=2)
            gf = 2 * a2.nnz / r["inclusive"] / 1e9
            gfm = 2 * a2.nnz / r["marginal"] / 1e9
            print(f"  w{w}: incl {gf:.2f} GF/s marg {gfm:.2f} GF/s "
                  f"(ref {ref}; vs_ref {gf/ref:.2f})", flush=True)
            if w == 0:
                time.sleep(8)
    print("DF16 ONCHIP OK")


if __name__ == "__main__":
    main()
