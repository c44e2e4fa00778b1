"""Round-5 on-chip probe: cell-shared (s,w) slot layout vs classic.

The slot kernels are COMPUTE-bound (44 ns/tile at nw=8 df16, round-4) at
3·nw gather/select ops per plane; the cell_w layout runs 2·nw+1 per
plane at ~12.5% more cell conflicts (pack-time depth/spill).  This probe
co-times both layouts of the SAME matrix at the same nw:

* uniform100k f64 (df16, the compute-bound poster child)
* powerlaw100k f64 light part stand-in: the full matrix at nw=4
* uniform100k f32 (palette-infeasible bf16/f32 stream)

and reports ns/tile for each, plus realized pad ratios — the decision
input for flipping AUTO's slot packs to cell_w.

Run alone on the chip: python baselines/probe_cell_w_r5.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from spmv_tpu.utils import enable_compile_cache               # noqa: E402
enable_compile_cache()

import jax                                                    # noqa: E402
jax.config.update("jax_enable_x64", True)   # keep f64 x honest
import jax.numpy as jnp                                       # noqa: E402

from spmv_tpu.bench.timing import time_spmv_chain             # noqa: E402
from spmv_tpu.formats.sell8d import pack_sell8d               # noqa: E402
from spmv_tpu.io import generate                              # noqa: E402
from spmv_tpu.oracle import spmv_golden                       # noqa: E402
from spmv_tpu.ops.pallas_sell import build_sell8d_fn          # noqa: E402
from spmv_tpu.types import CsrMatrix                          # noqa: E402


def case(name, a, nw):
    packs = {}
    for label, cw in (("classic", False), ("cell_w", True)):
        t0 = time.perf_counter()
        pk, rest = pack_sell8d(a, g="auto", max_pad_ratio=96.0,
                               max_spill=0.05, nw=nw, cell_w=cw)
        print(f"{name} {label}: ntiles {pk.ntiles} pad "
              f"{pk.pad_ratio:.2f} vm {pk.value_mode} "
              f"spill {0 if rest is None else len(rest[0])} "
              f"pack {time.perf_counter()-t0:.1f}s", flush=True)
        packs[label] = (pk, rest)
    x = np.random.default_rng(0).standard_normal(a.n)
    if np.dtype(a.dtype) == np.float32:
        x = x.astype(np.float32)
    xj = jnp.asarray(x)
    g = spmv_golden(a.astype(np.float64), x.astype(np.float64))
    fns = {}
    for label, (pk, rest) in packs.items():
        f = build_sell8d_fn(pk)
        y = np.asarray(jax.block_until_ready(f(xj)), dtype=np.float64)
        if rest is not None:
            np.add.at(y, rest[0], np.asarray(rest[2], np.float64)
                      * x[rest[1]].astype(np.float64))
        rel = np.abs(y - g).max() / max(np.abs(g).max(), 1)
        print(f"{name} {label}: rel err {rel:.2e}", flush=True)
        fns[label] = f
    for w in range(2):
        for label, f in fns.items():
            pk = packs[label][0]
            r = time_spmv_chain(f, xj, iters=8, k=8, repeats=2)
            print(f"w{w} {name} {label}: incl {r['inclusive']*1e3:.3f} "
                  f"marg {r['marginal']*1e3:.3f} ms "
                  f"{r['marginal']/pk.ntiles*1e9:.1f} ns/tile", flush=True)
        if w == 0:
            time.sleep(8)


def main():
    print("backend:", jax.default_backend(), flush=True)
    a32 = generate.random_uniform(100_000, 100_000, 40,
                                  dtype=np.float32, seed=42)
    vals = np.random.default_rng(7).standard_normal(a32.nnz)
    a64 = CsrMatrix(a32.m, a32.n, a32.rowptr, a32.colidx, vals)
    if "--more" in sys.argv:
        # calibration anchors for the cell_w cost tables
        case("uniform100k_f64_nw2", a64, 2)
        case("uniform100k_f32_nw4", a32, 4)
        case("uniform100k_f32_nw2", a32, 2)
        return 0
    case("uniform100k_f64_nw4", a64, 4)
    case("uniform100k_f64_nw8", a64, 8)
    case("uniform100k_f32_nw8", a32, 8)
    return 0


if __name__ == "__main__":
    sys.exit(main())
