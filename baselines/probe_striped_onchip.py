"""On-chip probe: column-striped resident slot mode vs windowed v2w vs
the XLA scan (round 4).

The windowed slot kernels pay nw*4 KB of x-window DMA per tile
(_TILE_NS_W: 236 ns/tile at nw=8 vs 29 resident); the striped plan runs
the RESIDENT kernel per <=V2_MAX_N-column stripe.  One scattered matrix
past the VMEM-x envelope, three execs co-timed:

* striped AUTO handle (expected plan: sell8d_stripes)
* the windowed unstriped pack through build_sell8d_fn (old v2w route)
* the XLA Balanced scan handle

Run on the TPU:  python baselines/probe_striped_onchip.py
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
from spmv_tpu.formats.sell8d import pack_sell8d               # noqa: E402
from spmv_tpu.io import generate                              # noqa: E402
from spmv_tpu.oracle import spmv_golden                       # noqa: E402
from spmv_tpu.ops.pallas_sell import build_sell8d_fn          # noqa: E402


def main():
    print("backend:", jax.default_backend(), flush=True)
    # m kept moderate: the chained-k timing protocol UNROLLS k dependent
    # SpMVs inside the loop body, so a 3-stripe plan at k=8 lowers 24
    # Mosaic kernel instances per timed program (~minutes of host
    # tracing; k=32 on the 500k-row config burned >26 min and was
    # killed).  The padded stream also ships over the tunnel at predeal
    # (~12 min/GB observed).
    #
    # d=64: ~128 nnz per (slice, 8-window bundle) → pad ~10, so the
    # windowed kernels' per-tile window DMA (nw·4 KB) dominates their
    # stream and the resident-stripe advantage is visible.  The d=32
    # run (pad ~31, stream-bound both ways, probe_striped_onchip_d32.out)
    # measured striped 0.83x windowed / 1.67x scan in a throttled window.
    a = generate.random_uniform(250_000, 4_000_000, 64,
                                dtype=np.float32, seed=41)
    print(f"matrix: {a.m} x {a.n}, nnz {a.nnz}", flush=True)
    x = np.random.default_rng(0).standard_normal(a.n).astype(np.float32)
    xj = jnp.asarray(x)
    g = spmv_golden(a.astype(np.float64), x.astype(np.float64))
    scale = max(np.abs(g).max(), 1.0)

    runs = {}

    t0 = time.perf_counter()
    h = create_handle(a, method=Method.AUTO)
    print(f"striped: {h} predeal {time.perf_counter()-t0:.1f}s",
          flush=True)
    assert "sell8d_stripes" in h.plan, list(h.plan)
    runs["striped"] = h._bound

    t0 = time.perf_counter()
    pk, rest = pack_sell8d(a, max_pad_ratio=96.0, max_spill=0.10, nw=8,
                           g="auto", depth_cap="auto")
    fw = build_sell8d_fn(pk)
    rr = (jnp.asarray(rest[0].astype(np.int32)),
          jnp.asarray(rest[1].astype(np.int32)),
          jnp.asarray(rest[2])) if rest is not None else None

    def windowed(xv, _f=fw, _r=rr):
        y = _f(xv)
        if _r is not None:
            y = y.at[_r[0]].add(_r[2] * xv[_r[1]])
        return y

    print(f"windowed: ntiles {pk.ntiles} pad {pk.pad_ratio:.2f} "
          f"rest {0 if rest is None else len(rest[0])} "
          f"pack {time.perf_counter()-t0:.1f}s", flush=True)
    runs["windowed"] = windowed

    hx = create_handle(a, method=Method.BALANCED)
    print(f"xla: {hx}", flush=True)
    runs["xla_balanced"] = hx._bound

    for label, f in runs.items():
        y = np.asarray(jax.block_until_ready(f(xj)), dtype=np.float64)
        rel = np.abs(y - g).max() / scale
        print(f"  {label}: rel err {rel:.2e}", flush=True)
        assert rel < 2e-4, (label, rel)

    res = {}
    for w in range(1):
        # k=8 suffices here: per-SpMV times are 3-30 ms >> the ~2.9 ms
        # sync bubble / 8, and each extra k unrolls 3 more Mosaic
        # lowerings per stripe into the traced chain
        for label, f in runs.items():
            r = time_spmv_chain(f, xj, iters=6, k=8, repeats=2)
            gf = 2 * a.nnz / r["inclusive"] / 1e9
            print(f"  w{w} {label}: incl {r['inclusive']*1e3:.3f} ms "
                  f"({gf:.2f} GF/s) marg {r['marginal']*1e3:.3f} ms",
                  flush=True)
            res.setdefault(label, []).append(r["inclusive"])
    s_vs_w = min(res["windowed"]) / min(res["striped"])
    s_vs_x = min(res["xla_balanced"]) / min(res["striped"])
    print(f"striped vs windowed {s_vs_w:.2f}x, vs xla {s_vs_x:.2f}x",
          flush=True)


if __name__ == "__main__":
    main()
