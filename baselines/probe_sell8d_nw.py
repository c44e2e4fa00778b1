"""On-chip bundle-width (nw) calibration for SELL-8D on uniform100k.

Times nw ∈ {1, 2, 4, 8} with the chained-k protocol to calibrate the
_TILE_NS cost model in formats/sell8d.py and pick the production width.
Run on the TPU:  python baselines/probe_sell8d_nw.py
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

from spmv_tpu.bench.timing import time_spmv_chain             # noqa: E402
from spmv_tpu.formats.sell8d import pack_sell8d               # noqa: E402
from spmv_tpu.io import generate                              # noqa: E402
from spmv_tpu.oracle import spmv_golden                       # noqa: E402
from spmv_tpu.ops.pallas_sell import build_sell8d_fn          # noqa: E402


def main():
    print("backend:", jax.default_backend())
    a = generate.random_uniform(100_000, 100_000, 40, dtype=np.float32,
                                seed=42)
    x = np.random.default_rng(0).standard_normal(a.n).astype(np.float32)
    xj = jnp.asarray(x)
    g = spmv_golden(a, x)

    fns = {}
    for nw in (1, 2, 4, 8):
        t0 = time.perf_counter()
        p, rest = pack_sell8d(a, max_pad_ratio=50.0, nw=nw)
        tp = time.perf_counter() - t0
        fn = build_sell8d_fn(p)
        y = np.asarray(jax.block_until_ready(fn(xj)))
        if rest is not None:
            np.add.at(y, rest[0], rest[2] * x[rest[1]])
        rel = np.abs(y - g).max() / np.abs(g).max()
        nsp = 0 if rest is None else len(rest[0])
        print(f"nw={nw}: rel {rel:.2e} pad {p.pad_ratio:.2f} tiles "
              f"{p.ntiles} mode {p.value_mode} spill {nsp/a.nnz:.4f} "
              f"pack {tp:.1f}s")
        assert rel < 2e-5
        fns[nw] = (fn, p.ntiles)

    for window in range(2):
        for nw, (fn, ntiles) in fns.items():
            r = time_spmv_chain(fn, xj, iters=10, k=32, repeats=2)
            gf = 2 * a.nnz / r["inclusive"] / 1e9
            gfm = 2 * a.nnz / r["marginal"] / 1e9
            print(f"w{window} nw={nw}: incl {r['inclusive']*1e3:.3f} ms "
                  f"({gf:.2f} GF/s) marg {r['marginal']*1e3:.3f} ms "
                  f"({gfm:.2f} GF/s) = {r['marginal']*1e9/ntiles:.1f} "
                  f"ns/tile, bubble {r['bubble']*1e3:.2f} ms")
        if window == 0:
            time.sleep(10)


if __name__ == "__main__":
    main()
