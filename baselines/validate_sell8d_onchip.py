"""On-chip validation + timing for the SELL-8D slot-mode kernel.

Checks numerics vs the host golden (interpret mode cannot stand in for
Mosaic — PERFNOTES.md) and times uniform100k through the handle with the
chained-k protocol.  Run on the TPU:  python baselines/validate_sell8d_onchip.py
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
    print("backend:", jax.default_backend())

    # 1. small-matrix numerics directly on the kernel
    a = generate.random_uniform(9000, 9000, 8, dtype=np.float32, seed=3)
    packed, rest = pack_sell8d(a, max_pad_ratio=40.0, max_spill=0.05)
    fn = build_sell8d_fn(packed)
    x = np.random.default_rng(5).standard_normal(a.n).astype(np.float32)
    y = np.asarray(jax.block_until_ready(fn(jnp.asarray(x))))
    if rest is not None:
        np.add.at(y, rest[0], rest[2] * x[rest[1]])
    g = spmv_golden(a, x)
    rel = np.abs(y - g).max() / np.abs(g).max()
    print(f"small kernel rel err {rel:.2e} pad {packed.pad_ratio:.2f} "
          f"mode {packed.value_mode}")
    assert rel < 2e-5

    # 2. uniform100k through the handle (AUTO must route to sell8d)
    a = generate.random_uniform(100_000, 100_000, 40, dtype=np.float32,
                                seed=42)
    t0 = time.perf_counter()
    h = create_handle(a, method=Method.AUTO)
    predeal = (time.perf_counter() - t0) * 1e3
    print("handle:", h, f"predeal {predeal:.0f} ms")
    x = np.random.default_rng(0).standard_normal(a.n).astype(np.float32)
    xj = jnp.asarray(x)
    y = np.asarray(jax.block_until_ready(h(xj)))
    g = spmv_golden(a, x)
    rel = np.abs(y - g).max() / np.abs(g).max()
    print(f"handle rel err {rel:.2e}")
    assert rel < 2e-5

    for w in range(2):
        r = time_spmv_chain(h._bound, xj, iters=10, k=32, repeats=2)
        gf = 2 * a.nnz / r["inclusive"] / 1e9
        gfm = 2 * a.nnz / r["marginal"] / 1e9
        print(f"window {w}: inclusive {r['inclusive']*1e3:.3f} ms = "
              f"{gf:.2f} GF/s, marginal {r['marginal']*1e3:.3f} ms = "
              f"{gfm:.2f} GF/s, bubble {r['bubble']*1e3:.2f} ms")
        if w == 0:
            time.sleep(10)


if __name__ == "__main__":
    main()
