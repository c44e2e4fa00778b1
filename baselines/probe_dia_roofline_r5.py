"""Round-5 DIA roofline probe (VERDICT item 8, BASELINE.md north star).

Co-times, in ONE window (only co-timed ratios survive the device's
throttle swings, CLAUDE.md):

* a pure-stream ceiling: z = a*x + y over 3 x 128 MB f32 (the saxpy
  traffic pattern XLA runs at full bandwidth) -> achieved GB/s,
* the banded1m f32 AUTO handle (Pallas DIA, x resident, bf16 data after
  the round-5 lossless compression) -> achieved GB/s from its true
  byte count,
* the banded4m f32 AUTO handle (XLA shifted-stream plan, n > MAX_N).

Reports each plan's fraction of the co-measured ceiling.  Target >= 80%
or a PERFNOTES entry proving the residual gap is sync-bubble floor.

Run alone on the chip: python baselines/probe_dia_roofline_r5.py
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
from spmv_tpu.io import generate                              # noqa: E402


def plan_bytes(h, m, n):
    """Per-exec HBM bytes of a DIA plan: data + x once + y once.  The
    XLA shifted-stream plan fuses its per-diagonal adds into one pass
    over x (all slices static), so x counts once there too — the first
    probe run priced x per diagonal and reported an impossible 2.4 TB/s,
    disproving its own byte model."""
    p = h.plan
    if "dia_pallas" in p:
        d3 = p["dia_pallas"]["data3"]
        return d3.nbytes + 4 * n + 4 * m
    return p["data"].nbytes + 4 * n + 4 * m


def main():
    print("backend:", jax.default_backend(), flush=True)

    # stream ceiling op: x*x over 32M elements (reads x writes y,
    # 2 arrays x 4 B).  NOT affine: a k-chain of renormalized squares
    # cannot be algebraically folded (the first probe run used saxpy and
    # XLA folded the whole chain to one op - '2.9e6 GB/s').
    N = 32 * 1024 * 1024
    xs = jnp.asarray(np.abs(np.random.default_rng(0)
                     .standard_normal(N)).astype(np.float32) + 0.5)

    @jax.jit
    def sq(x):
        return x * x

    cases = []
    for name, m, bw in (("banded1m", 1_000_000, 4),
                        ("banded4m", 4_000_000, 4)):
        a = generate.banded(m, m, bw, dtype=np.float32, seed=7)
        t0 = time.perf_counter()
        h = create_handle(a, method=Method.AUTO)
        print(f"{name}: {h} predeal {time.perf_counter()-t0:.1f}s "
              f"bytes/exec {plan_bytes(h, a.m, a.n)/1e6:.1f} MB "
              f"data dtype "
              f"{(h.plan.get('dia_pallas') or h.plan)['data3' if 'dia_pallas' in h.plan else 'data'].dtype}",
              flush=True)
        x = jnp.asarray(np.random.default_rng(1)
                        .standard_normal(a.n).astype(np.float32))
        cases.append((name, h, x, plan_bytes(h, a.m, a.n), 2 * a.nnz))

    for w in range(2):
        # ceiling first, then the plans — one window, seconds apart.
        # Window 1 feeds a PERTURBED x so the runtime's same-args
        # dispatch dedup cannot return window-0's results (the first
        # probe run's w1 reported 0.000 ms across the board).
        r0 = time_spmv_chain(sq, xs + np.float32(w * 1e-3), iters=10,
                             k=32, repeats=2)
        ceil_gbs = 2 * 4 * N / r0["marginal"] / 1e9
        print(f"w{w} sq: marg {r0['marginal']*1e3:.3f} ms -> "
              f"{ceil_gbs:.1f} GB/s ceiling "
              f"(incl {r0['inclusive']*1e3:.3f}, "
              f"bubble {r0['bubble']*1e3:.2f})", flush=True)
        for name, h, x, nbytes, flops in cases:
            r = time_spmv_chain(h._bound, x + np.float32(w * 1e-3),
                                iters=10, k=32, repeats=2)
            gbs = nbytes / r["marginal"] / 1e9
            gf = flops / r["marginal"] / 1e9
            print(f"w{w} {name}: marg {r['marginal']*1e3:.3f} ms  "
                  f"{gf:.1f} GF/s  {gbs:.1f} GB/s = "
                  f"{100*gbs/ceil_gbs:.0f}% of co-timed ceiling "
                  f"(incl {r['inclusive']*1e3:.3f})", flush=True)
        if w == 0:
            time.sleep(10)
    return 0


if __name__ == "__main__":
    sys.exit(main())
