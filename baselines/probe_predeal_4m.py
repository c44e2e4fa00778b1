"""Profile the n=4M scattered predeal outlier (round-4).

validate_slot_v2w_onchip recorded 102 s of predeal for AUTO on
uniform 1M x 4M d=32 (32M nnz) — far past VERDICT round-3 item 2's
<=20 s target for a 32M-nnz scattered pack.  Two passes:

1. predeal_profile split (pack vs blocked device transfer, honest)
2. cProfile of the pack stage (top cumulative hot spots)

Run on the chip, ALONE:  python baselines/probe_predeal_4m.py
"""

import cProfile
import io
import os
import pstats
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from spmv_tpu.utils import enable_compile_cache               # noqa: E402

enable_compile_cache()

import jax                                                    # noqa: E402

from spmv_tpu import create_handle, Method                    # noqa: E402
from spmv_tpu.handle import predeal_profile                   # noqa: E402
from spmv_tpu.io import generate                              # noqa: E402


def main():
    print("backend:", jax.default_backend(), flush=True)
    a = generate.random_uniform(1_000_000, 4_000_000, 32,
                                dtype=np.float32, seed=31)
    print(f"matrix: {a.m} x {a.n}, nnz {a.nnz}", flush=True)

    # pass 1: honest pack/transfer split
    t0 = time.perf_counter()
    with predeal_profile() as laps:
        h = create_handle(a, method=Method.AUTO)
    total = time.perf_counter() - t0
    print(f"pass1: total {total:.1f}s  transfer {laps['transfer_s']:.1f}s "
          f"({laps['bytes']/1e6:.0f} MB)  pack {total-laps['transfer_s']:.1f}s",
          flush=True)
    print(f"pass1: {h}", flush=True)
    del h

    # pass 2: cProfile the pack (overhead-inflated; shape only)
    pr = cProfile.Profile()
    pr.enable()
    h = create_handle(a, method=Method.AUTO)
    pr.disable()
    s = io.StringIO()
    pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(25)
    print(s.getvalue(), flush=True)
    del h


if __name__ == "__main__":
    main()
