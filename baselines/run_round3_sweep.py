"""Round-3 clean benchmark sweep → baselines/results_round3.csv.

VERDICT round-2 item 6 ("pre-deal truth"): regenerate the all-methods CSV
on a quiet host with a pack_ms/transfer_ms split per row so the 13.9 s vs
1.8 s CSR5 pre-deal contradiction is resolved — host contention shows up
as pack_ms, tunnel stalls as transfer_ms.  Run ALONE on the machine (4
shared cores; concurrent work doubles pack times — CLAUDE.md).

Adds the f64 twins of the main families (the reference's primary dtype)
and the webbase-shaped ultra-sparse config on top of the round-2 set.

Run: python baselines/run_round3_sweep.py          (on the chip)
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from spmv_tpu.utils import enable_compile_cache               # noqa: E402
enable_compile_cache()

from spmv_tpu.io import generate                              # noqa: E402
from spmv_tpu.io.mmio import write_mtx                        # noqa: E402
from spmv_tpu.bench import suite                              # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "results_round3.csv")
MTX = os.path.join(os.path.dirname(__file__), "real4m.mtx")
RECT = os.path.join(os.path.dirname(__file__), "rect200k.mtx")

ALL = "SERIAL,PARALLEL,BALANCED,BALANCED2,BALANCED_YID,SELL_C_SIGMA,CSR5,AUTO"


def ensure_files():
    if not os.path.exists(MTX):
        a = generate.clustered(400_000, 400_000, 10, spread=2000,
                               dtype=np.float64, seed=21)
        t0 = time.perf_counter()
        write_mtx(MTX, a)
        print(f"# wrote {MTX}: {a.nnz} nnz in "
              f"{time.perf_counter()-t0:.1f}s", flush=True)
    if not os.path.exists(RECT):
        write_mtx(RECT, generate.banded(200_000, 300_000, 6,
                                        dtype=np.float64, seed=22))


def main():
    ensure_files()
    if os.path.exists(OUT):
        os.remove(OUT)          # the suite appends per row; start clean
    common = ["--methods", ALL, "--iters", "10", "--repeats", "2",
              "--split-predeal", "--out", OUT]
    rc = suite.main([
        "builtin:clustered200k", "builtin:uniform100k",
        "builtin:powerlaw100k", "builtin:banded1m", MTX, RECT,
        "--dtype", "float32", "--external", *common])
    if rc:
        return rc
    # the reference's own dtype (include/spmv.h:49) — df kernel tiers
    return suite.main([
        "builtin:clustered200k", "builtin:uniform100k",
        "builtin:powerlaw100k", "builtin:banded1m",
        "--dtype", "float64", *common])


if __name__ == "__main__":
    sys.exit(main())
