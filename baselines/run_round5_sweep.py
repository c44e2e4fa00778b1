"""Round-5 clean benchmark sweep → baselines/results_round5.csv.

VERDICT round-4 item 2 (third ask for the pre-deal-truth CSV): the proving CSV with
pack_ms/transfer_ms per row — host contention shows up as pack_ms,
tunnel stalls as transfer_ms.  Adds the webbase config and the
scattered-4M (32M nnz) chunked-slot config whose 75.6 s predeal was the
round-3 outlier (now packed by the threaded native packer).  Run ALONE
on the machine (4 shared cores; concurrent work doubles pack times —
CLAUDE.md).

Run: python baselines/run_round5_sweep.py          (on the chip)
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

OUT = os.path.join(os.path.dirname(__file__), "results_round5.csv")
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
    common = ["--iters", "10", "--repeats", "2",
              "--split-predeal", "--out", OUT]
    rc = suite.main([
        "builtin:clustered200k", "builtin:uniform100k",
        "builtin:powerlaw100k", "builtin:banded1m", "builtin:webbase1m",
        MTX, RECT,
        "--dtype", "float32", "--external", "--methods", ALL, *common])
    if rc:
        return rc
    # the reference's own dtype (include/spmv.h:49) — df16 kernel tiers
    rc = suite.main([
        "builtin:clustered200k", "builtin:uniform100k",
        "builtin:powerlaw100k", "builtin:banded1m",
        "--dtype", "float64", "--methods", ALL, *common])
    if rc:
        return rc
    # the 32M-nnz chunked-slot scale case — predeal truth for the round-3
    # outlier; AUTO (chunked 8D) vs the XLA scan only (a full 8-method
    # sweep at this size spends most of its time re-packing)
    return suite.main([
        "builtin:scattered4m", "--dtype", "float32",
        "--methods", "AUTO,BALANCED", *common])


if __name__ == "__main__":
    sys.exit(main())
