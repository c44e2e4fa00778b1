"""Round-2 clean benchmark sweep → baselines/results_round2.csv.

Replaces the corrupted round-1 artifact (VERDICT item 5) and adds the
matrices round 1 lacked (item 9): a real ≥4M-nnz MatrixMarket FILE driven
through the native parser + binary cache, and a rectangular matrix.
One RMSE definition (oracle.rmse == the reference's), chained-k timing.

Run: PYTHONPATH=... python baselines/run_round2_sweep.py   (on the chip)
"""
import os
import sys
import time

import numpy as np

from spmv_tpu.utils import enable_compile_cache
enable_compile_cache()

from spmv_tpu.io import generate
from spmv_tpu.io.mmio import write_mtx
from spmv_tpu.bench import suite
from spmv_tpu.types import Method

OUT = os.path.join(os.path.dirname(__file__), "results_round2.csv")
MTX = os.path.join(os.path.dirname(__file__), "real4m.mtx")

ALL = "SERIAL,PARALLEL,BALANCED,BALANCED2,BALANCED_YID,SELL_C_SIGMA,CSR5,AUTO"


def ensure_mtx():
    if os.path.exists(MTX):
        return
    # SuiteSparse-shaped stand-in (no egress in this environment): FEM-ish
    # clustered structure, ~4M nnz, written as a real .mtx text file so the
    # sweep exercises parse + binary cache end to end (test_spmv.c:158-209).
    a = generate.clustered(400_000, 400_000, 10, spread=2000,
                           dtype=np.float64, seed=21)
    t0 = time.perf_counter()
    write_mtx(MTX, a)
    print(f"# wrote {MTX}: {a.nnz} nnz in {time.perf_counter()-t0:.1f}s",
          flush=True)


def main():
    ensure_mtx()
    if os.path.exists(OUT):
        os.remove(OUT)          # the suite appends per row; start clean
    rectpath = os.path.join(os.path.dirname(__file__), "rect200k.mtx")
    if not os.path.exists(rectpath):
        write_mtx(rectpath, generate.banded(200_000, 300_000, 6,
                                            dtype=np.float64, seed=22))
    argv = [
        "builtin:clustered200k", "builtin:uniform100k",
        "builtin:powerlaw100k", "builtin:banded1m", MTX, rectpath,
        "--methods", ALL, "--dtype", "float32",
        "--iters", "10", "--repeats", "2", "--external",
        "--out", OUT,
    ]
    return suite.main(argv)


if __name__ == "__main__":
    sys.exit(main())
