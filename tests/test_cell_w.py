"""Cell-shared (s, w) slot layout (round 5).

The wide-gather fusion was ruled out on-chip (Mosaic dim1 gathers lower
only at 128 lanes — baselines/probe_wide_gather_r5.out), so the slot
kernels' remaining op-count lever is storing the window-select in the
shared CELL table: entries sharing (i, r) agree on (s, w) jointly
(~12.5% more conflicts) and the kernel merges the nw take0 gathers
before ONE take1 — 2·nw+1 vector ops per plane instead of 3·nw.
"""

import numpy as np
import pytest

from spmv_tpu.formats.sell8d import pack_sell8d
from spmv_tpu.io import generate
from spmv_tpu.oracle import spmv_golden
from spmv_tpu.ops.pallas_sell import build_sell8d_fn
from spmv_tpu.types import CsrMatrix


@pytest.mark.parametrize("nw", [2, 4, 8])
def test_cell_w_parity_f32(nw):
    a = generate.random_uniform(6_000, 60_000, 10, dtype=np.float32,
                                seed=1)
    pk, rest = pack_sell8d(a, g="auto", max_pad_ratio=256.0,
                           max_spill=0.05, nw=nw, cell_w=True)
    assert pk.cell_w
    x = np.random.default_rng(0).standard_normal(a.n).astype(np.float32)
    y = np.asarray(build_sell8d_fn(pk, interpret=True)(x),
                   dtype=np.float64)
    if rest is not None:
        np.add.at(y, rest[0],
                  rest[2].astype(np.float64) * x[rest[1]].astype(np.float64))
    g = spmv_golden(a.astype(np.float64), x.astype(np.float64))
    assert np.abs(y - g).max() / max(np.abs(g).max(), 1) < 2e-5


def test_cell_w_parity_f64_df16():
    a32 = generate.random_uniform(5_000, 50_000, 8, dtype=np.float32,
                                  seed=2)
    rng = np.random.default_rng(3)
    a = CsrMatrix(a32.m, a32.n, a32.rowptr, a32.colidx,
                  rng.standard_normal(a32.nnz))
    pk, rest = pack_sell8d(a, g="auto", max_pad_ratio=256.0,
                           max_spill=0.05, nw=4, cell_w=True)
    assert pk.cell_w and pk.value_mode in ("df", "df16")
    x = rng.standard_normal(a.n)
    y = np.asarray(build_sell8d_fn(pk, interpret=True)(x))
    if rest is not None:
        np.add.at(y, rest[0], rest[2] * x[rest[1]])
    g = spmv_golden(a, x)
    # interpret mode collapses the EFTs (PERFNOTES caveat) — f32 bound
    assert np.abs(y - g).max() / max(np.abs(g).max(), 1) < 2e-5


def test_cell_w_conflict_overhead_bounded():
    # the joint (s, w) constraint costs ~12.5% more conflicts; the pack
    # must still land within ~1.35x of the classic layout's tiles
    a = generate.random_uniform(8_000, 80_000, 12, dtype=np.float32,
                                seed=4)
    pk0, _ = pack_sell8d(a, g="auto", max_pad_ratio=256.0,
                         max_spill=0.05, nw=8, use_native=False)
    pk1, _ = pack_sell8d(a, g="auto", max_pad_ratio=256.0,
                         max_spill=0.05, nw=8, cell_w=True)
    assert pk1.ntiles <= 1.35 * pk0.ntiles, (pk0.ntiles, pk1.ntiles)


def test_cell_w_nw1_degenerates():
    a = generate.random_uniform(2_000, 20_000, 6, dtype=np.float32,
                                seed=5)
    pk, _ = pack_sell8d(a, g="auto", max_pad_ratio=256.0, nw=1,
                        cell_w=True)
    assert not pk.cell_w          # no window bits at nw=1
