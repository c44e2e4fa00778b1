"""SELL-C-σ packing, re-designed for TPU lane geometry.

Reference: ``sell_C_Sigma_get_handle_Selected`` (sell_C_Sigma_spmv.c:141-247)
builds σ-sorted, C-row slices stored column-major with −1 column sentinels,
sized for 4/8-wide AVX2 FMA.  The TPU redesign changes the geometry and the
output path:

* **C = 128** — a slice is one TPU *lane* dimension, so the per-column FMA
  ``y[0:C] += vals[j, 0:C] * x[cols[j, 0:C]]`` is a full-width VPU op.
* Slice depth (max row length in the slice, ``ld``) is padded to a multiple of
  8 **sublanes** and slices are **bucketed by padded depth** so every bucket is
  one static-shape dense array ``(nslices, ld, C)`` — XLA sees a handful of
  fixed shapes instead of ragged slices.
* Padding uses column 0 + value 0 (instead of the reference's −1 sentinel +
  branch, sell_C_Sigma_spmv.c:124, inner_spmv.h:437): gathered garbage × 0 = 0,
  so the kernel is branch-free.
* The row scatter (reference scatters ``Y[RowIndex]``, inner_spmv.h:473-475)
  is inverted into a **gather**: all slice outputs are concatenated and the
  original row order restored by one precomputed inverse-permutation gather —
  zero scatter-adds anywhere on the device.

With ``sigma=1`` (no sorting) this degrades gracefully to plain ELL slices in
natural row order — used for the ``Method_Parallel`` plan.
"""

from __future__ import annotations

import dataclasses
from typing import List

import numpy as np

from ..types import CsrMatrix, INT_DTYPE

__all__ = ["SellBucket", "SellMatrix", "pack_sell"]

LANES = 128      # slice height C
SUBLANES = 8     # depth granularity


@dataclasses.dataclass(frozen=True)
class SellBucket:
    """All slices sharing one padded depth: dense (nslices, depth, C) tiles."""

    depth: int
    cols: np.ndarray   # (nslices, depth, LANES) int32, padding → 0
    vals: np.ndarray   # (nslices, depth, LANES) dtype, padding → 0
    slice_ids: np.ndarray  # (nslices,) original slice index (for debugging)


@dataclasses.dataclass(frozen=True)
class SellMatrix:
    m: int
    n: int
    nnz_stored: int          # true nnz (pre-padding)
    c: int
    sigma: int
    buckets: List[SellBucket]
    inv_pos: np.ndarray      # (m,) int32: position of orig row i in the
                             # bucket-concatenated output vector
    identity_order: bool     # True when inv_pos is the identity (ELL mode)

    @property
    def padded_nnz(self) -> int:
        return sum(b.cols.size for b in self.buckets)


def _round_depth(ld: int, mode: str) -> int:
    ld = max(int(ld), 1)
    padded = -(-ld // SUBLANES) * SUBLANES
    if mode == "pow2":
        p = SUBLANES
        while p < padded:
            p *= 2
        return p
    return padded


def pack_sell(a: CsrMatrix, c: int = LANES, sigma: int = 16 * LANES,
              depth_mode: str = "pow2") -> SellMatrix:
    """Pack CSR into bucketed SELL-C-σ.

    ``sigma`` is the sorting-window size in rows (multiple of ``c``);
    ``sigma <= 1`` disables sorting (ELL mode).  The reference derives
    σ = C·(m/threads/C) at handle time (common.c:139-140,
    sell_C_Sigma_spmv.c:148); here it is an explicit tuning knob the
    inspector sets.
    """
    if c % LANES and c != LANES:
        raise ValueError(f"c must be {LANES} on TPU")
    m_pad = max(-(-a.m // c) * c, c)
    lengths = np.zeros(m_pad, dtype=np.int64)
    lengths[: a.m] = a.row_lengths
    # σ-window sort by descending length (stable), like the reference's qsort
    # within each σ block (sell_C_Sigma_spmv.c:220-222).
    if sigma > 1:
        sigma = -(-sigma // c) * c
        if m_pad % sigma:
            # pad the window grid; extra rows are empty and sort last
            grid = -(-m_pad // sigma) * sigma
            lens_w = np.full(grid, -1, dtype=np.int64)
            lens_w[:m_pad] = lengths
        else:
            grid = m_pad
            lens_w = lengths
        win = lens_w.reshape(-1, sigma)
        order = (np.argsort(-win, axis=1, kind="stable")
                 + np.arange(0, grid, sigma)[:, None]).reshape(-1)
        order = order[order < m_pad]
        identity = False
    else:
        order = np.arange(m_pad, dtype=np.int64)
        identity = True

    nslices = m_pad // c
    slice_rows = order.reshape(nslices, c)         # orig row ids per slice
    slice_len = lengths[slice_rows]                # (nslices, c)
    slice_depth = slice_len.max(axis=1)            # ld per slice
    depths = np.array([_round_depth(d, depth_mode) for d in slice_depth])

    rowptr64 = a.rowptr.astype(np.int64)
    buckets: List[SellBucket] = []
    # position of each slice's output in the concatenated y stream
    slice_pos = np.empty(nslices, dtype=np.int64)
    cursor = 0
    for depth in sorted(set(depths.tolist())):
        sel = np.nonzero(depths == depth)[0]
        ns = len(sel)
        cols = np.zeros((ns, depth, c), dtype=INT_DTYPE)
        vals = np.zeros((ns, depth, c), dtype=a.vals.dtype)
        rows_blk = slice_rows[sel]                  # (ns, c)
        lens_blk = slice_len[sel]                   # (ns, c)
        # Vectorized fill: for each (slice, lane) place that row's nnz run
        # down the depth axis.
        valid = rows_blk < a.m
        starts = np.where(valid, rowptr64[np.minimum(rows_blk, a.m - 1)], 0)
        jj = np.arange(depth).reshape(1, depth, 1)
        mask = jj < lens_blk[:, None, :]
        src = starts[:, None, :] + jj               # (ns, depth, c)
        src_flat = np.where(mask, src, 0)
        cols[:] = np.where(mask, a.colidx[src_flat], 0)
        vals[:] = np.where(mask, a.vals[src_flat], 0)
        buckets.append(SellBucket(depth, cols, vals, sel.astype(INT_DTYPE)))
        slice_pos[sel] = cursor + np.arange(ns) * c
        cursor += ns * c

    # inverse permutation: orig row i sits at lane (i's position within its
    # slice) of its slice's output block.
    pos_of_sorted = np.empty(m_pad, dtype=np.int64)
    pos_of_sorted[slice_rows.ravel()] = (
        slice_pos[:, None] + np.arange(c)[None, :]
    ).ravel()
    inv_pos = pos_of_sorted[: a.m].astype(INT_DTYPE)
    if identity:
        identity = bool(np.all(inv_pos == np.arange(a.m)))
    return SellMatrix(a.m, a.n, a.nnz, c, max(sigma, 1), buckets, inv_pos,
                      identity)
