"""Locality / reordering layer — the METIS layer rebuilt for TPU windows.

Reference: ``HyperGraphInterface.cpp:59-147`` permutes rows by METIS k-way
partition id at handle-creation time (gated by OPT_LEVEL=3, common.c:144-156)
and caches the permutation on disk keyed by a matrix token
(``cache/<token>.bin``, HyperGraphInterface.cpp:22-57).  The caller gathers a
permuted x in and un-permutes y out (test_spmv.c:95-101, :130-137).

On this TPU the goal is different and sharper: the Pallas windowed-gather
kernel can only reach an aligned 1024-element x-window per (8,128) tile
(PERFNOTES.md), so the reorder's job is to cluster each row's column indices
into few 1024-wide windows.  We implement:

* :func:`rcm_order` — reverse Cuthill-McKee (pure numpy BFS; no external
  graph library in the image) for bandwidth reduction;
* :func:`window_cluster_order` — a lightweight column-clustering pass:
  order columns by their dominant row-block, so columns co-accessed by the
  same rows land in the same window (the role METIS partitioning plays in
  the reference);
* :func:`reorder_symmetric` — apply a permutation to rows+columns and return
  (A', perm) with the reference's x-permute/y-unpermute contract;
* an on-disk permutation cache keyed like the reference's
  (``cache/<token>.npz``).
"""

from __future__ import annotations

import os
import re
from typing import Optional, Tuple

import numpy as np

from ..types import CsrMatrix, INT_DTYPE

__all__ = ["rcm_order", "window_cluster_order", "reorder_symmetric",
           "reorder_rows", "cached_order", "bandwidth"]

_CACHE_DIR = "cache"  # same directory name as the reference


def bandwidth(a: CsrMatrix) -> int:
    """Max |col - row| over nonzeros (structure metric for DIA/RCM gating)."""
    if a.nnz == 0:
        return 0
    rows = np.repeat(np.arange(a.m, dtype=np.int64), a.row_lengths)
    return int(np.abs(a.colidx.astype(np.int64) - rows).max())


def rcm_order(a: CsrMatrix) -> np.ndarray:
    """Reverse Cuthill-McKee ordering of the symmetrized structure.

    Returns ``perm`` such that row/col i of the reordered matrix is
    row/col ``perm[i]`` of the original.  Pure numpy BFS with
    degree-sorted neighbor visits; O(nnz log nnz).
    """
    if a.m != a.n:
        raise ValueError("RCM needs a square matrix")
    m = a.m
    # symmetrize structure: adjacency = pattern of A + A^T
    rows = np.repeat(np.arange(m, dtype=np.int64), a.row_lengths)
    cols = a.colidx.astype(np.int64)
    u = np.concatenate([rows, cols])
    v = np.concatenate([cols, rows])
    keep = u != v
    u, v = u[keep], v[keep]
    order = np.lexsort((v, u))
    u, v = u[order], v[order]
    if u.size:
        dedup = np.empty(u.size, dtype=bool)
        dedup[0] = True
        dedup[1:] = (u[1:] != u[:-1]) | (v[1:] != v[:-1])
        u, v = u[dedup], v[dedup]
    indptr = np.zeros(m + 1, dtype=np.int64)
    np.add.at(indptr, u + 1, 1)
    np.cumsum(indptr, out=indptr)
    deg = np.diff(indptr)

    visited = np.zeros(m, dtype=bool)
    result = np.empty(m, dtype=np.int64)
    pos = 0
    # process components in order of minimum degree start vertex
    start_order = np.argsort(deg, kind="stable")
    for s in start_order:
        if visited[s]:
            continue
        # BFS from s with degree-sorted neighbor expansion
        visited[s] = True
        frontier = [s]
        result[pos] = s
        pos += 1
        while frontier:
            nxt = []
            for node in frontier:
                nb = v[indptr[node]:indptr[node + 1]]
                nb = nb[~visited[nb]]
                if nb.size:
                    nb = nb[np.argsort(deg[nb], kind="stable")]
                    visited[nb] = True
                    result[pos:pos + nb.size] = nb
                    pos += nb.size
                    nxt.extend(nb.tolist())
            frontier = nxt
    return result[::-1].copy()  # the "reverse" in RCM


def window_cluster_order(a: CsrMatrix, window: int = 1024,
                         row_block: int = 1024) -> np.ndarray:
    """Column permutation clustering co-accessed columns into windows.

    For each column, find its dominant row-block (the row-block containing
    most of its nonzeros) and sort columns by (dominant block, first row).
    Columns read together end up in the same 1024-wide x-window — the
    pack-time objective of the Pallas windowed kernels.  This is the
    cheap-and-cheerful stand-in for the reference's METIS k-way clustering
    (HyperGraphInterface.cpp:90-92).
    """
    rows = np.repeat(np.arange(a.m, dtype=np.int64), a.row_lengths)
    rb = rows // row_block
    cols = a.colidx.astype(np.int64)
    # dominant row-block per column: mode of rb within each column group
    order = np.lexsort((rb, cols))
    c_s, rb_s = cols[order], rb[order]
    # count (col, rb) pair runs
    if c_s.size == 0:
        return np.arange(a.n, dtype=np.int64)
    new_run = np.empty(c_s.size, dtype=bool)
    new_run[0] = True
    new_run[1:] = (c_s[1:] != c_s[:-1]) | (rb_s[1:] != rb_s[:-1])
    run_id = np.cumsum(new_run) - 1
    run_len = np.bincount(run_id)
    run_col = c_s[new_run]
    run_rb = rb_s[new_run]
    # per column pick the run with max length
    best = {}
    for rc, rr, rl in zip(run_col, run_rb, run_len):
        cur = best.get(rc)
        if cur is None or rl > cur[0]:
            best[rc] = (rl, rr)
    dom = np.full(a.n, np.iinfo(np.int64).max, dtype=np.int64)
    for rc, (_, rr) in best.items():
        dom[rc] = rr
    return np.lexsort((np.arange(a.n), dom)).astype(np.int64)


def reorder_rows(a: CsrMatrix, perm: np.ndarray) -> CsrMatrix:
    """Row-only permutation (y' = y[perm]; x unchanged)."""
    return a.permute_rows(perm.astype(INT_DTYPE))


def reorder_symmetric(a: CsrMatrix,
                      perm: np.ndarray) -> Tuple[CsrMatrix, np.ndarray]:
    """Permute rows AND columns by ``perm`` (square matrices).

    Contract (reference test_spmv.c:95-101,:130-137): with
    ``(A', perm) = reorder_symmetric(A, perm)``, computing
    ``y' = A' @ x[perm]`` gives ``y = scatter(y', perm)``, i.e.
    ``y[perm[i]] = y'[i]``.
    """
    if a.m != a.n:
        raise ValueError("symmetric reorder needs a square matrix")
    inv = np.empty_like(perm)
    inv[perm] = np.arange(len(perm))
    ap = a.permute_rows(perm.astype(INT_DTYPE))
    # renumber columns: new col id = inv[old col id]; re-sort within rows
    rows = np.repeat(np.arange(ap.m, dtype=np.int64), ap.row_lengths)
    cols = inv[ap.colidx]
    return CsrMatrix.from_coo(ap.m, ap.n, rows.astype(INT_DTYPE),
                              cols.astype(INT_DTYPE), ap.vals,
                              sum_duplicates=False), perm


def cached_order(a: CsrMatrix, token: str, kind: str = "rcm",
                 cache_dir: Optional[str] = None) -> np.ndarray:
    """Disk-cached permutation, keyed like the reference's partition cache
    (m, nnz, token → ``cache/<mangled>.npz``, HyperGraphInterface.cpp:22-57).
    """
    mangled = re.sub(r"[^A-Za-z0-9_.-]", "_", f"{token}_{kind}_{a.m}_{a.nnz}")
    path = os.path.join(cache_dir or _CACHE_DIR, mangled + ".npz")
    if os.path.exists(path):
        z = np.load(path)
        if int(z["m"]) == a.m and int(z["nnz"]) == a.nnz:
            return z["perm"]
    if kind == "rcm":
        perm = rcm_order(a)
    elif kind == "window":
        perm = window_cluster_order(a)
    else:
        raise ValueError(f"unknown reorder kind {kind!r}")
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, m=a.m, nnz=a.nnz, perm=perm)
    return perm
