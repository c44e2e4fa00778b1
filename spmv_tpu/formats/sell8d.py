"""SELL-8D: the deep-slice (slot-per-row) tile format for scattered matrices.

SELL-8W (sell8w.py) assigns rows to LANES (128 rows/slice, depth 8/tile) —
ideal when rows have many nonzeros per 1024-column window.  For scattered
matrices (uniform/power-law) almost every (128-row slice, window) pair is
occupied by a FEW nonzeros, and the pack sits at the pairs lower bound
(measured uniform100k: pad 19.6 = the floor for that layout).

SELL-8D turns the tile 90°: a slice is 1024 ROWS and every tile SLOT is a
row — slot (sublane i, lane l) of a slice's tiles always belongs to row
``1024·slice + 128·i + l``.  Tiles stack in DEPTH per (slice, window) pair:
a row with k nonzeros in a window occupies its fixed slot in k depth tiles.
The kernel accumulates raw per-slot products (``acc += v·xg`` — no
sublane reduction, no row mask), and the (slice, window) pair count drops
8× (1024-row slices), so the pad for uniform scatter falls from the 19.6
floor to the per-row depth distribution (measured uniform100k: 9-11).

Gather-consistency constraint (see sell8w.py docstring): the two-stage
``take_along_axis`` means the meta s-field at slot (i, r) selects the
window SUB-ROW used by every slot of sublane i that references residue r.
In slot-mode the slot position is fixed by the row, so two rows of the same
sublane i referencing the same residue r with different sub-rows s collide
and must sit in different depth tiles — resolved by a vectorized
bump-and-rerank repair loop (measured uniform100k λ=0.41: fully resolved,
zero spill); the rare unresolvable leftovers spill to the XLA straggler
path, as does the deep tail above the adaptive depth cap.

The reference analog is CSR5's tile-transposed layout (avx2/format_avx2.h
aosoa_transpose) combined with Balanced2's row redistribution — re-derived
for the (8,128) tile and the Mosaic gather rules.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple, Union

import numpy as np

from ..types import CsrMatrix
from .sell8w import LANES, SUB, WINDOW, value_palette

__all__ = ["Sell8D", "pack_sell8d", "estimate_sell8d_tiles"]

SLICE_ROWS = WINDOW          # 1024 rows per deep slice = one (8,128) block

#: auto depth-cap rule: spill at most this nnz fraction to the XLA path
#: (a spilled nonzero costs ~2-7 ns on the gather floor vs ~25 ns/kB for a
#: whole extra depth tile — trading the extreme tail is always worth it)
AUTO_CAP_SPILL = 0.004


def _first_of_group(keys_sorted):
    """Boolean 'starts a new group' mask for a sorted key array."""
    newg = np.empty(len(keys_sorted), dtype=bool)
    newg[0] = True
    np.not_equal(keys_sorted[1:], keys_sorted[:-1], out=newg[1:])
    return newg


def _rank_in_group(keys) -> np.ndarray:
    """Rank of each element within its equal-key group.

    One stable single-key argsort when unsorted (3× faster than lexsort on
    this host, CLAUDE.md); zero sorts when the keys are already sorted (CSR
    with per-row-sorted columns makes row·nwin+window globally sorted)."""
    n = len(keys)
    base = np.arange(n, dtype=np.int64)
    if np.all(keys[1:] >= keys[:-1]):
        gstart = np.maximum.accumulate(
            np.where(_first_of_group(keys), base, 0))
        return base - gstart
    order = np.argsort(keys, kind="stable")
    ks = keys[order]
    gstart = np.maximum.accumulate(np.where(_first_of_group(ks), base, 0))
    rank = np.empty(n, dtype=np.int64)
    rank[order] = base - gstart
    return rank


class _SortedMembership:
    """Membership / value lookup against an incrementally grown settled set.

    Kept as a short list of sorted key arrays (one per repair round) —
    lookups are a searchsorted per chunk on the (shrinking) query set,
    avoiding any re-sort of the big round-1 array."""

    def __init__(self):
        self._keys = []
        self._vals = []

    def add(self, keys_sorted: np.ndarray,
            vals: Optional[np.ndarray] = None) -> None:
        if len(keys_sorted):
            self._keys.append(keys_sorted)
            self._vals.append(vals)

    def lookup(self, q: np.ndarray):
        """(found_mask, values) — values only meaningful where found."""
        found = np.zeros(len(q), dtype=bool)
        vals = np.zeros(len(q), dtype=np.int64)
        for keys, kv in zip(self._keys, self._vals):
            pos = np.searchsorted(keys, q)
            ok = pos < len(keys)
            hit = np.zeros(len(q), dtype=bool)
            hit[ok] = keys[pos[ok]] == q[ok]
            if kv is not None:
                vals[hit] = kv[pos[hit]]
            found |= hit
        return found, vals


def _auto_cap(rank: np.ndarray, max_spill: float) -> int:
    """Smallest depth cap whose rank-tail spill fits the auto budget."""
    cnt = np.bincount(rank)
    tail = cnt[::-1].cumsum()[::-1]
    budget = max(int(min(AUTO_CAP_SPILL, max_spill / 2) * len(rank)), 1)
    caps = np.nonzero(tail <= budget)[0]
    cap = int(caps[0]) if len(caps) else len(cnt)
    return max(cap, 1)


def pack_sell8d(a: CsrMatrix, g: int = 16, max_pad_ratio: float = 10.0,
                depth_cap: Union[int, str, None] = "auto",
                max_repair: int = 8, max_spill: float = 0.02
                ) -> Tuple["Sell8D", Optional[tuple]]:
    """Pack into the slot-mode deep-slice stream.

    Returns ``(packed, rest)`` where ``rest`` is ``None`` or a
    ``(rows, cols, vals)`` COO remainder — the rank tail above the depth
    cap plus s-table conflicts that survived the repair loop — for the XLA
    straggler path.  Raises ValueError when the pad gate or the spill gate
    fails.

    ``depth_cap``: "auto" picks the smallest cap whose rank-tail spill is
    under :data:`AUTO_CAP_SPILL` (the deep tail is the pad driver: one row
    with k nonzeros in a window forces k full tiles on its pair); an int
    pins it; None disables capping.
    """
    if a.nnz == 0:
        raise ValueError("empty matrix has no SELL-8D packing")
    m, n = a.m, a.n
    nwin = max(-(-n // WINDOW), 1)
    nslices = max(-(-m // SLICE_ROWS), 1)
    lens = a.row_lengths.astype(np.int64)
    rows = np.repeat(np.arange(m, dtype=np.int64), lens)
    cols = a.colidx.astype(np.int64)
    rw = rows * nwin + (cols >> 10)

    rank = _rank_in_group(rw)
    if depth_cap == "auto":
        cap = _auto_cap(rank, max_spill)
    elif depth_cap is None:
        cap = int(rank.max()) + 1
    else:
        cap = int(depth_cap)
    md = cap + 2                       # depth stride for composite keys

    keep0 = rank < cap
    idx = np.nonzero(keep0)[0]
    krw, krank = rw[idx], rank[idx]
    krow, kcol = rows[idx], cols[idx]
    nk = len(idx)
    if nk == 0:
        raise ValueError("sell8d pack kept no nonzeros")
    # derive tile coordinates on the kept set only (one gather each for
    # rows/cols, cheap arithmetic after — 4M-element fancy gathers are the
    # pack's cost center on this host)
    cin = kcol & 1023
    ks = cin >> 7
    kr = cin & 127
    r_in = krow & (SLICE_ROWS - 1)
    ki = r_in >> 7
    l_lane = r_in & 127
    kpair = (krow >> 10) * nwin + (kcol >> 10)

    # Per-pair depth budget dmax = max capped (row, window) group size.
    # The tile count is FIXED at Σ dmax before conflict repair: initial
    # depths spread each row's entries across the budget ((rank + row) mod
    # dmax — balancing cell occupancy cuts the round-1 s-conflict rate
    # ~2×, measured 11% → 5.6% on uniform100k), and repair bumps WRAP
    # within the budget, so conflicts can never grow the pad — whatever a
    # full cycle cannot place spills instead.
    if np.all(krw[1:] >= krw[:-1]):
        gstarts = np.nonzero(_first_of_group(krw))[0]
        gsize = np.diff(np.concatenate([gstarts, [nk]]))
        gpair = kpair[gstarts]
    else:
        og = np.argsort(krw, kind="stable")
        gstarts = np.nonzero(_first_of_group(krw[og]))[0]
        gsize = np.diff(np.concatenate([gstarts, [nk]]))
        gpair = kpair[og][gstarts]
    # dmax per pair: reduceat over the pair-sorted group list
    po = np.argsort(gpair, kind="stable")
    gp_s = gpair[po]
    pstarts = np.nonzero(_first_of_group(gp_s))[0]
    pairs_unique = gp_s[pstarts]
    tiles_per_pair = np.maximum.reduceat(gsize[po], pstarts)
    prank_e = np.searchsorted(pairs_unique, kpair)
    kdmax = tiles_per_pair[prank_e]
    depth = (krank + krow) % kdmax

    def cell_key(p, d, i, r):
        return (p * md + d) * WINDOW + i * LANES + r

    # round 1 (full set): depths are distinct per (row, window) group by
    # construction; only the shared s-table can collide
    cell = cell_key(kpair, depth, ki, kr)
    o = np.argsort(cell, kind="stable")
    cs = cell[o]
    pos = np.arange(nk, dtype=np.int64)
    winner = np.maximum.accumulate(np.where(_first_of_group(cs), pos, 0))
    conflict = np.zeros(nk, dtype=bool)
    conflict[o] = ks[o] != ks[o[winner]]

    slots = _SortedMembership()
    cells = _SortedMembership()
    ok = ~conflict
    slot_keys = krw * md + depth       # unique per kept entry
    sk = slot_keys[ok]
    slots.add(sk if np.all(sk[1:] >= sk[:-1]) else np.sort(sk))
    mask_sorted = ok[o]
    cells.add(cs[mask_sorted], ks[o][mask_sorted])

    sub = np.nonzero(conflict)[0]
    rounds = max(max_repair, cap + 2)  # let a bump scan the full budget
    for _ in range(rounds):
        if not len(sub):
            break
        depth[sub] = (depth[sub] + 1) % kdmax[sub]
        k1 = krw[sub] * md + depth[sub]
        dup, _ = slots.lookup(k1)
        o1 = np.argsort(k1, kind="stable")
        d_in = np.zeros(len(sub), dtype=bool)
        d_in[o1] = ~_first_of_group(k1[o1])
        dup |= d_in
        cq = cell_key(kpair[sub], depth[sub], ki[sub], kr[sub])
        found, wsv = cells.lookup(cq)
        o2 = np.argsort(cq, kind="stable")
        cqs = cq[o2]
        p2 = np.arange(len(sub), dtype=np.int64)
        win2 = np.maximum.accumulate(np.where(_first_of_group(cqs), p2, 0))
        ss = ks[sub]
        sc_in = np.zeros(len(sub), dtype=bool)
        sc_in[o2] = ss[o2] != ss[o2[win2]]
        sconf = np.where(found, wsv != ss, sc_in)
        conf = dup | sconf
        slots.add(np.sort(k1[~conf]))
        oksort = (~conf)[o2]
        cells.add(cqs[oksort], ss[o2][oksort])
        sub = sub[conf]
    still = np.zeros(nk, dtype=bool)
    still[sub] = True

    spill = ~keep0
    spill[idx[still]] = True
    frac = float(spill.sum()) / len(rows)
    if frac > max_spill:
        raise ValueError(
            f"sell8d spill fraction {frac:.3f} exceeds {max_spill}")
    fin = ~still
    depth_k, pair_k = depth[fin], kpair[fin]
    i_k, l_k = ki[fin], l_lane[fin]
    s_k, r_k = ks[fin], kr[fin]
    vals_k = np.asarray(a.vals)[idx[fin]]
    nnz_kept = len(vals_k)
    if nnz_kept == 0:
        raise ValueError("sell8d pack kept no nonzeros")

    # per-slice padding to a multiple of g (min g — every output block
    # must be touched at least once to get zero-initialized)
    tiles_per_pair = tiles_per_pair.astype(np.int64)
    slice_of_pair = pairs_unique // nwin
    slice_tiles = np.zeros(nslices, dtype=np.int64)
    np.add.at(slice_tiles, slice_of_pair, tiles_per_pair)
    slice_padded = np.maximum(-(-slice_tiles // g) * g, g)
    ntiles = int(slice_padded.sum())
    pad_ratio = ntiles * WINDOW / nnz_kept
    if pad_ratio > max_pad_ratio:
        raise ValueError(
            f"sell8d pad ratio {pad_ratio:.1f} exceeds {max_pad_ratio}")

    slice_base = np.concatenate([[0], np.cumsum(slice_padded)[:-1]])
    # within-slice running offset per pair (pairs are slice-major sorted)
    run = np.concatenate([[0], np.cumsum(tiles_per_pair)[:-1]])
    slice_first = np.concatenate(
        [[True], slice_of_pair[1:] != slice_of_pair[:-1]])
    slice_run0 = np.maximum.accumulate(np.where(slice_first, run, 0))
    pair_base = slice_base[slice_of_pair] + (run - slice_run0)

    tile = pair_base[prank_e[fin]] + depth_k

    # meta: slot fields (residue bits 0-6, value code bits 10-15) live at
    # (tile, i, l) — unique per entry, plain fancy assignment; the shared
    # s-table field (bits 7-9) lives at (tile, i, r) — entries sharing a
    # cell agree on s by construction, so duplicate writes are idempotent.
    # Two planes OR-merged once (bitwise_or.at measured ~20 s at 4M nnz).
    slot_flat = (tile * SUB + i_k) * LANES + l_k
    cell_flat = (tile * SUB + i_k) * LANES + r_k
    meta = np.zeros(ntiles * SUB * LANES, dtype=np.uint16)
    meta[slot_flat] = r_k.astype(np.uint16)
    s_plane = np.zeros(ntiles * SUB * LANES, dtype=np.uint16)
    s_plane[cell_flat] = (s_k.astype(np.uint16) << np.uint16(7))
    np.bitwise_or(meta, s_plane, out=meta)
    del s_plane

    pal = value_palette(vals_k)
    vals_arr = None
    if pal is not None:
        palette, codes = pal
        value_mode = "palette"
        code_plane = np.zeros(ntiles * SUB * LANES, dtype=np.uint16)
        code_plane[slot_flat] = codes.view(np.uint16) << np.uint16(10)
        np.bitwise_or(meta, code_plane, out=meta)
        del code_plane
    else:
        import ml_dtypes
        v32 = vals_k.astype(np.float32)
        lossless = bool(np.array_equal(
            v32.astype(ml_dtypes.bfloat16).astype(np.float32), v32))
        dt = ml_dtypes.bfloat16 if lossless else np.float32
        value_mode = "bf16" if lossless else "f32"
        vals_arr = np.zeros(ntiles * SUB * LANES, dtype=dt)
        vals_arr[slot_flat] = v32.astype(dt)
        vals_arr = vals_arr.reshape(ntiles, SUB, LANES)
        palette = None
    meta = meta.reshape(ntiles, SUB, LANES)

    tinfo = np.zeros(ntiles, dtype=np.int32)
    # expand (pair → its tile range) to set the window id on every real tile
    w_of_pair = (pairs_unique % nwin).astype(np.int64)
    total_real = int(tiles_per_pair.sum())
    intra = (np.arange(total_real, dtype=np.int64)
             - np.repeat(np.concatenate([[0],
                                         np.cumsum(tiles_per_pair)[:-1]]),
                         tiles_per_pair))
    tile_ids = np.repeat(pair_base, tiles_per_pair) + intra
    tinfo[tile_ids] = (np.repeat(w_of_pair, tiles_per_pair) << 3) \
        .astype(np.int32)

    nsteps = ntiles // g
    step_slice = np.repeat(np.arange(nslices, dtype=np.int64),
                           slice_padded // g)
    first = np.ones(nsteps, dtype=np.int64)
    first[1:] = (step_slice[1:] != step_slice[:-1]).astype(np.int64)
    ginfo = (step_slice << 1 | first).astype(np.int32)

    packed = Sell8D(
        m=m, n=n, nnz_stored=nnz_kept, nslices=nslices, g=g,
        ntiles=ntiles, nsteps=nsteps, value_mode=value_mode,
        tinfo=tinfo, ginfo=ginfo, meta=meta.view(np.int16),
        vals=vals_arr, palette=palette)
    rest = None
    if spill.any():
        rest = (rows[spill], cols[spill], np.asarray(a.vals)[spill])
    return packed, rest


@dataclasses.dataclass(frozen=True)
class Sell8D:
    """Grouped slot-mode tile stream for the v2 kernel's slot_mode path."""

    m: int
    n: int
    nnz_stored: int
    nslices: int               # ceil(m / 1024)
    g: int                     # tiles per grid step
    ntiles: int                # padded to G per slice
    nsteps: int
    value_mode: str            # "palette" | "bf16" | "f32"
    tinfo: np.ndarray          # (ntiles,) int32: window << 3
    ginfo: np.ndarray          # (nsteps,) int32: slice << 1 | first_flag
    meta: np.ndarray           # (ntiles, 8, 128) int16 (s<<7|r | code<<10)
    vals: Optional[np.ndarray]   # (ntiles, 8, 128), None for palette
    palette: Optional[np.ndarray]  # (128,) f32

    @property
    def pad_ratio(self) -> float:
        return self.ntiles * WINDOW / max(self.nnz_stored, 1)


def estimate_sell8d_tiles(a: CsrMatrix,
                          depth_cap: Optional[int] = None) -> int:
    """Lower-bound tile count: Σ over (1024-row slice, window) pairs of the
    max per-row nonzero count (clipped to ``depth_cap``) — ignores s-table
    conflicts (zero at scattered occupancy) and the per-slice G-padding
    (≤ g−1 per slice)."""
    if a.nnz == 0:
        return 0
    nwin = max(-(-a.n // WINDOW), 1)
    lens = a.row_lengths.astype(np.int64)
    rows = np.repeat(np.arange(a.m, dtype=np.int64), lens)
    rw = rows * nwin + (a.colidx.astype(np.int64) >> 10)
    if not np.all(rw[1:] >= rw[:-1]):
        rw = np.sort(rw)
    newg = _first_of_group(rw)
    starts = np.nonzero(newg)[0]
    counts = np.diff(np.concatenate([starts, [len(rw)]]))
    if depth_cap is not None:
        counts = np.minimum(counts, depth_cap)
    rw_u = rw[starts]
    pw = ((rw_u // nwin) >> 10) * nwin + rw_u % nwin
    if not np.all(pw[1:] >= pw[:-1]):
        o = np.argsort(pw, kind="stable")
        pw, counts = pw[o], counts[o]
    pstarts = np.nonzero(_first_of_group(pw))[0]
    return int(np.maximum.reduceat(counts, pstarts).sum())


def estimate_sell8d_auto(a: CsrMatrix,
                         max_spill: float = 0.02) -> Tuple[int, int, int]:
    """(tiles, cap, spilled_nnz) under the auto depth-cap rule — the
    inspector's pre-pack cost probe (mirrors pack_sell8d's cap choice)."""
    if a.nnz == 0:
        return 0, 0, 0
    nwin = max(-(-a.n // WINDOW), 1)
    lens = a.row_lengths.astype(np.int64)
    rows = np.repeat(np.arange(a.m, dtype=np.int64), lens)
    rw = rows * nwin + (a.colidx.astype(np.int64) >> 10)
    rank = _rank_in_group(rw)
    cap = _auto_cap(rank, max_spill)
    spilled = int((rank >= cap).sum())
    return estimate_sell8d_tiles(a, depth_cap=cap), cap, spilled
