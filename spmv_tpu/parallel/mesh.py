"""Multi-chip SpMV over a device mesh.

TPU re-design of the reference's NUMA-partitioned sample
(``src/samples/numa.c:268-439``), which splits matrix rows into per-NUMA-node
blocks (and optionally the x vector too) and runs pinned threads.  Here the
"nodes" are TPU chips on a 1-D mesh axis:

* **Row sharding**: rows are split into one contiguous block per device,
  balanced by *nnz* rather than row count — the same quantile splitter the
  reference uses per thread (``init_csrSplitter_balanced``,
  parallel_balanced_spmv.c:39-58), reused across chips exactly as SURVEY.md
  §7 step 6 prescribes.
* **Static shapes**: every device's CSR streams are padded to the mesh-wide
  maximum and stacked into ``(ndev, ...)`` arrays so one jitted ``shard_map``
  program serves all shards.
* **x placement**: ``x_mode="replicated"`` keeps x whole on every chip (the
  reference numa sample's fallback; right when n is small).
  ``x_mode="allgather"`` shards x across the mesh and all-gathers it over ICI
  inside the shard — the analog of the reference's cross-node reads
  (numa.c:151-153), but as an explicit XLA collective the compiler can
  overlap with compute.
* **No scatter**: each shard computes its row block with the tiled-scan plan
  (ops/xla_csr.py); the blocks concatenate along the mesh axis and a single
  static gather restores the (padded) row order.

Works identically on a real TPU mesh and on the 8-device virtual CPU mesh
used by tests and the driver's dry-run.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P, NamedSharding

from ..types import CsrMatrix, INT_DTYPE
from ..formats.partition import balanced_row_splitter
from ..ops import xla_csr

__all__ = ["DistSpmvPlan", "build_dist_plan", "dist_spmv",
           "DistDiaPlan", "build_dist_dia_plan", "dist_dia_spmv",
           "DistSell8WPlan", "build_dist_sell8w_plan", "dist_sell8w_spmv",
           "DistSell8DPlan", "build_dist_sell8d_plan", "dist_sell8d_spmv",
           "DistSell8DColsPlan", "build_dist_sell8d_cols_plan",
           "dist_sell8d_cols_spmv",
           "DistAutoPlan", "build_dist_auto", "dist_auto_spmv",
           "make_mesh_1d"]


def make_mesh_1d(n_devices: Optional[int] = None, axis: str = "rows") -> Mesh:
    """A 1-D mesh over the first ``n_devices`` devices."""
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


@dataclasses.dataclass
class DistSpmvPlan:
    """Row-sharded SpMV plan: static metadata + device-sharded arrays."""

    mesh: Mesh
    axis: str
    ndev: int
    m: int
    n: int
    nnz: int
    tile: int
    mr: int                      # padded rows per shard
    row_splitter: np.ndarray     # (ndev+1,) global row boundaries
    x_mode: str                  # "replicated" | "allgather"
    # sharded device arrays, leading dim = ndev:
    colidx_pad: jax.Array        # (ndev, L) local col indices (globally valid)
    vals_pad: jax.Array          # (ndev, L)
    row_start: jax.Array         # (ndev, mr) positions into local padded stream
    row_end: jax.Array           # (ndev, mr)
    out_index: jax.Array         # (m,) gather map from (ndev*mr,) to row order
    identity_out: bool = False   # out_index is arange(m) → skip the gather
    # halo mode: separate LOCAL stream (no dependency on the ppermute ring,
    # overlappable with the exchange); the main stream holds the REMOTE nnz
    loc_colidx: Any = None       # (ndev, L2)
    loc_vals: Any = None
    loc_row_start: Any = None
    loc_row_end: Any = None
    loc_tile: int = 0
    _exec: object = None         # cached jitted executable

    def __call__(self, x) -> jax.Array:
        return dist_spmv(self, x)


def _pad_to(arr: np.ndarray, length: int, fill=0) -> np.ndarray:
    out = np.full(length, fill, dtype=arr.dtype)
    out[: len(arr)] = arr
    return out


def _put_sharded(arr, sharding):
    """``device_put`` that also works on meshes spanning multiple processes.

    Multi-host placement (jax.distributed) cannot device_put onto
    non-addressable devices; build the global array from the host copy via
    per-shard callbacks instead (every process holds the same host array —
    the builders are deterministic).
    """
    local = jax.process_count() == 1 or all(
        d.process_index == jax.process_index()
        for d in sharding.device_set)
    if local:
        return jax.device_put(arr, sharding)
    arr = np.asarray(arr)
    return jax.make_array_from_callback(arr.shape, sharding,
                                        lambda idx: arr[idx])


def build_dist_plan(a: CsrMatrix, mesh: Mesh, axis: str = "rows",
                    tile: int = 2048, x_mode: str = "replicated",
                    halo_shards: int = 1) -> DistSpmvPlan:
    """Partition rows over the mesh (nnz-balanced) and place shards.

    The per-device block construction mirrors the reference numa sample's
    per-node sub-matrix build (numa.c:277-304) but with static padded shapes
    so XLA compiles one program for all shards.

    ``x_mode="halo"``: x is sharded in equal blocks and each shard fetches
    only its neighbor blocks via ppermute rings — communication is
    O(halo·n/ndev) per chip instead of O(n) (the TPU analog of the
    reference numa sample's neighbor reads, numa.c:151-153).  The ring
    depth is computed from the matrix (``halo_shards`` is a floor); rows
    stay nnz-balanced.  Raises ValueError when columns reach so far that
    the ring would cover the whole mesh (reorder for locality first —
    formats/reorder.py ``cluster_order`` — or use "allgather").
    """
    if x_mode not in ("replicated", "allgather", "halo"):
        raise ValueError(f"unknown x_mode {x_mode!r}")
    ndev = mesh.shape[axis]
    if x_mode == "halo":
        return _build_dist_plan_halo(a, mesh, axis, tile, halo_shards)
    splitter = balanced_row_splitter(a.rowptr, ndev).astype(np.int64)
    rowptr64 = a.rowptr.astype(np.int64)

    mr = max(int(np.max(splitter[1:] - splitter[:-1])), 1)
    shard_nnz = rowptr64[splitter[1:]] - rowptr64[splitter[:-1]]
    # local stream length: +1 for the prepended zero (see TileScanPlan), then
    # rounded to the tile size; same L for every shard.
    L = max(-(-(int(shard_nnz.max()) + 1) // tile) * tile, tile)

    colidx = np.zeros((ndev, L), dtype=INT_DTYPE)
    vals = np.zeros((ndev, L), dtype=a.vals.dtype)
    row_start = np.zeros((ndev, mr), dtype=INT_DTYPE)
    row_end = np.zeros((ndev, mr), dtype=INT_DTYPE)
    for d in range(ndev):
        r0, r1 = int(splitter[d]), int(splitter[d + 1])
        p0, p1 = int(rowptr64[r0]), int(rowptr64[r1])
        nr = r1 - r0
        colidx[d, 1: 1 + p1 - p0] = a.colidx[p0:p1]
        vals[d, 1: 1 + p1 - p0] = a.vals[p0:p1]
        # With the prepended zero, the original stream element p sits at
        # padded index p - p0 + 1, so the exclusive prefix sum at boundary p
        # equals the INCLUSIVE scan at index p - p0; padded rows point at
        # index 0 (start == end) → y = 0.
        row_start[d, :nr] = (rowptr64[r0:r1] - p0).astype(INT_DTYPE)
        row_end[d, :nr] = (rowptr64[r0 + 1: r1 + 1] - p0).astype(INT_DTYPE)

    # y comes out as (ndev*mr,) = concat of padded shard blocks; row i of the
    # global matrix lives at shard d(i), local slot i - splitter[d].
    owner = np.searchsorted(splitter, np.arange(a.m), side="right") - 1
    out_index = (owner * mr + (np.arange(a.m) - splitter[owner])).astype(INT_DTYPE)
    # When the nnz-balanced split happens to be uniform, the gather is the
    # identity — skip it (per-exec XLA gathers over all m rows sit on the
    # 0.13-0.5 Gelem/s path PERFNOTES.md forbids on large streams).
    identity_out = bool(np.array_equal(out_index, np.arange(a.m)))

    sh = functools.partial(NamedSharding, mesh)
    dev_sharded = lambda arr: jax.device_put(arr, sh(P(axis)))
    plan = DistSpmvPlan(
        mesh=mesh, axis=axis, ndev=ndev, m=a.m, n=a.n, nnz=a.nnz,
        tile=tile, mr=mr, row_splitter=splitter, x_mode=x_mode,
        colidx_pad=dev_sharded(colidx),
        vals_pad=dev_sharded(vals),
        row_start=dev_sharded(row_start),
        row_end=dev_sharded(row_end),
        out_index=jax.device_put(out_index, sh(P())),
        identity_out=identity_out,
    )
    plan._exec = _build_executable(plan)
    return plan


def _build_dist_plan_halo(a: CsrMatrix, mesh: Mesh, axis: str,
                          tile: int, h_min: int,
                          balance: str = "nnz") -> DistSpmvPlan:
    """Halo-exchange plan on an nnz-balanced (or uniform) row split.

    x is sharded in UNIFORM blocks of bx = ceil(n/ndev); rows split by nnz
    quantiles (``balance="nnz"``, the reference splitter semantics) or
    uniformly.  The ring depth h is computed from the data: the maximum
    x-block distance any shard's columns reach (a locality reorder —
    formats/reorder.py cluster_order — shrinks it).  Round-1 limitation
    "halo forces a uniform row split" (VERDICT weak #8) is gone.
    """
    ndev = mesh.shape[axis]
    if a.m != a.n:
        raise ValueError("halo mode requires a square matrix")
    rowptr64 = a.rowptr.astype(np.int64)
    if balance == "nnz":
        splitter = balanced_row_splitter(a.rowptr, ndev).astype(np.int64)
    else:
        splitter = np.minimum(np.arange(ndev + 1, dtype=np.int64)
                              * max(-(-a.m // ndev), 1), a.m)
    mr = max(int(np.max(splitter[1:] - splitter[:-1])), 1)

    # x blocks FOLLOW the row splitter (block d = x[splitter[d]:splitter[d+1]]
    # padded to mr) so nnz balance never inflates the ring depth; the input
    # rearrangement gather is skipped when the split happens to be uniform.
    owner_of = np.searchsorted(splitter, np.arange(a.m), side="right") - 1
    out_index = (owner_of * mr + (np.arange(a.m) - splitter[owner_of])) \
        .astype(INT_DTYPE)
    identity_out = bool(np.array_equal(out_index, np.arange(a.m)))

    # required ring depth: max row-block distance of any shard's columns,
    # measured MODULO ndev (the ppermute rings are circular, so a
    # cyclic-banded matrix — row 0 referencing column n-1 — is depth 1 via
    # wrap-around, not ndev-1; ADVICE round 2)
    h = h_min
    for d in range(ndev):
        p0, p1 = int(rowptr64[splitter[d]]), int(rowptr64[splitter[d + 1]])
        if p1 > p0:
            own = owner_of[a.colidx[p0:p1]]
            fw = (own - d) % ndev
            h = max(h, int(np.minimum(fw, (ndev - fw) % ndev).max()))
    if 2 * h + 1 > ndev:
        raise ValueError(
            f"halo depth {h} needs {2 * h + 1} blocks > ndev={ndev}; "
            "columns reach too far — reorder for locality (cluster/rcm) "
            "or use x_mode='allgather'")

    # Two nnz streams per shard — LOCAL (column owned by the shard itself)
    # and REMOTE (column in a neighbor block).  The local scan has no data
    # dependency on the ppermute ring, so XLA can overlap the halo exchange
    # with the bulk of the compute (SURVEY §7 step 6's "free win"; the
    # locality reorder makes the local stream the large one).
    loc_counts = np.zeros((ndev, mr), dtype=np.int64)
    rem_counts = np.zeros((ndev, mr), dtype=np.int64)
    loc_streams, rem_streams = [], []
    for d in range(ndev):
        r0, r1 = int(splitter[d]), int(splitter[d + 1])
        p0, p1 = int(rowptr64[r0]), int(rowptr64[r1])
        cols_d = a.colidx[p0:p1].astype(np.int64)
        vals_d = a.vals[p0:p1]
        own = owner_of[cols_d] if cols_d.size else cols_d
        is_loc = own == d
        # per-row counts (rows are sorted in the CSR stream)
        rows_d = np.repeat(np.arange(r1 - r0),
                           np.diff(rowptr64[r0:r1 + 1]).astype(np.int64))
        np.add.at(loc_counts[d], rows_d[is_loc], 1)
        np.add.at(rem_counts[d], rows_d[~is_loc], 1)
        # window position of block ``own`` in x_ext = [d-h .. d+h] blocks,
        # ring-circular: equals own - (d - h) when no wrap occurs
        local = ((own - d + h) % ndev) * mr + (cols_d - splitter[own])
        loc_streams.append(((cols_d - splitter[d])[is_loc],
                            vals_d[is_loc]))
        rem_streams.append((local[~is_loc], vals_d[~is_loc]))

    def _stack(streams, counts):
        ln = max(max((len(c) for c, _ in streams), default=0) + 1, 1)
        L = max(-(-ln // tile) * tile, tile)
        colidx = np.zeros((ndev, L), dtype=INT_DTYPE)
        vals = np.zeros((ndev, L), dtype=a.vals.dtype)
        row_start = np.zeros((ndev, mr), dtype=INT_DTYPE)
        row_end = np.zeros((ndev, mr), dtype=INT_DTYPE)
        for d, (c, v) in enumerate(streams):
            colidx[d, 1: 1 + len(c)] = c.astype(INT_DTYPE)
            vals[d, 1: 1 + len(v)] = v
            ends = np.cumsum(counts[d])
            row_start[d] = (ends - counts[d]).astype(INT_DTYPE)
            row_end[d] = ends.astype(INT_DTYPE)
        return colidx, vals, row_start, row_end

    colidx, vals, row_start, row_end = _stack(rem_streams, rem_counts)
    lcol, lval, lstart, lend = _stack(loc_streams, loc_counts)

    sh = functools.partial(NamedSharding, mesh)
    dev_sharded = lambda arr: _put_sharded(arr, sh(P(axis)))
    plan = DistSpmvPlan(
        mesh=mesh, axis=axis, ndev=ndev, m=a.m, n=a.n, nnz=a.nnz,
        tile=tile, mr=mr, row_splitter=splitter, x_mode="halo",
        colidx_pad=dev_sharded(colidx),
        vals_pad=dev_sharded(vals),
        row_start=dev_sharded(row_start),
        row_end=dev_sharded(row_end),
        out_index=_put_sharded(out_index, sh(P())),
        identity_out=identity_out,
        loc_colidx=dev_sharded(lcol),
        loc_vals=dev_sharded(lval),
        loc_row_start=dev_sharded(lstart),
        loc_row_end=dev_sharded(lend),
        loc_tile=tile,
    )
    plan._halo = h
    plan._bx = mr
    if not identity_out:
        # input-side rearrangement: x into splitter-aligned blocks (pads
        # read x_pad[m] == 0).  One n-scale gather per exec on non-uniform
        # splits — skipped entirely for uniform ones.
        base = splitter[:-1, None] + np.arange(mr)[None, :]
        lens = (splitter[1:] - splitter[:-1])[:, None]
        in_index = np.where(np.arange(mr)[None, :] < lens, base,
                            a.m).reshape(-1)
        plan._in_index = jax.device_put(in_index.astype(INT_DTYPE),
                                        NamedSharding(mesh, P()))
    else:
        plan._in_index = None
    plan._exec = _build_executable(plan)
    return plan


def _build_executable(plan: DistSpmvPlan):
    mesh, axis = plan.mesh, plan.axis
    x_sharded = plan.x_mode == "allgather"
    halo = getattr(plan, "_halo", 0) if plan.x_mode == "halo" else 0
    ndev = plan.ndev

    identity_out = plan.identity_out
    m = plan.m

    if halo:
        def shard_body(colidx, vals, row_start, row_end,
                       lcol, lval, lstart, lend, x):
            # assemble [own-h .. own+h] blocks via ppermute rings; circular
            # wrap values are dead weight (columns never escape the window,
            # enforced at build), localized indices point into this window.
            # The LOCAL stream depends only on the own block, so XLA is free
            # to overlap the ring exchange with it (the two scans join only
            # at the final add — SURVEY §7 step 6's comm/compute overlap).
            xb = x[0]
            parts = [xb]
            fwd = xb
            bwd = xb
            for _ in range(halo):
                fwd = jax.lax.ppermute(
                    fwd, axis, [(i, (i + 1) % ndev) for i in range(ndev)])
                bwd = jax.lax.ppermute(
                    bwd, axis, [(i, (i - 1) % ndev) for i in range(ndev)])
                parts = [fwd] + parts + [bwd]
            x_ext = jnp.concatenate(parts)
            y_loc = xla_csr.scan_spmv_tiled(lcol[0], lval[0], lstart[0],
                                            lend[0], xb,
                                            tile=plan.loc_tile)
            y_rem = xla_csr.scan_spmv_tiled(colidx[0], vals[0],
                                            row_start[0], row_end[0],
                                            x_ext, tile=plan.tile)
            return (y_loc + y_rem)[None, :]

        smap = jax.shard_map(
            shard_body, mesh=mesh,
            in_specs=(P(axis),) * 8 + (P(axis),),
            out_specs=P(axis),
        )

        @jax.jit
        def run_halo(colidx, vals, row_start, row_end,
                     lcol, lval, lstart, lend, x, out_index):
            x = x.reshape(ndev, -1)
            y_blocks = smap(colidx, vals, row_start, row_end,
                            lcol, lval, lstart, lend, x)
            if identity_out:
                return y_blocks.reshape(-1)[:m]
            return xla_csr.gather_x(y_blocks.reshape(-1), out_index)

        return run_halo

    def shard_body(colidx, vals, row_start, row_end, x):
        # blocks arrive as (1, L) / (1, mr) — one shard of the leading dim
        if x_sharded:
            x = jax.lax.all_gather(x, axis, tiled=True)
        y = xla_csr.scan_spmv_tiled(colidx[0], vals[0], row_start[0],
                                    row_end[0], x, tile=plan.tile)
        return y[None, :]

    smap = jax.shard_map(
        shard_body, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis),
                  P(axis) if x_sharded else P()),
        out_specs=P(axis),
    )

    @jax.jit
    def run(colidx, vals, row_start, row_end, x, out_index):
        y_blocks = smap(colidx, vals, row_start, row_end, x)  # (ndev*mr,)
        if identity_out:
            # uniform splits lay blocks out in row order already — the gather
            # would be pure waste on the slow scalar path (PERFNOTES.md)
            return y_blocks.reshape(-1)[:m]
        return xla_csr.gather_x(y_blocks.reshape(-1), out_index)

    return run


def _pad_x(x: jax.Array, n: int, n_pad: int) -> jax.Array:
    """Zero-pad x from n to n_pad (even sharding for sharded x modes)."""
    if n_pad == n:
        return x
    return jnp.concatenate([x, jnp.zeros(n_pad - n, x.dtype)])


def dist_spmv(plan: DistSpmvPlan, x) -> jax.Array:
    """Execute y = A @ x across the mesh."""
    x = jnp.asarray(x)
    if x.shape != (plan.n,):
        raise ValueError(f"x has shape {x.shape}, expected ({plan.n},)")
    if plan.x_mode == "allgather":
        x = _pad_x(x, plan.n, -(-plan.n // plan.ndev) * plan.ndev)
        x = jax.device_put(x, NamedSharding(plan.mesh, P(plan.axis)))
    elif plan.x_mode == "halo":
        if plan._in_index is None:          # uniform split: pure zero-pad
            x = _pad_x(x, plan.n, plan._bx * plan.ndev)
        else:                               # splitter-aligned block gather
            x_pad = jnp.concatenate([x, jnp.zeros(1, x.dtype)])
            x = xla_csr.gather_x(x_pad, plan._in_index)
        x = jax.device_put(x, NamedSharding(plan.mesh, P(plan.axis)))
    else:
        x = jax.device_put(x, NamedSharding(plan.mesh, P()))
    if plan.x_mode == "halo":
        return plan._exec(plan.colidx_pad, plan.vals_pad, plan.row_start,
                          plan.row_end, plan.loc_colidx, plan.loc_vals,
                          plan.loc_row_start, plan.loc_row_end, x,
                          plan.out_index)
    return plan._exec(plan.colidx_pad, plan.vals_pad, plan.row_start,
                      plan.row_end, x, plan.out_index)


# ---------------------------------------------------------------------------
# Distributed DIA (banded) plan — zero-gather SpMV across the mesh.
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class DistDiaPlan:
    """Row-blocked DIA over a 1-D mesh: shard d owns rows
    [d*mr, (d+1)*mr); each shard runs the shifted-stream FMA plan
    (ops/xla_csr.dia_spmv) against the replicated (or all-gathered) x.

    The banded analog of the reference's NUMA row-blocking (numa.c:277-304):
    where the general plan balances nnz, DIA rows carry uniform work so the
    split is uniform in rows.

    ``x_mode="halo"`` is the true halo exchange SURVEY.md §7 step 6 calls
    for: x is sharded like the rows and each shard ppermutes only the band
    edges (max |offset| elements) to its neighbors — communication shrinks
    from O(n) per chip (allgather) to O(bandwidth), riding neighbor ICI
    links.  Wrap-around edge values are harmless: the diagonal data stores
    structural zeros outside the band.  Requires m == n and
    max |offset| ≤ n/ndev.
    """

    mesh: Mesh
    axis: str
    ndev: int
    m: int
    n: int
    nnz: int
    offsets: tuple
    mr: int                     # rows per shard (padded)
    data: jax.Array             # (ndev, ndiags, mr) sharded
    x_mode: str
    _exec: object = None

    def __call__(self, x) -> jax.Array:
        return dist_dia_spmv(self, x)


def build_dist_dia_plan(a: CsrMatrix, mesh: Mesh, axis: str = "rows",
                        x_mode: str = "replicated") -> DistDiaPlan:
    from ..formats.dia import pack_dia
    if x_mode not in ("replicated", "allgather", "halo"):
        raise ValueError(f"unknown x_mode {x_mode!r}")
    d = pack_dia(a)
    ndev = mesh.shape[axis]
    mr = max(-(-a.m // ndev), 1)
    if x_mode == "halo":
        if a.m != a.n:
            raise ValueError("halo mode requires a square matrix")
        h = max((max(abs(int(o)) for o in d.offsets), 1)) \
            if len(d.offsets) else 1
        if h > mr:
            raise ValueError(
                f"halo {h} exceeds shard width {mr}; use allgather")
    data = np.zeros((ndev, len(d.offsets), mr), dtype=d.data.dtype)
    for dev in range(ndev):
        r0 = dev * mr
        r1 = min(r0 + mr, a.m)
        if r1 > r0:
            data[dev, :, : r1 - r0] = d.data[:, r0:r1]
    plan = DistDiaPlan(
        mesh=mesh, axis=axis, ndev=ndev, m=a.m, n=a.n, nnz=a.nnz,
        offsets=tuple(int(o) for o in d.offsets), mr=mr,
        data=jax.device_put(data, NamedSharding(mesh, P(axis))),
        x_mode=x_mode,
    )
    plan._exec = _build_dia_executable(plan)
    return plan


def _build_dia_executable(plan: DistDiaPlan):
    from ..ops import xla_csr
    mesh, axis = plan.mesh, plan.axis
    x_sharded = plan.x_mode == "allgather"
    mr, n, offsets = plan.mr, plan.n, plan.offsets
    ndev = plan.ndev

    if plan.x_mode == "halo":
        h = max(max(abs(int(o)) for o in offsets), 1) if offsets else 1
        fwd = [(i, (i + 1) % ndev) for i in range(ndev)]
        bwd = [(i, (i - 1) % ndev) for i in range(ndev)]

        def shard_body(data, x):
            if not offsets:
                return jnp.zeros((1, mr), x.dtype)
            xb = x[0]                                   # (mx,) local block
            # band edges ride neighbor links only (O(h) words per shard)
            from_left = jax.lax.ppermute(xb[-h:], axis, fwd)
            from_right = jax.lax.ppermute(xb[:h], axis, bwd)
            x_ext = jnp.concatenate([from_left, xb, from_right])
            acc = jnp.zeros(mr, x.dtype)
            for k, o in enumerate(offsets):
                seg = jax.lax.dynamic_slice_in_dim(x_ext, h + o, mr)
                acc = acc + data[0, k] * seg
            return acc[None, :]

        smap = jax.shard_map(
            shard_body, mesh=mesh,
            in_specs=(P(axis), P(axis)),
            out_specs=P(axis),
        )

        @jax.jit
        def run(data, x):
            return smap(data, x.reshape(ndev, -1)).reshape(-1)

        return run

    def shard_body(data, x):
        if x_sharded:
            x = jax.lax.all_gather(x, axis, tiled=True)
        if not offsets:                  # empty matrix: y = 0
            return jnp.zeros((1, mr), x.dtype)
        # shard d computes rows [d*mr, (d+1)*mr): global row i = d*mr + il,
        # so its x offsets shift by +d*mr relative to the local row index.
        dev = jax.lax.axis_index(axis)
        row0 = dev * mr
        # pad x so every (offset + row0) slice is in range
        omin, omax = min(offsets), max(offsets)
        pad_l = max(0, -omin)
        pad_r = max(0, mr * plan.ndev + omax - n) + mr
        xpad = jnp.concatenate([
            jnp.zeros(pad_l, x.dtype), x, jnp.zeros(pad_r, x.dtype)])
        acc = jnp.zeros(mr, x.dtype)
        for k, o in enumerate(offsets):
            seg = jax.lax.dynamic_slice_in_dim(xpad, pad_l + o + row0, mr)
            acc = acc + data[0, k] * seg
        return acc[None, :]

    smap = jax.shard_map(
        shard_body, mesh=mesh,
        in_specs=(P(axis), P(axis) if x_sharded else P()),
        out_specs=P(axis),
    )

    @jax.jit
    def run(data, x):
        return smap(data, x).reshape(-1)

    return run


def dist_dia_spmv(plan: DistDiaPlan, x) -> jax.Array:
    x = jnp.asarray(x)
    if x.shape != (plan.n,):
        raise ValueError(f"x has shape {x.shape}, expected ({plan.n},)")
    if plan.x_mode in ("allgather", "halo"):
        n_pad = (plan.mr * plan.ndev if plan.x_mode == "halo"
                 else -(-plan.n // plan.ndev) * plan.ndev)
        x = _pad_x(x, plan.n, n_pad)
        x = jax.device_put(x, NamedSharding(plan.mesh, P(plan.axis)))
    else:
        x = jax.device_put(x, NamedSharding(plan.mesh, P()))
    y = plan._exec(plan.data, x)
    return y[: plan.m]


# ---------------------------------------------------------------------------
# Distributed SELL-8W — the Pallas fast path across the mesh.
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class DistSell8WPlan:
    """Row-blocked SELL-8W over a 1-D mesh: every shard owns ``mr`` rows
    (128-aligned, equal across shards so one Pallas program serves all) and
    runs the windowed-gather kernel (ops/pallas_sell.py) against replicated
    or all-gathered x.  Shard tile streams are zero-padded to a common
    length; padding tiles target the last slice group with first=0 and zero
    values, contributing nothing."""

    mesh: Mesh
    axis: str
    ndev: int
    m: int
    n: int
    nnz: int
    mr: int
    ntiles: int                 # common (padded) tiles per shard
    nslices: int                # per shard
    window_ids: jax.Array       # (ndev, ntiles) sharded
    gpk: jax.Array              # (ndev, ntiles)
    meta: jax.Array             # (ndev, ntiles, 8, 128)
    vals: jax.Array             # (ndev, ntiles, 8, 128) — hi plane for f64
    x_mode: str
    max_pad: float = 0.0
    #: f64 double-float low plane (None for f32 plans)
    vals_lo: Optional[jax.Array] = None
    _exec: object = None

    def __call__(self, x) -> jax.Array:
        return dist_sell8w_spmv(self, x)


def build_dist_sell8w_plan(a: CsrMatrix, mesh: Mesh, axis: str = "rows",
                           x_mode: str = "replicated",
                           max_pad_ratio: float = None,
                           interpret: bool = False) -> DistSell8WPlan:
    from ..formats.sell8w import pack_sell8w, SUB, LANES
    if x_mode not in ("replicated", "allgather", "halo"):
        raise ValueError(f"unknown x_mode {x_mode!r}")
    df = np.dtype(a.dtype) == np.float64
    if not df and np.dtype(a.dtype) != np.float32:
        raise ValueError(
            "dist SELL-8W computes in float32 or double-float f64; "
            f"got {np.dtype(a.dtype)} — cast explicitly or use "
            "build_dist_plan")
    ndev = mesh.shape[axis]
    mr = max(-(-a.m // (ndev * LANES)) * LANES, LANES)
    rowptr64 = a.rowptr.astype(np.int64)

    halo = 0
    if x_mode == "halo":
        # ring depth from the data: furthest row-block any shard's columns
        # touch (x blocks = row blocks here; m == n required)
        if a.m != a.n:
            raise ValueError("halo mode requires a square matrix")
        for d in range(ndev):
            p0 = int(rowptr64[min(d * mr, a.m)])
            p1 = int(rowptr64[min((d + 1) * mr, a.m)])
            if p1 > p0:
                own = a.colidx[p0:p1] // mr
                halo = max(halo, d - int(own.min()), int(own.max()) - d)
        halo = max(halo, 1)
        if 2 * halo + 1 > ndev:
            raise ValueError(
                f"halo depth {halo} needs {2 * halo + 1} blocks > "
                f"ndev={ndev}; reorder for locality or use 'allgather'")

    packs = []
    for d in range(ndev):
        r0 = min(d * mr, a.m)
        r1 = min(r0 + mr, a.m)
        local_rowptr = np.zeros(mr + 1, dtype=np.int64)
        if r1 > r0:
            seg = rowptr64[r0:r1 + 1] - rowptr64[r0]
            local_rowptr[: r1 - r0 + 1] = seg
            local_rowptr[r1 - r0 + 1:] = seg[-1]
        p0, p1 = int(rowptr64[r0]), int(rowptr64[r1])
        cols_d = a.colidx[p0:p1]
        n_local = a.n
        if x_mode == "halo":
            # localize into the assembled (2h+1)-block window
            cols_d = (cols_d.astype(np.int64) - (d - halo) * mr) \
                .astype(INT_DTYPE)
            n_local = (2 * halo + 1) * mr
        vals_d = a.vals[p0:p1]
        if df:
            # double-float: pack twice (hi, lo) — placement is
            # value-independent, so the tile layouts are slot-aligned
            # (the single-device f64 trick, handle._sell8w_plan)
            hi_v = vals_d.astype(np.float32)
            lo_v = (vals_d - hi_v.astype(np.float64)).astype(np.float32)
            local = CsrMatrix(mr, n_local,
                              local_rowptr.astype(INT_DTYPE), cols_d, hi_v)
            p_hi = pack_sell8w(local, max_pad_ratio=max_pad_ratio)
            p_lo = pack_sell8w(CsrMatrix(
                mr, n_local, local_rowptr.astype(INT_DTYPE), cols_d, lo_v))
            packs.append((p_hi, p_lo.vals))
            continue
        local = CsrMatrix(mr, n_local, local_rowptr.astype(INT_DTYPE),
                          cols_d, vals_d)
        packs.append((pack_sell8w(local, max_pad_ratio=max_pad_ratio),
                      None))

    ntiles = max(p.ntiles for p, _ in packs)
    nslices = mr // LANES
    ngroups = -(-nslices // SUB)
    win = np.zeros((ndev, ntiles), dtype=INT_DTYPE)
    gpk = np.zeros((ndev, ntiles), dtype=INT_DTYPE)
    meta = np.zeros((ndev, ntiles, SUB, LANES), dtype=np.int16)
    vals = np.zeros((ndev, ntiles, SUB, LANES), dtype=np.float32)
    vals_lo = (np.zeros((ndev, ntiles, SUB, LANES), dtype=np.float32)
               if df else None)
    from ..ops.pallas_sell import pack_gpk
    for d, (p, lo_tiles) in enumerate(packs):
        win[d, : p.ntiles] = p.window_ids
        gpk[d, : p.ntiles] = pack_gpk(p.slice_ids)
        meta[d, : p.ntiles] = p.meta
        vals[d, : p.ntiles] = p.vals
        if df:
            vals_lo[d, : p.ntiles] = lo_tiles
        # padding tiles: target the last group, not first, zero values
        if p.ntiles < ntiles:
            gpk[d, p.ntiles:] = (ngroups - 1) << 4

    sh = lambda arr: _put_sharded(arr, NamedSharding(mesh, P(axis)))
    plan = DistSell8WPlan(
        mesh=mesh, axis=axis, ndev=ndev, m=a.m, n=a.n, nnz=a.nnz,
        mr=mr, ntiles=ntiles, nslices=nslices,
        window_ids=sh(win), gpk=sh(gpk), meta=sh(meta), vals=sh(vals),
        vals_lo=sh(vals_lo) if df else None,
        x_mode=x_mode,
        max_pad=max(p.pad_ratio for p, _ in packs) if packs else 0.0,
    )
    plan._halo = halo
    plan._exec = _build_sell8w_executable(plan, interpret)
    return plan


def _build_sell8w_executable(plan: DistSell8WPlan, interpret: bool):
    from ..ops.pallas_sell import _run, _run_df_v1
    mesh, axis = plan.mesh, plan.axis
    x_sharded = plan.x_mode == "allgather"
    halo = getattr(plan, "_halo", 0) if plan.x_mode == "halo" else 0
    ntiles, nslices, n, mr = plan.ntiles, plan.nslices, plan.n, plan.mr
    ndev = plan.ndev
    n_local = (2 * halo + 1) * mr if halo else n
    df = plan.vals_lo is not None

    def _assemble_x(x):
        if x_sharded:
            # the gathered vector has ceil(n/ndev)*ndev elements; _run's
            # window padding requires exactly n (measured reshape crash
            # when n % ndev != 0)
            return jax.lax.all_gather(x, axis, tiled=True)[:n]
        if halo:
            # neighbor x blocks via ppermute rings (O(halo·mr) per shard)
            xb = x[0]
            parts = [xb]
            fwd = xb
            bwd = xb
            for _ in range(halo):
                fwd = jax.lax.ppermute(
                    fwd, axis, [(i, (i + 1) % ndev) for i in range(ndev)])
                bwd = jax.lax.ppermute(
                    bwd, axis, [(i, (i - 1) % ndev) for i in range(ndev)])
                parts = [fwd] + parts + [bwd]
            return jnp.concatenate(parts)
        return x

    if df:
        def shard_body(win, gpk, meta, vals, vals_lo, x):
            x = _assemble_x(x)
            out = _run_df_v1(win[0], gpk[0], x, meta[0], vals[0],
                             vals_lo[0], ntiles=ntiles, nslices=nslices,
                             n=n_local, interpret=interpret)
            return out.reshape(-1)[None, :mr]

        smap = jax.shard_map(
            shard_body, mesh=mesh,
            in_specs=(P(axis),) * 5
            + (P(axis) if (x_sharded or halo) else P(),),
            out_specs=P(axis),
            check_vma=False,   # pallas_call outputs carry no vma info
        )

        @jax.jit
        def run_df(win, gpk, meta, vals, vals_lo, x):
            if halo:
                x = x.reshape(ndev, -1)
            return smap(win, gpk, meta, vals, vals_lo, x).reshape(-1)

        return run_df

    def shard_body(win, gpk, meta, vals, x):
        x = _assemble_x(x)
        out = _run(win[0], gpk[0], x, meta[0], vals[0],
                   ntiles=ntiles, nslices=nslices, n=n_local,
                   interpret=interpret)
        return out.reshape(-1)[None, :mr]

    smap = jax.shard_map(
        shard_body, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis),
                  P(axis) if (x_sharded or halo) else P()),
        out_specs=P(axis),
        check_vma=False,   # pallas_call outputs carry no vma info
    )

    @jax.jit
    def run(win, gpk, meta, vals, x):
        if halo:
            x = x.reshape(ndev, -1)
        return smap(win, gpk, meta, vals, x).reshape(-1)

    return run


def dist_sell8w_spmv(plan: DistSell8WPlan, x) -> jax.Array:
    x = jnp.asarray(x)
    if x.shape != (plan.n,):
        raise ValueError(f"x has shape {x.shape}, expected ({plan.n},)")
    if plan.x_mode == "allgather":
        n_pad = -(-plan.n // plan.ndev) * plan.ndev
        if n_pad != plan.n:
            x = jnp.concatenate([x, jnp.zeros(n_pad - plan.n, x.dtype)])
        x = jax.device_put(x, NamedSharding(plan.mesh, P(plan.axis)))
    elif plan.x_mode == "halo":
        x = _pad_x(x, plan.n, plan.mr * plan.ndev)
        x = jax.device_put(x, NamedSharding(plan.mesh, P(plan.axis)))
    else:
        x = jax.device_put(x, NamedSharding(plan.mesh, P()))
    if plan.vals_lo is not None:
        y = plan._exec(plan.window_ids, plan.gpk, plan.meta, plan.vals,
                       plan.vals_lo, x)
    else:
        y = plan._exec(plan.window_ids, plan.gpk, plan.meta, plan.vals, x)
    return y[: plan.m]


@dataclasses.dataclass
class DistSell8DPlan:
    """Row-blocked SELL-8D slot-mode over a 1-D mesh (the scattered tier
    distributed): every shard owns ``mr`` rows (1024·nw-aligned so bundle
    windows stay aligned after halo localization) packed independently
    into the deep-slice stream, padded to a common tile count; one
    shard_map program runs the v2 slot-mode kernel on all shards.  Shard
    spills (depth-cap tails / unresolved s-conflicts) are concatenated
    into ONE global straggler stream computed outside the shard_map
    against the full x and added to the gathered output."""

    mesh: Mesh
    axis: str
    ndev: int
    m: int
    n: int
    nnz: int
    mr: int
    ntiles: int                 # common (padded) tiles per shard
    nsteps: int
    nslices: int                # per shard
    g: int
    nw: int
    value_mode: str
    tinfo: jax.Array            # (ndev, ntiles) sharded
    ginfo: jax.Array            # (ndev, nsteps)
    meta: jax.Array             # (ndev, ntiles, 8, 128) int16
    vals: jax.Array             # (ndev, ntiles, 8, 128) or (8,128) dummy
    pal: jax.Array              # (8, 128) replicated palette rows
    x_mode: str
    max_pad: float = 0.0
    rest: Optional[tuple] = None   # (rows, cols, vals) global straggler
    #: f64 double-float low planes (None for f32 plans)
    vals_lo: Optional[jax.Array] = None
    pal_lo: Optional[jax.Array] = None
    _halo: int = 0
    _exec: object = None

    def __call__(self, x) -> jax.Array:
        return dist_sell8d_spmv(self, x)


def _shared_value_mode(vals: np.ndarray, nw: int, df: bool):
    """Global value mode (meta bit budget depends on nw) + ONE shared code
    table — per-shard palettes would decode each other's codes wrongly."""
    from ..formats.sell8w import value_palette
    lb = int(nw).bit_length() - 1
    pal_shared = None
    if df:
        # f64: shared palette of f64 values (both hi/lo palettes ride one
        # code), else the df16 int16-lo plane when the values fit its
        # range contract (the single-chip f64 default — 20% less tile
        # stream), else full hi/lo f32 planes
        from ..formats.sell8w import df16_safe
        uniq = np.unique(vals[vals != 0.0])
        if len(uniq) + 1 <= (64 >> lb):
            return "palette_df", uniq
        if df16_safe(vals):
            return "df16", None
        return "df", None
    gp = value_palette(vals, max_entries=64 >> lb)
    if gp is not None:
        pal_shared = np.asarray(gp[0][1:])      # sorted unique nonzeros
        return "palette", pal_shared[pal_shared != 0.0]
    import ml_dtypes
    v32 = np.asarray(vals, dtype=np.float32)
    mode = ("bf16" if bool(np.array_equal(
        v32.astype(ml_dtypes.bfloat16).astype(np.float32), v32))
        else "f32")
    return mode, None


def build_dist_sell8d_plan(a: CsrMatrix, mesh: Mesh, axis: str = "rows",
                           x_mode: str = "replicated",
                           nw: Optional[int] = None,
                           max_pad_ratio: float = 32.0,
                           interpret: bool = False) -> DistSell8DPlan:
    """Shard rows into 1024·nw-aligned blocks and pack each as SELL-8D.

    The bundle width and value mode are chosen GLOBALLY (one Pallas
    program serves every shard): nw from the whole-matrix estimate,
    value mode from the whole value stream (palette feasibility on the
    union implies it per shard).
    """
    from ..formats.sell8d import (SLICE_ROWS, estimate_sell8d_auto,
                                  pack_sell8d)
    from ..formats.sell8w import SUB, LANES, value_palette
    if x_mode not in ("replicated", "allgather", "halo"):
        raise ValueError(f"unknown x_mode {x_mode!r}")
    df = np.dtype(a.dtype) == np.float64
    if not df and np.dtype(a.dtype) != np.float32:
        raise ValueError("dist SELL-8D computes in float32 or double-"
                         "float f64; cast explicitly or use "
                         "build_dist_plan")
    if a.nnz == 0:
        raise ValueError("empty matrix has no SELL-8D packing")
    if nw is None:
        _t, _c, _s, nw = estimate_sell8d_auto(a, nw=None)
    ndev = mesh.shape[axis]
    align = SLICE_ROWS * nw
    mr = max(-(-a.m // (ndev * align)) * align, align)
    rowptr64 = a.rowptr.astype(np.int64)

    halo = 0
    if x_mode == "halo":
        if a.m != a.n:
            raise ValueError("halo mode requires a square matrix")
        for d in range(ndev):
            p0 = int(rowptr64[min(d * mr, a.m)])
            p1 = int(rowptr64[min((d + 1) * mr, a.m)])
            if p1 > p0:
                own = a.colidx[p0:p1] // mr
                halo = max(halo, d - int(own.min()), int(own.max()) - d)
        halo = max(halo, 1)
        if 2 * halo + 1 > ndev:
            raise ValueError(
                f"halo depth {halo} needs {2 * halo + 1} blocks > "
                f"ndev={ndev}; reorder for locality or use 'allgather'")

    force_mode, pal_shared = _shared_value_mode(np.asarray(a.vals), nw, df)

    packs, rests = [], []
    for d in range(ndev):
        r0 = min(d * mr, a.m)
        r1 = min(r0 + mr, a.m)
        local_rowptr = np.zeros(mr + 1, dtype=np.int64)
        if r1 > r0:
            seg = rowptr64[r0:r1 + 1] - rowptr64[r0]
            local_rowptr[: r1 - r0 + 1] = seg
            local_rowptr[r1 - r0 + 1:] = seg[-1]
        p0, p1 = int(rowptr64[r0]), int(rowptr64[r1])
        cols_d = a.colidx[p0:p1]
        n_local = a.n
        if x_mode == "halo":
            cols_d = (cols_d.astype(np.int64) - (d - halo) * mr) \
                .astype(INT_DTYPE)
            n_local = (2 * halo + 1) * mr
        local = CsrMatrix(mr, n_local, local_rowptr.astype(INT_DTYPE),
                          cols_d, np.asarray(a.vals)[p0:p1])
        if local.nnz == 0:
            packs.append(None)
            continue
        p, rest = pack_sell8d(local, max_pad_ratio=max_pad_ratio, nw=nw,
                              force_value_mode=force_mode,
                              palette_values=pal_shared, cell_w=nw > 1)
        packs.append(p)
        if rest is not None:
            # globalize: rows back to global ids, cols back to global
            rrows = rest[0] + r0
            rcols = rest[1]
            if x_mode == "halo":
                rcols = rcols + (d - halo) * mr
            rests.append((rrows, rcols, rest[2]))

    g = next(p.g for p in packs if p is not None)
    nslices = mr // SLICE_ROWS
    ntiles = max((p.ntiles for p in packs if p is not None), default=g)
    ntiles = -(-ntiles // g) * g
    nsteps = ntiles // g
    if nsteps < nslices:
        # every output block needs ≥1 zero-initializing step (real packs
        # guarantee this via the per-slice min-G padding; enforce it for
        # the common padded stream too)
        nsteps = nslices
        ntiles = nsteps * g
    tinfo = np.zeros((ndev, ntiles), dtype=INT_DTYPE)
    # default stream (used verbatim by EMPTY shards): visit every slice
    # once with first=1 so all output blocks come out zero, then park on
    # the last slice; real packs overwrite their prefix below
    ginfo = np.full((ndev, nsteps), (nslices - 1) << 1, dtype=INT_DTYPE)
    ginfo[:, :nslices] = (np.arange(nslices, dtype=np.int64) << 1 | 1) \
        .astype(INT_DTYPE)
    meta = np.zeros((ndev, ntiles, SUB, LANES), dtype=np.int16)
    vals = vals_lo = None
    if force_mode in ("f32", "df", "df16"):
        vals = np.zeros((ndev, ntiles, SUB, LANES), dtype=np.float32)
    elif force_mode == "bf16":
        import ml_dtypes
        vals = np.zeros((ndev, ntiles, SUB, LANES),
                        dtype=ml_dtypes.bfloat16)
    if force_mode == "df":
        vals_lo = np.zeros((ndev, ntiles, SUB, LANES), dtype=np.float32)
    elif force_mode == "df16":
        vals_lo = np.zeros((ndev, ntiles, SUB, LANES), dtype=np.int16)
    pal = np.zeros((SUB, LANES), dtype=np.float32)
    pal_lo = np.zeros((SUB, LANES), dtype=np.float32) \
        if force_mode == "palette_df" else None
    for d, p in enumerate(packs):
        if p is None:
            continue
        tinfo[d, : p.ntiles] = p.tinfo
        ginfo[d, : p.nsteps] = p.ginfo
        meta[d, : p.ntiles] = p.meta
        if vals is not None and p.vals is not None:
            vals[d, : p.ntiles] = p.vals
        if vals_lo is not None and p.vals_lo is not None:
            vals_lo[d, : p.ntiles] = p.vals_lo
        if p.palette is not None:
            pal = np.tile(p.palette[None, :], (SUB, 1)).astype(np.float32)
        if pal_lo is not None and p.palette_lo is not None:
            pal_lo = np.tile(p.palette_lo[None, :],
                             (SUB, 1)).astype(np.float32)

    rest = None
    if rests:
        rest = tuple(np.concatenate([r[i] for r in rests])
                     for i in range(3))

    sh = lambda arr: _put_sharded(arr, NamedSharding(mesh, P(axis)))
    plan = DistSell8DPlan(
        mesh=mesh, axis=axis, ndev=ndev, m=a.m, n=a.n, nnz=a.nnz,
        mr=mr, ntiles=ntiles, nsteps=nsteps, nslices=nslices, g=g, nw=nw,
        value_mode=force_mode,
        tinfo=sh(tinfo), ginfo=sh(ginfo), meta=sh(meta),
        vals=(sh(vals) if vals is not None
              else jax.device_put(np.zeros((SUB, LANES), np.float32),
                                  NamedSharding(mesh, P()))),
        vals_lo=(sh(vals_lo) if vals_lo is not None
                 else (jax.device_put(np.zeros((SUB, LANES), np.float32),
                                      NamedSharding(mesh, P()))
                       if force_mode == "palette_df" else None)),
        pal=jax.device_put(pal, NamedSharding(mesh, P())),
        pal_lo=(jax.device_put(
            pal_lo if pal_lo is not None
            else np.zeros((SUB, LANES), np.float32),
            NamedSharding(mesh, P()))
            if force_mode in ("df", "df16", "palette_df") else None),
        x_mode=x_mode,
        max_pad=max((p.pad_ratio for p in packs if p is not None),
                    default=0.0),
        rest=rest, _halo=halo,
    )
    plan._exec = _build_sell8d_executable(plan, interpret)
    return plan


def _build_sell8d_executable(plan: DistSell8DPlan, interpret: bool):
    from ..ops.pallas_sell import _run_v2, _run_v2_df
    mesh, axis = plan.mesh, plan.axis
    x_sharded = plan.x_mode == "allgather"
    halo = plan._halo if plan.x_mode == "halo" else 0
    nsteps, nslices, n, mr = plan.nsteps, plan.nslices, plan.n, plan.mr
    ndev, g, nw, value_mode = plan.ndev, plan.g, plan.nw, plan.value_mode
    n_local = (2 * halo + 1) * mr if halo else n
    palette = value_mode in ("palette", "palette_df")
    df = value_mode in ("df", "df16", "palette_df")

    def _assemble_x(x):
        if x_sharded:
            return jax.lax.all_gather(x, axis, tiled=True)[:n]
        if halo:
            xb = x[0]
            parts = [xb]
            fwd = xb
            bwd = xb
            for _ in range(halo):
                fwd = jax.lax.ppermute(
                    fwd, axis, [(i, (i + 1) % ndev) for i in range(ndev)])
                bwd = jax.lax.ppermute(
                    bwd, axis, [(i, (i - 1) % ndev) for i in range(ndev)])
                parts = [fwd] + parts + [bwd]
            return jnp.concatenate(parts)
        return x

    if df:
        def shard_body(tinfo, ginfo, meta, vals, vals_lo, pal, pal_lo, x):
            x = _assemble_x(x)
            out = _run_v2_df(tinfo[0], ginfo[0], x, meta[0],
                             vals if palette else vals[0],
                             vals_lo if palette else vals_lo[0],
                             pal, pal_lo,
                             g=g, palette=palette, nsteps=nsteps,
                             nslices=nslices, n=n_local,
                             interpret=interpret, slot_mode=True, nw=nw,
                             vlo16=value_mode == "df16", cell_w=nw > 1)
            return out.reshape(-1)[None, :mr]

        vspec = P() if palette else P(axis)
        smap = jax.shard_map(
            shard_body, mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis), vspec, vspec, P(), P(),
                      P(axis) if (x_sharded or halo) else P()),
            out_specs=P(axis),
            check_vma=False,
        )

        @jax.jit
        def run_df(tinfo, ginfo, meta, vals, vals_lo, pal, pal_lo, x):
            if halo:
                x = x.reshape(ndev, -1)
            return smap(tinfo, ginfo, meta, vals, vals_lo, pal, pal_lo,
                        x).reshape(-1)

        return run_df

    def shard_body(tinfo, ginfo, meta, vals, pal, x):
        x = _assemble_x(x)
        out = _run_v2(tinfo[0], ginfo[0], x, meta[0],
                      vals if palette else vals[0], pal,
                      g=g, value_mode=value_mode, nsteps=nsteps,
                      nslices=nslices, n=n_local, interpret=interpret,
                      slot_mode=True, nw=nw, cell_w=nw > 1)
        return out.reshape(-1)[None, :mr]

    smap = jax.shard_map(
        shard_body, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis),
                  P() if palette else P(axis), P(),
                  P(axis) if (x_sharded or halo) else P()),
        out_specs=P(axis),
        check_vma=False,
    )

    @jax.jit
    def run(tinfo, ginfo, meta, vals, pal, x):
        if halo:
            x = x.reshape(ndev, -1)
        return smap(tinfo, ginfo, meta, vals, pal, x).reshape(-1)

    return run


def dist_sell8d_spmv(plan: DistSell8DPlan, x) -> jax.Array:
    x = jnp.asarray(x)
    if x.shape != (plan.n,):
        raise ValueError(f"x has shape {x.shape}, expected ({plan.n},)")
    x_full = x
    if plan.x_mode == "allgather":
        n_pad = -(-plan.n // plan.ndev) * plan.ndev
        if n_pad != plan.n:
            x = jnp.concatenate([x, jnp.zeros(n_pad - plan.n, x.dtype)])
        x = jax.device_put(x, NamedSharding(plan.mesh, P(plan.axis)))
    elif plan.x_mode == "halo":
        x = _pad_x(x, plan.n, plan.mr * plan.ndev)
        x = jax.device_put(x, NamedSharding(plan.mesh, P(plan.axis)))
    else:
        x = jax.device_put(x, NamedSharding(plan.mesh, P()))
    if plan.value_mode in ("df", "df16", "palette_df"):
        y = plan._exec(plan.tinfo, plan.ginfo, plan.meta, plan.vals,
                       plan.vals_lo, plan.pal, plan.pal_lo, x)[: plan.m]
    else:
        y = plan._exec(plan.tinfo, plan.ginfo, plan.meta, plan.vals,
                       plan.pal, x)[: plan.m]
    if plan.rest is not None:
        rows, cols, vls = plan.rest
        y = y.at[jnp.asarray(rows.astype(INT_DTYPE))].add(
            jnp.asarray(vls) * x_full[jnp.asarray(cols.astype(INT_DTYPE))])
    return y


# ---------------------------------------------------------------------------
# Column-sharded SELL-8D — the mesh counterpart of the single-chip
# column-striped resident tier (round-5, VERDICT round-4 item 6).
#
# Past the VMEM-x envelope (n > ~2M) a row shard still sees ALL n columns,
# so the row-sharded 8D plan pays the windowed nw·4 KB-per-tile x DMA.
# Sharding COLUMNS instead gives each device one bundle-aligned block of
# ≤ V2_MAX_N columns: its x slice is exactly the natural x shard (P(axis)
# — no gather, no halo), the resident slot kernel runs at ~29 ns/tile,
# and the partial outputs reduce with ONE psum over ICI (the classic
# column-parallel SpMV y = Σ_d A[:, d]·x_d).  Reference analog: the NUMA
# sample's x-splitting option (numa.c:268-439) — re-designed so the
# reduction is an XLA collective the compiler schedules on ICI.
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class DistSell8DColsPlan:
    """Column-sharded slot-mode plan; call it like a function."""

    mesh: Mesh
    axis: str
    ndev: int
    m: int
    n: int
    nnz: int
    cw: int                     # columns per shard (bundle-aligned)
    ntiles: int
    nsteps: int
    nslices: int                # full ceil(m/1024) — every shard outputs m
    g: int
    nw: int
    value_mode: str
    tinfo: jax.Array            # (ndev, ntiles) sharded
    ginfo: jax.Array
    meta: jax.Array
    vals: jax.Array
    pal: jax.Array
    max_pad: float = 0.0
    rest: Optional[tuple] = None
    vals_lo: Optional[jax.Array] = None
    pal_lo: Optional[jax.Array] = None
    _exec: object = None

    def __call__(self, x) -> jax.Array:
        return dist_sell8d_cols_spmv(self, x)


def build_dist_sell8d_cols_plan(a: CsrMatrix, mesh: Mesh,
                                axis: str = "rows",
                                nw: Optional[int] = None,
                                max_pad_ratio: float = 32.0,
                                interpret: bool = False
                                ) -> DistSell8DColsPlan:
    """Shard COLUMNS into bundle-aligned blocks, pack each as SELL-8D.

    Each device's block must fit the VMEM-x envelope (raises when
    n/ndev > V2_MAX_N after alignment — fall back to the row-sharded
    windowed plan there).  Every shard produces the full m-row output and
    the partials psum over the mesh axis; x rides its natural P(axis)
    shard.  Packs keep empty slices (every output block zero-initialized
    per shard) so the psum needs no per-shard visibility maps — the
    compacted-slice machinery stays a single-chip concern.
    """
    from ..formats.sell8d import (SLICE_ROWS, STRIPE_ALIGN, _V2_MAX_N,
                                  estimate_sell8d_auto, pack_sell8d)
    from ..formats.sell8w import SUB, LANES
    df = np.dtype(a.dtype) == np.float64
    if not df and np.dtype(a.dtype) != np.float32:
        raise ValueError("dist SELL-8D computes in float32 or double-"
                         "float f64")
    if a.nnz == 0:
        raise ValueError("empty matrix has no SELL-8D packing")
    ndev = mesh.shape[axis]
    cw = max(-(-a.n // (ndev * STRIPE_ALIGN)) * STRIPE_ALIGN,
             STRIPE_ALIGN)
    if cw > _V2_MAX_N:
        raise ValueError(
            f"column shard width {cw} exceeds the VMEM-x envelope "
            f"({_V2_MAX_N}); use the row-sharded windowed plan")
    if nw is None:
        # resident pricing: each shard's x slice is VMEM-resident
        _t, _c, _s, nw = estimate_sell8d_auto(a, nw=None, windowed=False)
    force_mode, pal_shared = _shared_value_mode(np.asarray(a.vals), nw,
                                               df)

    lens = a.row_lengths.astype(np.int64)
    rows_all = np.repeat(np.arange(a.m, dtype=np.int64), lens)
    colidx = np.asarray(a.colidx, dtype=np.int64)
    vals_np = np.asarray(a.vals)
    packs, rests = [], []
    tot_tiles = tot_kept = 0
    g_use = "auto"      # first non-empty shard picks; ONE g serves all
    for d in range(ndev):
        lo, hi = d * cw, min((d + 1) * cw, a.n)
        keep = (colidx >= lo) & (colidx < hi)
        if not keep.any():
            packs.append(None)
            continue
        rows_d = rows_all[keep]
        rp = np.zeros(a.m + 1, np.int64)
        np.cumsum(np.bincount(rows_d, minlength=a.m), out=rp[1:])
        sub = CsrMatrix(a.m, cw, rp,
                        (colidx[keep] - lo).astype(INT_DTYPE),
                        vals_np[keep])
        p, rest = pack_sell8d(sub, max_pad_ratio=float("inf"),
                              max_spill=1.0, nw=nw, g=g_use,
                              force_value_mode=force_mode,
                              palette_values=pal_shared, cell_w=nw > 1)
        g_use = p.g         # pin: the jitted program assumes a single g
        packs.append(p)
        tot_tiles += p.ntiles
        tot_kept += p.nnz_stored
        if rest is not None:
            rests.append((rest[0], rest[1].astype(np.int64) + lo,
                          rest[2]))
    if not tot_kept:
        raise ValueError("column-sharded pack kept no nonzeros")
    pad = tot_tiles * (SUB * LANES) / tot_kept        # WINDOW = 1024 slots
    if pad > max_pad_ratio:
        raise ValueError(f"column-sharded pad ratio {pad:.1f} exceeds "
                         f"{max_pad_ratio}")

    nslices = max(-(-a.m // SLICE_ROWS), 1)
    g = next(p.g for p in packs if p is not None)
    ntiles = max((p.ntiles for p in packs if p is not None), default=g)
    ntiles = -(-ntiles // g) * g
    nsteps = ntiles // g
    if nsteps < nslices:
        nsteps = nslices
        ntiles = nsteps * g
    tinfo = np.zeros((ndev, ntiles), dtype=INT_DTYPE)
    ginfo = np.full((ndev, nsteps), (nslices - 1) << 1, dtype=INT_DTYPE)
    ginfo[:, :nslices] = (np.arange(nslices, dtype=np.int64) << 1 | 1) \
        .astype(INT_DTYPE)
    meta = np.zeros((ndev, ntiles, SUB, LANES), dtype=np.int16)
    vals = vals_lo = None
    if force_mode in ("f32", "df", "df16"):
        vals = np.zeros((ndev, ntiles, SUB, LANES), dtype=np.float32)
    elif force_mode == "bf16":
        import ml_dtypes
        vals = np.zeros((ndev, ntiles, SUB, LANES),
                        dtype=ml_dtypes.bfloat16)
    if force_mode == "df":
        vals_lo = np.zeros((ndev, ntiles, SUB, LANES), dtype=np.float32)
    elif force_mode == "df16":
        vals_lo = np.zeros((ndev, ntiles, SUB, LANES), dtype=np.int16)
    pal = np.zeros((SUB, LANES), dtype=np.float32)
    pal_lo = np.zeros((SUB, LANES), dtype=np.float32) \
        if force_mode == "palette_df" else None
    for d, p in enumerate(packs):
        if p is None:
            continue
        tinfo[d, : p.ntiles] = p.tinfo
        ginfo[d, : p.nsteps] = p.ginfo
        meta[d, : p.ntiles] = p.meta
        if vals is not None and p.vals is not None:
            vals[d, : p.ntiles] = p.vals
        if vals_lo is not None and p.vals_lo is not None:
            vals_lo[d, : p.ntiles] = p.vals_lo
        if p.palette is not None:
            pal = np.tile(p.palette[None, :], (SUB, 1)).astype(np.float32)
        if pal_lo is not None and p.palette_lo is not None:
            pal_lo = np.tile(p.palette_lo[None, :],
                             (SUB, 1)).astype(np.float32)
    rest = None
    if rests:
        rest = tuple(np.concatenate([r[i] for r in rests])
                     for i in range(3))

    sh = lambda arr: _put_sharded(arr, NamedSharding(mesh, P(axis)))
    rep = lambda arr: jax.device_put(arr, NamedSharding(mesh, P()))
    plan = DistSell8DColsPlan(
        mesh=mesh, axis=axis, ndev=ndev, m=a.m, n=a.n, nnz=a.nnz, cw=cw,
        ntiles=ntiles, nsteps=nsteps, nslices=nslices, g=g, nw=nw,
        value_mode=force_mode,
        tinfo=sh(tinfo), ginfo=sh(ginfo), meta=sh(meta),
        vals=(sh(vals) if vals is not None
              else rep(np.zeros((SUB, LANES), np.float32))),
        vals_lo=(sh(vals_lo) if vals_lo is not None
                 else (rep(np.zeros((SUB, LANES), np.float32))
                       if force_mode == "palette_df" else None)),
        pal=rep(pal),
        pal_lo=(rep(pal_lo if pal_lo is not None
                    else np.zeros((SUB, LANES), np.float32))
                if force_mode in ("df", "df16", "palette_df") else None),
        max_pad=pad, rest=rest,
    )
    plan._exec = _build_sell8d_cols_executable(plan, interpret)
    return plan


def _build_sell8d_cols_executable(plan: DistSell8DColsPlan,
                                  interpret: bool):
    from ..ops.pallas_sell import _run_v2, _run_v2_df
    mesh, axis = plan.mesh, plan.axis
    nsteps, nslices, cw, m = plan.nsteps, plan.nslices, plan.cw, plan.m
    g, nw, value_mode = plan.g, plan.nw, plan.value_mode
    palette = value_mode in ("palette", "palette_df")
    df = value_mode in ("df", "df16", "palette_df")

    if df:
        def shard_body(tinfo, ginfo, meta, vals, vals_lo, pal, pal_lo, x):
            out = _run_v2_df(tinfo[0], ginfo[0], x[0], meta[0],
                             vals if palette else vals[0],
                             vals_lo if palette else vals_lo[0],
                             pal, pal_lo,
                             g=g, palette=palette, nsteps=nsteps,
                             nslices=nslices, n=cw, interpret=interpret,
                             slot_mode=True, nw=nw,
                             vlo16=value_mode == "df16", cell_w=nw > 1)
            # per-shard f64 partial, ONE psum over the mesh (f32-plane
            # psum would round the EFT grade away)
            y = out.reshape(-1)[:m]
            return jax.lax.psum(y, axis)

        vspec = P() if palette else P(axis)
        smap = jax.shard_map(
            shard_body, mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis), vspec, vspec, P(), P(),
                      P(axis)),
            out_specs=P(),
            check_vma=False,
        )

        @jax.jit
        def run_df(tinfo, ginfo, meta, vals, vals_lo, pal, pal_lo, x):
            return smap(tinfo, ginfo, meta, vals, vals_lo, pal, pal_lo,
                        x.reshape(plan.ndev, -1))

        return run_df

    def shard_body(tinfo, ginfo, meta, vals, pal, x):
        out = _run_v2(tinfo[0], ginfo[0], x[0], meta[0],
                      vals if palette else vals[0], pal,
                      g=g, value_mode=value_mode, nsteps=nsteps,
                      nslices=nslices, n=cw, interpret=interpret,
                      slot_mode=True, nw=nw, cell_w=nw > 1)
        return jax.lax.psum(out.reshape(-1)[:m], axis)

    smap = jax.shard_map(
        shard_body, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis),
                  P() if palette else P(axis), P(), P(axis)),
        out_specs=P(),
        check_vma=False,
    )

    @jax.jit
    def run(tinfo, ginfo, meta, vals, pal, x):
        return smap(tinfo, ginfo, meta, vals, pal,
                    x.reshape(plan.ndev, -1))

    return run


def dist_sell8d_cols_spmv(plan: DistSell8DColsPlan, x) -> jax.Array:
    x = jnp.asarray(x)
    if x.shape != (plan.n,):
        raise ValueError(f"x has shape {x.shape}, expected ({plan.n},)")
    x_full = x
    n_pad = plan.cw * plan.ndev
    if n_pad != plan.n:
        x = jnp.concatenate([x, jnp.zeros(n_pad - plan.n, x.dtype)])
    x = jax.device_put(x, NamedSharding(plan.mesh, P(plan.axis)))
    if plan.value_mode in ("df", "df16", "palette_df"):
        y = plan._exec(plan.tinfo, plan.ginfo, plan.meta, plan.vals,
                       plan.vals_lo, plan.pal, plan.pal_lo, x)
    else:
        y = plan._exec(plan.tinfo, plan.ginfo, plan.meta, plan.vals,
                       plan.pal, x)
    if plan.rest is not None:
        rows, cols, vls = plan.rest
        y = y.at[jnp.asarray(rows.astype(INT_DTYPE))].add(
            (jnp.asarray(vls)
             * x_full[jnp.asarray(cols.astype(INT_DTYPE))]).astype(y.dtype))
    return y


# ---------------------------------------------------------------------------
# Distributed AUTO — one-call mesh handle (VERDICT round-3 item 5)
#
# The single-chip inspector fulfills the reference's promised-but-empty
# auto-tuner (README.md:222-223) on one device; this extends it across the
# mesh: featurize once, pick the dist plan family (DIA / SELL-8W / SELL-8D /
# row-split hybrid / scan) with the SAME gates as inspector._decide and
# handle._plan_windowed, and pick x placement (replicated / allgather /
# halo) from the measured column spread — the reference's NUMA sample
# (numa.c:268-439) makes the user hand-pick both.
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class DistAutoPlan:
    """A mesh SpMV plan chosen automatically; call it like a function."""

    kind: str                # "dia" | "sell8w" | "sell8d" | "hybrid" | "scan"
    x_mode: str
    m: int
    n: int
    nnz: int
    parts: dict
    value_mode: Optional[str] = None
    max_pad: float = 0.0
    #: halo-mode straggler stream: (rows, cols, vals) of the ≤0.1%
    #: long-range nonzeros split out so the quantile halo gate holds
    rest: Optional[tuple] = None

    def __call__(self, x) -> jax.Array:
        return dist_auto_spmv(self, x)


def _auto_x_mode(a: CsrMatrix, ndev: int) -> str:
    """Pick x placement from the data.

    halo: square matrix whose columns stay within ±1 x-block of their row
    block (banded / locality-reordered — the ppermute ring moves only
    O(mr) per shard and overlaps the local stream, PERFNOTES.md "halo
    comm/compute overlap").  Round-4 VERDICT weak #6: the gate uses the
    99.9th percentile of column spread, NOT the max — one long-range
    nonzero must not flip an otherwise banded matrix to allgather; the
    ≤0.1% stragglers ride the plan-level rest stream
    (:func:`_halo_straggler_split`), like the single-chip plans split
    stragglers routinely (reference NUMA analog: numa.c:151-153 hands
    every method an arbitrary row range).  replicated: small x (broadcast
    cost ≈ one shard's stream).  allgather: everything else — x sharded,
    gathered over ICI inside the shard.
    """
    if a.m == a.n and a.nnz and ndev > 2:
        mr = -(-a.m // ndev)
        rows = np.repeat(np.arange(a.m, dtype=np.int64),
                         a.row_lengths)
        spread = np.abs(a.colidx.astype(np.int64) - rows)
        if np.quantile(spread, 0.999) <= mr:
            return "halo"
    return "replicated" if a.n <= 1_000_000 else "allgather"


def _halo_straggler_split(a: CsrMatrix, mr: int):
    """Split nonzeros with column spread > ``mr`` into a COO rest stream.

    Returns ``(main, rest)`` — ``main`` keeps halo depth 1 viable, the
    rest (``None`` when nothing spills) executes outside the shard_map
    against the full x like every other plan-level straggler stream."""
    rows = np.repeat(np.arange(a.m, dtype=np.int64), a.row_lengths)
    cols = np.asarray(a.colidx, dtype=np.int64)
    far = np.abs(cols - rows) > mr
    if not far.any():
        return a, None
    keep = ~far
    rp = np.zeros(a.m + 1, np.int64)
    np.cumsum(np.bincount(rows[keep], minlength=a.m), out=rp[1:])
    main = CsrMatrix(a.m, a.n, rp, np.asarray(a.colidx)[keep],
                     np.asarray(a.vals)[keep])
    rest = (rows[far], cols[far], np.asarray(a.vals)[far])
    return main, rest


def build_dist_auto(a: CsrMatrix, mesh: Mesh, axis: str = "rows",
                    x_mode: str = "auto",
                    interpret: bool = False) -> DistAutoPlan:
    """One-call distributed handle: pick the plan family AND x placement.

    Gates mirror the single-chip AUTO ladder (inspector._decide +
    handle._plan_windowed, dtype-aware costs): banded → dist DIA;
    windowed pad ≤ threshold → dist SELL-8W; scattered → dist SELL-8D;
    heavy-tailed mixes → the dist row-split hybrid (dense 8W part +
    light 8D part per shard, folded by one small scatter-add — the
    single-chip plan composed from per-part dist builders); pairs-floor
    hopeless → the exact-nnz scan.  Every Pallas builder falls back down
    the ladder on ValueError, ending at the scan (which serves any
    matrix/dtype).
    """
    ndev = mesh.shape[axis]
    xm = _auto_x_mode(a, ndev) if x_mode == "auto" else x_mode
    auto_rest = None
    if xm == "halo" and a.m == a.n and a.nnz:
        # long-range stragglers out of the sharded stream so halo depth 1
        # holds; they execute once against the full x per call
        a, far = _halo_straggler_split(a, -(-a.m // ndev))
        if far is not None:
            auto_rest = (jnp.asarray(far[0].astype(INT_DTYPE)),
                         jnp.asarray(far[1].astype(INT_DTYPE)),
                         jnp.asarray(far[2]))

    def _with_fallback(build, *args, **kw):
        # halo needs structure; allgather/replicated always assemble —
        # degrade x placement rather than fail the family
        modes = [xm] + [m for m in ("allgather", "replicated")
                        if m != xm]
        err = None
        for m in modes:
            try:
                return build(*args, x_mode=m, **kw), m
            except ValueError as e:
                err = e
        raise err

    pallas_ok = np.dtype(a.dtype) in (np.dtype(np.float32),
                                      np.dtype(np.float64))
    if a.nnz and pallas_ok:
        from ..formats.dia import dia_profile
        from ..formats.sell8w import WINDOW, estimate_sell8w_tiles
        from ..formats.sell8d import (cost_tables, dense_tile_ns,
                                      estimate_sell8d_auto, prepare_hybrid)
        from ..inspector import _pairs_floor_pad
        df = np.dtype(a.dtype) == np.dtype(np.float64)
        ndiags, fill = dia_profile(a)
        if ndiags and ndiags <= 256 and fill >= 0.3:
            try:
                plan, m_used = _with_fallback(
                    build_dist_dia_plan, a, mesh, axis)
                return DistAutoPlan(kind="dia", x_mode=m_used, m=a.m,
                                    n=a.n, nnz=a.nnz, parts={"dia": plan},
                                    rest=auto_rest)
            except ValueError:
                pass
        from ..formats.sell8d import _V2_MAX_N, STRIPE_ALIGN
        if (a.n > _V2_MAX_N
                and -(-a.n // (ndev * STRIPE_ALIGN)) * STRIPE_ALIGN
                <= _V2_MAX_N
                and _pairs_floor_pad(a) <= 32.0):
            # past the VMEM-x envelope, COLUMN sharding gives each device
            # a resident x slice (its natural P(axis) shard) + one psum —
            # the mesh counterpart of the single-chip striped tier, and
            # strictly cheaper than it (no per-stripe call overhead).
            # The row-sharded 8D plan would pay the windowed nw·4 KB/tile
            # DMA instead (round-4 VERDICT item 6).
            try:
                plan = build_dist_sell8d_cols_plan(
                    a, mesh, axis, max_pad_ratio=32.0,
                    interpret=interpret)
                return DistAutoPlan(
                    kind="sell8d_cols", x_mode="col-shards", m=a.m,
                    n=a.n, nnz=a.nnz, parts={"sell8d_cols": plan},
                    value_mode=plan.value_mode, max_pad=plan.max_pad,
                    rest=auto_rest)
            except ValueError:
                pass
        if _pairs_floor_pad(a) <= 32.0:
            t8d, _cap, spilled, nw = estimate_sell8d_auto(a, nw=None)
            pad8d = t8d * WINDOW / a.nnz if t8d else float("inf")
            if spilled > 0.02 * a.nnz:
                pad8d = float("inf")
            t8w = estimate_sell8w_tiles(a)
            pad8w = t8w * WINDOW / a.nnz if t8w else float("inf")
            ts_tab, spill_ns = cost_tables(False, df)
            cost_8w = (t8w * dense_tile_ns(df) if t8w else float("inf"))
            cost_8d = (t8d * ts_tab[nw] + spilled * spill_ns
                       if pad8d < float("inf") else float("inf"))
            prep = None
            if min(pad8w, pad8d) > 4.0:
                prep = prepare_hybrid(a)
                if (prep is not None
                        and (prep.cost >= 0.85 * min(cost_8w, cost_8d)
                             or prep.spilled > 0.02 * a.nnz)):
                    prep = None
            if prep is not None:
                try:
                    # sub-parts are rectangular (dense is compact k×n) —
                    # halo's square requirement falls back inside
                    dense_plan, mu1 = _with_fallback(
                        build_dist_sell8w_plan, prep.dense_sorted, mesh,
                        axis, max_pad_ratio=96.0, interpret=interpret)
                    # per-shard pads inflate past the global estimate
                    # (shard boundaries split slices/pairs), so the light
                    # part's allowance is just the HBM cap under a 96
                    # ceiling — the prep.cost-vs-alternatives gate above
                    # already rejected genuinely bad hybrids
                    allow_s = min(96.0,
                                  6.7e8 / max(prep.sparse.nnz, 1))
                    light_plan, mu2 = _with_fallback(
                        build_dist_sell8d_plan, prep.sparse, mesh, axis,
                        nw=prep.nw, max_pad_ratio=allow_s,
                        interpret=interpret)
                    return DistAutoPlan(
                        kind="hybrid", x_mode=f"{mu1}/{mu2}", m=a.m,
                        n=a.n, nnz=a.nnz,
                        parts={"dense": dense_plan, "light": light_plan,
                               "fold_rows": jnp.asarray(
                                   prep.fold_rows.astype(INT_DTYPE))},
                        value_mode=light_plan.value_mode,
                        max_pad=prep.tiles * WINDOW / a.nnz,
                        rest=auto_rest)
                except ValueError:
                    pass
            if pad8w <= 32.0 and cost_8w <= cost_8d:
                try:
                    plan, m_used = _with_fallback(
                        build_dist_sell8w_plan, a, mesh, axis,
                        max_pad_ratio=32.0, interpret=interpret)
                    return DistAutoPlan(
                        kind="sell8w", x_mode=m_used, m=a.m, n=a.n,
                        nnz=a.nnz, parts={"sell8w": plan},
                        max_pad=plan.max_pad, rest=auto_rest)
                except ValueError:
                    pass
            if pad8d <= 32.0:
                try:
                    plan, m_used = _with_fallback(
                        build_dist_sell8d_plan, a, mesh, axis, nw=nw,
                        interpret=interpret)
                    return DistAutoPlan(
                        kind="sell8d", x_mode=m_used, m=a.m, n=a.n,
                        nnz=a.nnz, parts={"sell8d": plan},
                        value_mode=plan.value_mode, max_pad=plan.max_pad,
                        rest=auto_rest)
                except ValueError:
                    pass
            if pad8w <= 32.0:
                try:
                    plan, m_used = _with_fallback(
                        build_dist_sell8w_plan, a, mesh, axis,
                        max_pad_ratio=32.0, interpret=interpret)
                    return DistAutoPlan(
                        kind="sell8w", x_mode=m_used, m=a.m, n=a.n,
                        nnz=a.nnz, parts={"sell8w": plan},
                        max_pad=plan.max_pad, rest=auto_rest)
                except ValueError:
                    pass
        if not df:
            # webbase-shaped rescue (round-5, VERDICT item 6): hub-column
            # x-extension + heavy/light split — each part on its own dist
            # builder, the fold riding the light plan's x-extension
            # entries exactly like the single-chip graph plan
            # (handle._build_graph_plan; formats/graph.py has the measured
            # rationale).  Heavy output feeds the light input, so the
            # composition stays two collectives deep at most.
            from ..formats.graph import prepare_graph_split
            from ..handle import _append_fold_entries, _graph_gate
            gprep = prepare_graph_split(a)
            if _graph_gate(a, gprep):
                try:
                    parts = {}
                    light_mat = gprep.light
                    mu_h = None
                    if gprep.heavy is not None:
                        heavy_plan, mu_h = _with_fallback(
                            build_dist_sell8w_plan, gprep.heavy, mesh,
                            axis, max_pad_ratio=96.0,
                            interpret=interpret)
                        parts["heavy"] = heavy_plan
                        light_mat = _append_fold_entries(
                            gprep.light, gprep.fold_rows,
                            np.asarray(gprep.light.vals).dtype)
                    light_plan, mu_l = _with_fallback(
                        build_dist_sell8d_plan, light_mat, mesh, axis,
                        nw=gprep.nw, max_pad_ratio=96.0,
                        interpret=interpret)
                    parts["light"] = light_plan
                    if gprep.hub_cols is not None:
                        parts["hub_cols"] = jnp.asarray(
                            gprep.hub_cols.astype(INT_DTYPE))
                    return DistAutoPlan(
                        kind="graph",
                        x_mode=(f"{mu_h}/{mu_l}" if mu_h else mu_l),
                        m=a.m, n=a.n, nnz=a.nnz, parts=parts,
                        value_mode=light_plan.value_mode,
                        max_pad=gprep.pad_ratio(a.nnz), rest=auto_rest)
                except ValueError:
                    pass
    # the exact-nnz scan serves any matrix/dtype
    plan, m_used = _with_fallback(build_dist_plan, a, mesh, axis)
    return DistAutoPlan(kind="scan", x_mode=m_used, m=a.m, n=a.n,
                        nnz=a.nnz, parts={"scan": plan}, rest=auto_rest)


def dist_auto_spmv(plan: DistAutoPlan, x) -> jax.Array:
    """Execute a :func:`build_dist_auto` plan."""
    p = plan.parts
    if plan.kind == "dia":
        y = dist_dia_spmv(p["dia"], x)
    elif plan.kind == "sell8w":
        y = dist_sell8w_spmv(p["sell8w"], x)
    elif plan.kind == "sell8d":
        y = dist_sell8d_spmv(p["sell8d"], x)
    elif plan.kind == "sell8d_cols":
        y = dist_sell8d_cols_spmv(p["sell8d_cols"], x)
    elif plan.kind == "graph":
        xj = jnp.asarray(x)
        hub = p.get("hub_cols")
        x_ext = jnp.concatenate([xj, xj[hub]]) if hub is not None else xj
        if "heavy" in p:
            yh = dist_sell8w_spmv(p["heavy"], x_ext)
            y = dist_sell8d_spmv(p["light"],
                                 jnp.concatenate([x_ext,
                                                  yh.astype(x_ext.dtype)]))
        else:
            y = dist_sell8d_spmv(p["light"], x_ext)
    elif plan.kind == "hybrid":
        y = dist_sell8d_spmv(p["light"], x)
        yd = dist_sell8w_spmv(p["dense"], x)
        k = p["dense"].m
        y = y.at[p["fold_rows"]].add(yd[:k].astype(y.dtype))
    else:
        y = dist_spmv(p["scan"], x)
    if plan.rest is not None:
        rows, cols, vals = plan.rest
        xr = jnp.asarray(x)
        y = y.at[rows].add((vals * xr[cols]).astype(y.dtype))
    return y
