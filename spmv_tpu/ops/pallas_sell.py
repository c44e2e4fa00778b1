"""Pallas TPU kernel for the SELL-8W format — the framework's hot kernel.

This is the TPU-native analog of the reference's AVX2 line-product
microkernels (``basic_*_lineProductGather_avx2``, inner_spmv.h:411-477): one
(8,128) tile = 8 nonzeros × 128 rows, gathered from a 1024-element x-window
and FMA-accumulated into per-slice lane sums.

Kernel structure (see PERFNOTES.md for the measured design constraints):

* grid = one step per tile; the x-window arrives as an (8,128) block of
  ``x2 = x.reshape(-1, 128)`` selected by a **scalar-prefetched** window id
  through the BlockSpec index_map — the only way Mosaic reaches a
  data-dependent x region at full DMA speed;
* the gather is ``take_along_axis`` dim0 ∘ dim1 on the (8,128) window — the
  only gather shapes Mosaic lowers — with both indices unpacked from one
  int16 per slot (``s << 7 | r``);
* output blocks cover 8 slices (8 × 128 rows); consecutive tiles of the same
  slice-group accumulate into the same VMEM-resident block, zero-initialized
  on first touch (block-revisit accumulation, like a matmul K-loop);
* measured co-timed: this kernel runs at the same rate as a gather-free
  streaming kernel — the gathers are free, traffic (6 B/nnz·pad) is the cost.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..formats.sell8w import Sell8W, Sell8WV2, plan_v2, LANES, SUB, WINDOW
from ..utils.profiling import dev_asarray as _asr

__all__ = ["build_sell8w_fn", "build_sell8w_v2_fn", "build_sell8w_v2w_fn",
           "build_sell8d_fn", "sell8w_spmv", "pack_gpk", "V2_MAX_N"]

#: v2 keeps x resident in VMEM; past this n it falls back to the v1 kernel
#: (x2 bytes ≈ n·4; leave VMEM room for tile double-buffering).
V2_MAX_N = 2_000_000


def pack_gpk(slice_ids) -> np.ndarray:
    """Host-side per-tile scalar metadata: (group << 4 | row_in_group << 1 |
    first_flag) packed into one int32 — the kernel's SMEM budget allows only
    ~2 int32 per grid step (PERFNOTES.md).  Single source of truth for the
    bit layout; used by both the single-device and distributed builders."""
    sl = np.asarray(slice_ids).astype(np.int64)
    groups = sl // SUB
    first = np.ones(len(sl), dtype=np.int64)
    first[1:] = (groups[1:] != groups[:-1]).astype(np.int64)
    return (groups << 4 | (sl % SUB) << 1 | first).astype(np.int32)


def _kernel(w_ref, gpk_ref, xwin_ref, meta_ref, vals_ref, out_ref):
    # gpk packs (group << 4 | row_in_group << 1 | first) — scalar-prefetch
    # arrays live in 1 MB SMEM, so tile metadata must stay at 2 int32/tile
    # (measured overflow at ~65k tiles with 4 arrays).
    t = pl.program_id(0)
    gpk = gpk_ref[t]

    @pl.when((gpk & 1) == 1)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    m = meta_ref[0].astype(jnp.int32)
    t1 = jnp.take_along_axis(xwin_ref[:], (m >> 7) & 7, axis=0)
    xg = jnp.take_along_axis(t1, m & 127, axis=1)
    contrib = jnp.sum(vals_ref[0] * xg, axis=0)          # (128,) lane sums
    row = (gpk >> 1) & 7
    mask = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANES), 0) == row
    out_ref[0] += jnp.where(mask, contrib[None, :], 0.0)


def _kernel_binary(w_ref, gpk_ref, xwin_ref, meta_ref, out_ref):
    """Values-free variant: all stored values are 1.0; slot validity rides
    meta bit 15 (int16 sign).  Used for COO2's R reduction — drops the
    (ntiles,8,128) f32 values stream entirely (pass-2 traffic −40%)."""
    t = pl.program_id(0)
    gpk = gpk_ref[t]

    @pl.when((gpk & 1) == 1)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    # int16 vector compares don't lower on this target — do them in int32
    # (sign-extension keeps the validity bit as the i32 sign)
    m = meta_ref[0].astype(jnp.int32)
    t1 = jnp.take_along_axis(xwin_ref[:], (m >> 7) & 7, axis=0)
    xg = jnp.take_along_axis(t1, m & 127, axis=1)
    contrib = jnp.sum(jnp.where(m < 0, xg, 0.0), axis=0)
    row = (gpk >> 1) & 7
    mask = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANES), 0) == row
    out_ref[0] += jnp.where(mask, contrib[None, :], 0.0)


@functools.partial(jax.jit, static_argnames=("ntiles", "nslices", "n",
                                             "interpret", "binary"))
def _run(window_ids, gpk, x, meta, vals, *, ntiles, nslices, n,
         interpret=False, binary=False):
    n_pad = -(-n // WINDOW) * WINDOW
    if n_pad != n:
        x = jnp.concatenate([x, jnp.zeros(n_pad - n, x.dtype)])
    x2 = x.astype(jnp.float32).reshape(-1, LANES)
    ngroups = -(-nslices // SUB)

    tile_spec = pl.BlockSpec((1, SUB, LANES), lambda t, w, g: (t, 0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(ntiles,),
        in_specs=[pl.BlockSpec((SUB, LANES), lambda t, w, g: (w[t], 0)),
                  tile_spec] + ([] if binary else [tile_spec]),
        out_specs=pl.BlockSpec((1, SUB, LANES),
                               lambda t, w, g: (g[t] >> 4, 0, 0)),
    )
    args = (window_ids, gpk, x2, meta) + (() if binary else (vals,))
    # jnp.take_along_axis emits int64 indices under global x64 (Mosaic
    # rejects them); kernel internals are all 32-bit — trace with x64 off
    with jax.enable_x64(False):
        out = pl.pallas_call(
            _kernel_binary if binary else _kernel,
            out_shape=jax.ShapeDtypeStruct((ngroups, SUB, LANES),
                                           jnp.float32),
            grid_spec=grid_spec,
            interpret=interpret,
        )(*args)
    return out


def _kernel_v1_df(w_ref, gpk_ref, xhi_ref, xlo_ref, meta_ref, vhi_ref,
                  vlo_ref, ohi_ref, olo_ref, *, vlo16: bool = False):
    """v1 (one tile per grid step) double-float body.

    The distributed SELL-8W tier pads per-shard tile streams to a common
    count in the v1 layout (uniform shapes across shards), so its f64 path
    needs a v1-layout EFT kernel; structure mirrors :func:`_kernel` with
    the hi/lo math of :func:`_kernel_v2_df`."""
    t = pl.program_id(0)
    gpk = gpk_ref[t]

    @pl.when((gpk & 1) == 1)
    def _():
        ohi_ref[:] = jnp.zeros_like(ohi_ref)
        olo_ref[:] = jnp.zeros_like(olo_ref)

    m = meta_ref[0].astype(jnp.int32)
    sidx = (m >> 7) & 7
    ridx = m & 127
    xh = jnp.take_along_axis(
        jnp.take_along_axis(xhi_ref[:], sidx, axis=0), ridx, axis=1)
    xl = jnp.take_along_axis(
        jnp.take_along_axis(xlo_ref[:], sidx, axis=0), ridx, axis=1)
    vh = vhi_ref[0]
    vl = _df16_decode(vh, vlo_ref[0]) if vlo16 else vlo_ref[0]
    ph, pe = _two_product(vh, xh)
    plo = pe + vh * xl + vl * xh
    shi, slo = _df_sublane_total(ph, plo)
    row = (gpk >> 1) & 7
    mask = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANES), 0) == row
    chi = jnp.where(mask, shi, 0.0)
    clo = jnp.where(mask, slo, 0.0)
    ohi, e = _two_sum(ohi_ref[0], chi)
    ohi_ref[0] = ohi
    olo_ref[0] += e + clo


@functools.partial(jax.jit, static_argnames=("ntiles", "nslices", "n",
                                             "interpret", "vlo16"))
def _run_df_v1(window_ids, gpk, x, meta, vals_hi, vals_lo, *, ntiles,
               nslices, n, interpret=False, vlo16=False):
    n_pad = -(-n // WINDOW) * WINDOW
    if n_pad != n:
        x = jnp.concatenate([x, jnp.zeros(n_pad - n, x.dtype)])
    xhi = x.astype(jnp.float32)
    xlo = (x - xhi.astype(x.dtype)).astype(jnp.float32)
    x2hi = xhi.reshape(-1, LANES)
    x2lo = xlo.reshape(-1, LANES)
    ngroups = -(-nslices // SUB)

    win_spec = pl.BlockSpec((SUB, LANES), lambda t, w, g: (w[t], 0))
    tile_spec = pl.BlockSpec((1, SUB, LANES), lambda t, w, g: (t, 0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(ntiles,),
        in_specs=[win_spec, win_spec, tile_spec, tile_spec, tile_spec],
        out_specs=[pl.BlockSpec((1, SUB, LANES),
                                lambda t, w, g: (g[t] >> 4, 0, 0))] * 2,
    )
    with jax.enable_x64(False):   # Mosaic rejects x64-promoted indices
        ohi, olo = pl.pallas_call(
            functools.partial(_kernel_v1_df, vlo16=vlo16),
            out_shape=[jax.ShapeDtypeStruct((ngroups, SUB, LANES),
                                            jnp.float32)] * 2,
            grid_spec=grid_spec,
            interpret=interpret,
        )(window_ids, gpk, x2hi, x2lo, meta, vals_hi, vals_lo)
    return ohi.astype(jnp.float64) + olo.astype(jnp.float64)


def _kernel_v2(tinfo_ref, ginfo_ref, x_ref, meta_ref, vals_ref, pal_ref,
               o_ref, *, g: int, value_mode: str, slot_mode: bool = False,
               nw: int = 1, cell_w: bool = False):
    """v2 body: G tiles per grid step, x resident in VMEM.

    Measured motivation (baselines/probe_step.out, probe3.out): the v1
    kernel's one-tile steps cost ~250 ns each regardless of work, and the
    values stream triples the tile traffic; v2 amortizes the step cost G×
    and compresses values (palette codes in meta bits 10-15, or bf16).

    ``slot_mode`` (the SELL-8D deep-slice layout, formats/sell8d.py):
    every slot IS a row of the 1024-row output block, so the tile's
    per-slot products accumulate directly — no sublane reduction, no row
    mask.  The gather/decode structure is identical.

    ``nw`` (slot mode only): windows per bundle tile — the tile gathers
    from nw consecutive 1024-column windows and selects per slot on meta
    bits 10..10+log2(nw)−1, dividing the (slice, window)-pairs pad floor
    for scattered matrices (formats/sell8d.py module docstring).
    """
    p = pl.program_id(0)
    gi = ginfo_ref[p]
    lb = nw.bit_length() - 1

    @pl.when((gi & 1) == 1)
    def _():
        o_ref[0] = jnp.zeros_like(o_ref[0])

    acc = jnp.zeros((SUB, LANES), jnp.float32)
    for k in range(g):
        ti = tinfo_ref[p * g + k]
        m = meta_ref[k].astype(jnp.int32)
        s_idx = (m >> 7) & 7
        r_idx = m & 127
        if slot_mode and nw > 1:
            base = (ti >> 3) * (nw * SUB)
            wsel = (m >> 10) & (nw - 1)
            if cell_w:
                # cell-shared (s, w): w is valid at CELL positions like
                # s, so merge the nw take0 results BEFORE one take1 —
                # 2*nw+1 ops/plane instead of 3*nw (pack_sell8d cell_w)
                tsel = jnp.zeros((SUB, LANES), jnp.float32)
                for j in range(nw):
                    xwin = x_ref[pl.ds(base + j * SUB, SUB), :]
                    t1 = jnp.take_along_axis(xwin, s_idx, axis=0)
                    tsel = jnp.where(wsel == j, t1, tsel)
                xg = jnp.take_along_axis(tsel, r_idx, axis=1)
            else:
                xg = jnp.zeros((SUB, LANES), jnp.float32)
                for j in range(nw):
                    xwin = x_ref[pl.ds(base + j * SUB, SUB), :]
                    t1 = jnp.take_along_axis(xwin, s_idx, axis=0)
                    gj = jnp.take_along_axis(t1, r_idx, axis=1)
                    xg = jnp.where(wsel == j, gj, xg)
        else:
            xwin = x_ref[pl.ds((ti >> 3) * SUB, SUB), :]
            t1 = jnp.take_along_axis(xwin, s_idx, axis=0)
            xg = jnp.take_along_axis(t1, r_idx, axis=1)
        if value_mode == "palette":
            # decode values from the resident palette row (code = meta
            # bits 10+lb..15)
            v = jnp.take_along_axis(pal_ref[:],
                                    (m >> (10 + lb)) & (63 >> lb), axis=1)
        else:
            v = vals_ref[k].astype(jnp.float32)
        if slot_mode:
            acc += v * xg
        else:
            contrib = jnp.sum(v * xg, axis=0)            # (128,) lane sums
            row = ti & 7
            mask = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANES),
                                            0) == row
            acc += jnp.where(mask, contrib[None, :], 0.0)
    o_ref[0] += acc


@functools.partial(jax.jit, static_argnames=("g", "value_mode", "nsteps",
                                             "nslices", "n", "interpret",
                                             "slot_mode", "nw", "cell_w"))
def _run_v2(tinfo, ginfo, x, meta, vals, pal, *, g, value_mode, nsteps,
            nslices, n, interpret=False, slot_mode=False, nw=1,
            cell_w=False):
    n_pad = -(-n // (WINDOW * nw)) * (WINDOW * nw)
    if n_pad != n:
        x = jnp.concatenate([x, jnp.zeros(n_pad - n, x.dtype)])
    x2 = x.astype(jnp.float32).reshape(-1, LANES)
    # slot mode (SELL-8D): one output block per 1024-row slice; row mode:
    # one block per group of 8 128-row slices — same block count per row
    ngroups = nslices if slot_mode else max(-(-nslices // SUB), 1)
    nrows_x2 = n_pad // LANES

    tile_spec = pl.BlockSpec((g, SUB, LANES), lambda t, ti, gi: (t, 0, 0))
    const_spec = pl.BlockSpec((SUB, LANES), lambda t, ti, gi: (0, 0))
    in_specs = [pl.BlockSpec((nrows_x2, LANES), lambda t, ti, gi: (0, 0)),
                tile_spec,
                tile_spec if value_mode != "palette" else const_spec,
                const_spec]
    args = (x2, meta,
            vals if value_mode != "palette" else jnp.zeros((SUB, LANES),
                                                           jnp.float32),
            pal)
    kern = functools.partial(_kernel_v2, g=g, value_mode=value_mode,
                             slot_mode=slot_mode, nw=nw, cell_w=cell_w)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nsteps,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, SUB, LANES),
                               lambda t, ti, gi: (gi[t] >> 1, 0, 0)),
    )
    # trace with x64 off: take_along_axis picks int64 indices under global
    # x64 and Mosaic rejects them (PERFNOTES.md)
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((ngroups, SUB, LANES),
                                           jnp.float32),
            grid_spec=grid_spec,
            interpret=interpret,
        )(tinfo, ginfo, *args)
    return out


def _ob(x):
    """Evaluation-order pin for error-free transforms.

    EFTs are algebraically trivial ((a+b)-a ≡ b in reals), so a
    fast-math/reassociation pass deletes exactly the rounding-error terms
    they capture.  Mosaic (the TPU path) preserves IEEE evaluation order —
    validated on-chip to < 1e-15 relative — so this is an identity there;
    ``lax.optimization_barrier`` does not lower in Mosaic kernels anyway.
    XLA:CPU (interpret mode) DOES simplify EFT patterns; interpret-mode df
    tests therefore assert structure + f32-level accuracy only, with the
    tight accuracy bound checked on hardware (tests/test_sell8w_f64.py)."""
    return x


def _make_kernel_v2w(g: int, value_mode: str):
    """v2w: G tiles per grid step with PER-TILE x-window DMAs.

    The VMEM-resident-x v2 kernel needs n ≤ V2_MAX_N; v2w keeps the
    grouped-step amortization (measured ~21 ns/tile marginal vs ~250 ns
    for one-tile steps) for arbitrary n by declaring G window inputs, each
    DMA'd through its own scalar-prefetched index_map.  ``binary`` mode is
    the COO2 R-reduction (values ≡ 1.0, validity in meta bit 15)."""
    def kern(*refs):
        tinfo_ref, ginfo_ref = refs[0], refs[1]
        wins = refs[2: 2 + g]
        rest = refs[2 + g:]
        if value_mode in ("f32", "bf16"):
            meta_ref, vals_ref, pal_ref = rest[0], rest[1], rest[2]
        else:
            meta_ref, pal_ref = rest[0], rest[1]
            vals_ref = None
        o_ref = rest[-1]
        p = pl.program_id(0)
        gi = ginfo_ref[p]

        @pl.when((gi & 1) == 1)
        def _():
            o_ref[0] = jnp.zeros_like(o_ref[0])

        acc = jnp.zeros((SUB, LANES), jnp.float32)
        for k in range(g):
            ti = tinfo_ref[p * g + k]
            m = meta_ref[k].astype(jnp.int32)
            t1 = jnp.take_along_axis(wins[k][:], (m >> 7) & 7, axis=0)
            xg = jnp.take_along_axis(t1, m & 127, axis=1)
            if value_mode == "palette":
                v = jnp.take_along_axis(pal_ref[:], (m >> 10) & 63, axis=1)
                contrib = jnp.sum(v * xg, axis=0)
            elif value_mode == "binary":
                # validity rides the int16 sign (bit 15); int16 vector
                # compares don't lower — compare in int32
                contrib = jnp.sum(jnp.where(m < 0, xg, 0.0), axis=0)
            else:
                contrib = jnp.sum(vals_ref[k].astype(jnp.float32) * xg,
                                  axis=0)
            row = ti & 7
            mask = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANES),
                                            0) == row
            acc += jnp.where(mask, contrib[None, :], 0.0)
        o_ref[0] += acc
    return kern


@functools.partial(jax.jit, static_argnames=("g", "value_mode", "nsteps",
                                             "nslices", "n", "interpret"))
def _run_v2w(tinfo, ginfo, x, meta, vals, pal, *, g, value_mode, nsteps,
             nslices, n, interpret=False):
    n_pad = -(-n // WINDOW) * WINDOW
    if n_pad != n:
        x = jnp.concatenate([x, jnp.zeros(n_pad - n, x.dtype)])
    x2 = x.astype(jnp.float32).reshape(-1, LANES)
    ngroups = max(-(-nslices // SUB), 1)

    def win_spec(k):
        return pl.BlockSpec((SUB, LANES),
                            lambda t, ti, gi, _k=k: (ti[t * g + _k] >> 3, 0))

    tile_spec = pl.BlockSpec((g, SUB, LANES), lambda t, ti, gi: (t, 0, 0))
    const_spec = pl.BlockSpec((SUB, LANES), lambda t, ti, gi: (0, 0))
    in_specs = [win_spec(k) for k in range(g)] + [tile_spec]
    args = [x2] * g + [meta]
    if value_mode in ("f32", "bf16"):
        in_specs.append(tile_spec)
        args.append(vals)
    in_specs.append(const_spec)
    args.append(pal if pal is not None
                else jnp.zeros((SUB, LANES), jnp.float32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nsteps,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, SUB, LANES),
                               lambda t, ti, gi: (gi[t] >> 1, 0, 0)),
    )
    with jax.enable_x64(False):     # Mosaic rejects x64-promoted indices
        out = pl.pallas_call(
            _make_kernel_v2w(g, value_mode),
            out_shape=jax.ShapeDtypeStruct((ngroups, SUB, LANES),
                                           jnp.float32),
            grid_spec=grid_spec,
            interpret=interpret,
        )(tinfo, ginfo, *args)
    return out


def _make_kernel_v2w_slot(g: int, nw: int, value_mode: str,
                          cell_w: bool = False):
    """Slot-mode (SELL-8D) body with PER-TILE window-bundle DMAs.

    Extends the scattered tier past VMEM residency (n > V2_MAX_N — VERDICT
    round-2 item 3): each grid step DMAs G bundles of nw consecutive
    (8,128) x-windows through scalar-prefetched index_maps instead of
    keeping x resident.  The DMA adds ~nw·4 KB/tile of x traffic — the
    price of unbounded n; the slot-accumulate structure is identical to
    the resident-x kernel (_kernel_v2 slot_mode)."""
    lb = nw.bit_length() - 1

    def kern(*refs):
        tinfo_ref, ginfo_ref = refs[0], refs[1]
        wins = refs[2: 2 + g]
        rest = refs[2 + g:]
        if value_mode in ("f32", "bf16"):
            meta_ref, vals_ref, pal_ref = rest[0], rest[1], rest[2]
        else:
            meta_ref, pal_ref = rest[0], rest[1]
            vals_ref = None
        o_ref = rest[-1]
        p = pl.program_id(0)
        gi = ginfo_ref[p]

        @pl.when((gi & 1) == 1)
        def _():
            o_ref[0] = jnp.zeros_like(o_ref[0])

        acc = jnp.zeros((SUB, LANES), jnp.float32)
        for k in range(g):
            m = meta_ref[k].astype(jnp.int32)
            s_idx = (m >> 7) & 7
            r_idx = m & 127
            if nw > 1:
                wsel = (m >> 10) & (nw - 1)
                if cell_w:
                    tsel = jnp.zeros((SUB, LANES), jnp.float32)
                    for j in range(nw):
                        xwin = wins[k][pl.ds(j * SUB, SUB), :]
                        t1 = jnp.take_along_axis(xwin, s_idx, axis=0)
                        tsel = jnp.where(wsel == j, t1, tsel)
                    xg = jnp.take_along_axis(tsel, r_idx, axis=1)
                else:
                    xg = jnp.zeros((SUB, LANES), jnp.float32)
                    for j in range(nw):
                        xwin = wins[k][pl.ds(j * SUB, SUB), :]
                        t1 = jnp.take_along_axis(xwin, s_idx, axis=0)
                        gj = jnp.take_along_axis(t1, r_idx, axis=1)
                        xg = jnp.where(wsel == j, gj, xg)
            else:
                t1 = jnp.take_along_axis(wins[k][:], s_idx, axis=0)
                xg = jnp.take_along_axis(t1, r_idx, axis=1)
            if value_mode == "palette":
                v = jnp.take_along_axis(pal_ref[:],
                                        (m >> (10 + lb)) & (63 >> lb),
                                        axis=1)
            else:
                v = vals_ref[k].astype(jnp.float32)
            acc += v * xg
        o_ref[0] += acc
    return kern


@functools.partial(jax.jit, static_argnames=("g", "nw", "value_mode",
                                             "nsteps", "nslices", "n",
                                             "interpret", "cell_w"))
def _run_v2w_slot(tinfo, ginfo, x, meta, vals, pal, *, g, nw, value_mode,
                  nsteps, nslices, n, interpret=False, cell_w=False):
    bundle = WINDOW * nw
    n_pad = -(-n // bundle) * bundle
    if n_pad != n:
        x = jnp.concatenate([x, jnp.zeros(n_pad - n, x.dtype)])
    x2 = x.astype(jnp.float32).reshape(-1, LANES)

    def win_spec(k):
        return pl.BlockSpec(
            (nw * SUB, LANES),
            lambda t, ti, gi, _k=k: (ti[t * g + _k] >> 3, 0))

    tile_spec = pl.BlockSpec((g, SUB, LANES), lambda t, ti, gi: (t, 0, 0))
    const_spec = pl.BlockSpec((SUB, LANES), lambda t, ti, gi: (0, 0))
    in_specs = [win_spec(k) for k in range(g)] + [tile_spec]
    args = [x2] * g + [meta]
    if value_mode in ("f32", "bf16"):
        in_specs.append(tile_spec)
        args.append(vals)
    in_specs.append(const_spec)
    args.append(pal if pal is not None
                else jnp.zeros((SUB, LANES), jnp.float32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nsteps,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, SUB, LANES),
                               lambda t, ti, gi: (gi[t] >> 1, 0, 0)),
    )
    with jax.enable_x64(False):     # Mosaic rejects x64-promoted indices
        out = pl.pallas_call(
            _make_kernel_v2w_slot(g, nw, value_mode, cell_w),
            out_shape=jax.ShapeDtypeStruct((nslices, SUB, LANES),
                                           jnp.float32),
            grid_spec=grid_spec,
            interpret=interpret,
        )(tinfo, ginfo, *args)
    return out


def _make_kernel_v2w_df(g: int, nw: int, palette: bool, slot_mode: bool,
                        vlo16: bool = False, cell_w: bool = False):
    """Double-float body with windowed DMAs — f64 past VMEM residency.

    Covers BOTH row mode (the "v2w has no double-float path yet" gap,
    VERDICT round-2 missing #1) and slot mode (large-n f64 scatter).  The
    hi/lo x planes arrive as 2·G window inputs; the EFT accumulation is
    identical to the resident-x df kernel (_kernel_v2_df)."""
    lb = nw.bit_length() - 1

    def kern(*refs):
        tinfo_ref, ginfo_ref = refs[0], refs[1]
        wins_hi = refs[2: 2 + g]
        wins_lo = refs[2 + g: 2 + 2 * g]
        rest = refs[2 + 2 * g:]
        meta_ref = rest[0]
        if palette:
            palhi_ref, pallo_ref = rest[1], rest[2]
            vhi_ref = vlo_ref = None
        else:
            vhi_ref, vlo_ref = rest[1], rest[2]
            palhi_ref = pallo_ref = None
        ohi_ref, olo_ref = rest[-2], rest[-1]
        p = pl.program_id(0)
        gi = ginfo_ref[p]

        @pl.when((gi & 1) == 1)
        def _():
            ohi_ref[0] = jnp.zeros_like(ohi_ref[0])
            olo_ref[0] = jnp.zeros_like(olo_ref[0])

        acchi = jnp.zeros((SUB, LANES), jnp.float32)
        acclo = jnp.zeros((SUB, LANES), jnp.float32)
        for k in range(g):
            ti = tinfo_ref[p * g + k]
            m = meta_ref[k].astype(jnp.int32)
            sidx = (m >> 7) & 7
            ridx = m & 127

            def _gather(win):
                t1 = jnp.take_along_axis(win, sidx, axis=0)
                return jnp.take_along_axis(t1, ridx, axis=1)

            if slot_mode and nw > 1:
                wsel = (m >> 10) & (nw - 1)
                if cell_w:
                    def _take0(win):
                        return jnp.take_along_axis(win, sidx, axis=0)
                    tsh = jnp.zeros((SUB, LANES), jnp.float32)
                    tsl = jnp.zeros((SUB, LANES), jnp.float32)
                    for j in range(nw):
                        sel = wsel == j
                        tsh = jnp.where(sel, _take0(
                            wins_hi[k][pl.ds(j * SUB, SUB), :]), tsh)
                        tsl = jnp.where(sel, _take0(
                            wins_lo[k][pl.ds(j * SUB, SUB), :]), tsl)
                    xh = jnp.take_along_axis(tsh, ridx, axis=1)
                    xl = jnp.take_along_axis(tsl, ridx, axis=1)
                else:
                    xh = jnp.zeros((SUB, LANES), jnp.float32)
                    xl = jnp.zeros((SUB, LANES), jnp.float32)
                    for j in range(nw):
                        sel = wsel == j
                        xh = jnp.where(
                            sel,
                            _gather(wins_hi[k][pl.ds(j * SUB, SUB), :]),
                            xh)
                        xl = jnp.where(
                            sel,
                            _gather(wins_lo[k][pl.ds(j * SUB, SUB), :]),
                            xl)
            else:
                xh = _gather(wins_hi[k][:])
                xl = _gather(wins_lo[k][:])
            if palette:
                code = (m >> (10 + lb)) & (63 >> lb)
                vh = jnp.take_along_axis(palhi_ref[:], code, axis=1)
                vl = jnp.take_along_axis(pallo_ref[:], code, axis=1)
            else:
                vh = vhi_ref[k]
                vl = (_df16_decode(vh, vlo_ref[k]) if vlo16
                      else vlo_ref[k])
            ph, pe = _two_product(vh, xh)
            plo = pe + vh * xl + vl * xh
            if slot_mode:
                acchi, e = _two_sum(acchi, ph)
                acclo = acclo + e + plo
                continue
            shi, slo = _df_sublane_total(ph, plo)
            row = ti & 7
            mask = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANES),
                                            0) == row
            chi = jnp.where(mask, shi, 0.0)
            clo = jnp.where(mask, slo, 0.0)
            acchi, e = _two_sum(acchi, chi)
            acclo = acclo + e + clo
        ohi, e = _two_sum(ohi_ref[0], acchi)
        ohi_ref[0] = ohi
        olo_ref[0] += e + acclo
    return kern


@functools.partial(jax.jit, static_argnames=("g", "nw", "palette",
                                             "slot_mode", "nsteps",
                                             "nslices", "n", "interpret",
                                             "vlo16", "cell_w"))
def _run_v2w_df(tinfo, ginfo, x, meta, vhi, vlo, palhi, pallo, *, g, nw,
                palette, slot_mode, nsteps, nslices, n, interpret=False,
                vlo16=False, cell_w=False):
    bundle = WINDOW * nw
    n_pad = -(-n // bundle) * bundle
    if n_pad != n:
        x = jnp.concatenate([x, jnp.zeros(n_pad - n, x.dtype)])
    xhi = x.astype(jnp.float32)
    xlo = (x - xhi.astype(x.dtype)).astype(jnp.float32)
    x2hi = xhi.reshape(-1, LANES)
    x2lo = xlo.reshape(-1, LANES)
    ngroups = nslices if slot_mode else max(-(-nslices // SUB), 1)

    def win_spec(k):
        blk = (nw * SUB, LANES) if slot_mode else (SUB, LANES)
        return pl.BlockSpec(
            blk, lambda t, ti, gi, _k=k: (ti[t * g + _k] >> 3, 0))

    tile_spec = pl.BlockSpec((g, SUB, LANES), lambda t, ti, gi: (t, 0, 0))
    const_spec = pl.BlockSpec((SUB, LANES), lambda t, ti, gi: (0, 0))
    dummy = jnp.zeros((SUB, LANES), jnp.float32)
    in_specs = ([win_spec(k) for k in range(g)] * 2
                + [tile_spec,
                   const_spec if palette else tile_spec,
                   const_spec if palette else tile_spec])
    args = ([x2hi] * g + [x2lo] * g
            + [meta,
               palhi if palette else vhi,
               pallo if palette else vlo])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nsteps,),
        in_specs=in_specs,
        out_specs=[pl.BlockSpec((1, SUB, LANES),
                                lambda t, ti, gi: (gi[t] >> 1, 0, 0))] * 2,
    )
    with jax.enable_x64(False):
        ohi, olo = pl.pallas_call(
            _make_kernel_v2w_df(g, nw, palette, slot_mode, vlo16,
                                cell_w),
            out_shape=[jax.ShapeDtypeStruct((ngroups, SUB, LANES),
                                            jnp.float32)] * 2,
            grid_spec=grid_spec,
            interpret=interpret,
        )(tinfo, ginfo, *args)
    return ohi.astype(jnp.float64) + olo.astype(jnp.float64)


def build_sell8w_v2w_fn(packed, g: int = 16, binary: bool = False,
                        interpret: bool = False):
    """x -> y closure over the grouped windowed-DMA kernel (any n).

    ``binary=True``: every stored value is 1.0 with validity in meta bit
    15 (the COO2 R reduction) — drops the values stream entirely.
    """
    v2 = packed if isinstance(packed, Sell8WV2) else plan_v2(packed, g=g)
    tinfo = _asr(v2.tinfo)
    ginfo = _asr(v2.ginfo)
    if binary:
        if not isinstance(packed, Sell8W):
            raise ValueError("binary mode needs the raw Sell8W packing")
        # rebuild meta with the validity bit from the v1 stream, regrouped
        valid = (packed.vals != 0)
        meta16 = (packed.meta.astype(np.int32)
                  | (valid.astype(np.int32) << 15)) & 0xFFFF
        meta_v1 = meta16.astype(np.uint16).view(np.int16)
        meta_np = np.zeros_like(v2.meta)
        # plan_v2 placed tile t at position dest[t]; recover by matching
        # tinfo/meta layout: regroup with the same padding computation
        groups = packed.slice_ids.astype(np.int64) // SUB
        ngroups = max(-(-packed.nslices // SUB), 1)
        counts = np.bincount(groups, minlength=ngroups)
        padded = np.maximum(-(-counts // v2.g) * v2.g, v2.g)
        starts = np.concatenate([[0], np.cumsum(padded)[:-1]])
        dest = starts[groups] + (np.arange(packed.ntiles)
                                 - np.concatenate(
                                     [[0], np.cumsum(counts)[:-1]])[groups])
        meta_np[dest] = meta_v1
        meta = _asr(meta_np)
        vals = None
        value_mode = "binary"
    else:
        meta = _asr(v2.meta)
        vals = _asr(v2.vals)
        value_mode = v2.value_mode
    pal = (_asr(np.tile(v2.palette[None, :], (SUB, 1)))
           if v2.palette is not None else None)
    m, n, nsteps, nslices = v2.m, v2.n, v2.nsteps, v2.nslices
    G = v2.g

    if value_mode in ("df", "df16", "palette_df"):
        # double-float row mode with windowed DMAs — the f64 large-n tier
        # (closes round-2's "v2w has no double-float path yet")
        is_pal = value_mode == "palette_df"
        vlo16 = value_mode == "df16"
        vals_lo = _asr(v2.vals_lo)
        pal_lo = (_asr(np.tile(v2.palette_lo[None, :], (SUB, 1)))
                  if v2.palette_lo is not None else None)
        dummy = jnp.zeros((SUB, LANES), jnp.float32)

        def fn_df(x):
            out = _run_v2w_df(
                tinfo, ginfo, x, meta,
                dummy if is_pal else vals, dummy if is_pal else vals_lo,
                pal if is_pal else dummy, pal_lo if is_pal else dummy,
                g=G, nw=1, palette=is_pal, slot_mode=False,
                nsteps=nsteps, nslices=nslices, n=n, interpret=interpret,
                vlo16=vlo16)
            return out.reshape(-1)[:m]

        return fn_df

    def fn(x):
        out = _run_v2w(tinfo, ginfo, x, meta, vals, pal, g=G,
                       value_mode=value_mode, nsteps=nsteps,
                       nslices=nslices, n=n, interpret=interpret)
        return out.reshape(-1)[:m]

    return fn


def _two_sum(a, b):
    """Knuth error-free two-sum: a + b = s + e exactly (f32)."""
    s = _ob(a + b)
    v = _ob(s - a)
    e = (a - (s - v)) + (b - v)
    return s, e


def _split(a):
    """Veltkamp split: a = hi + lo with hi on 12 mantissa bits (f32)."""
    c = _ob(a * 4097.0)                # 2**12 + 1
    hi = _ob(c - _ob(c - a))
    return hi, a - hi


def _two_product(a, b):
    """Dekker product without FMA: a*b = p + e exactly (f32)."""
    p = _ob(a * b)
    ah, al = _split(a)
    bh, bl = _split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def _df16_decode(vh, vq):
    """Expand a df16 lo plane: vlo = vq · floor-pow2(|vh|) · 2^-39.

    The scale rides vh's exponent bits (bitcast + mask — no extra stream);
    formats/sell8w.df16_encode_lo is the matching encoder.  Subnormal/zero
    vh decodes to scale 0 (the encoder wrote q = 0 for those slots)."""
    bits = jax.lax.bitcast_convert_type(vh, jnp.int32)
    pulse = jax.lax.bitcast_convert_type(bits & 0x7F800000, jnp.float32)
    return vq.astype(jnp.int32).astype(jnp.float32) * (
        pulse * jnp.float32(2.0 ** -39))


def _df_sublane_total(ph, plo):
    """Butterfly EFT reduction across sublanes: after 3 roll rounds every
    sublane of the returned (hi, lo) pair holds the compensated total of
    the 8 input sublanes.  Full-(8,128)-VREG ops at depth 3 — replaces the
    7-step sequential per-sublane two_sum chain (latency-bound; measured
    df tiles ~3x f32 tiles before this)."""
    hs, ls = ph, plo
    for shift in (4, 2, 1):
        s, e = _two_sum(hs, pltpu.roll(hs, shift, 0))
        ls = ls + pltpu.roll(ls, shift, 0) + e
        hs = s
    return hs, ls


def _kernel_v2_df(tinfo_ref, ginfo_ref, xhi_ref, xlo_ref, meta_ref,
                  vhi_ref, vlo_ref, palhi_ref, pallo_ref, ohi_ref, olo_ref,
                  *, g: int, palette: bool, slot_mode: bool = False,
                  nw: int = 1, vlo16: bool = False,
                  cell_w: bool = False):
    """Double-float (f64 ≈ two f32) v2 body — the f64 Pallas tier.

    The reference is f64-first (include/spmv.h:49); TPU vector units have no
    f64, so values/x/accumulators are (hi, lo) f32 pairs combined with
    error-free transforms (Dekker two-product via Veltkamp splits — no FMA
    assumption — and Knuth two-sums).  Relative error ~2^-45 measured vs
    the f64 oracle; the gathers/DMA structure is identical to the f32 v2
    kernel, so f64 leaves the XLA gather floor (VERDICT round-1 item 3).
    """
    p = pl.program_id(0)
    gi = ginfo_ref[p]

    @pl.when((gi & 1) == 1)
    def _():
        ohi_ref[0] = jnp.zeros_like(ohi_ref[0])
        olo_ref[0] = jnp.zeros_like(olo_ref[0])

    lb = nw.bit_length() - 1
    acchi = jnp.zeros((SUB, LANES), jnp.float32)
    acclo = jnp.zeros((SUB, LANES), jnp.float32)
    for k in range(g):
        ti = tinfo_ref[p * g + k]
        m = meta_ref[k].astype(jnp.int32)
        sidx = (m >> 7) & 7
        ridx = m & 127
        if slot_mode and nw > 1:
            base = (ti >> 3) * (nw * SUB)
            wsel = (m >> 10) & (nw - 1)
            if cell_w:
                # merge after take0, one take1 per plane (see _kernel_v2)
                tsh = jnp.zeros((SUB, LANES), jnp.float32)
                tsl = jnp.zeros((SUB, LANES), jnp.float32)
                for j in range(nw):
                    sel = wsel == j
                    tsh = jnp.where(sel, jnp.take_along_axis(
                        xhi_ref[pl.ds(base + j * SUB, SUB), :],
                        sidx, axis=0), tsh)
                    tsl = jnp.where(sel, jnp.take_along_axis(
                        xlo_ref[pl.ds(base + j * SUB, SUB), :],
                        sidx, axis=0), tsl)
                xh = jnp.take_along_axis(tsh, ridx, axis=1)
                xl = jnp.take_along_axis(tsl, ridx, axis=1)
            else:
                xh = jnp.zeros((SUB, LANES), jnp.float32)
                xl = jnp.zeros((SUB, LANES), jnp.float32)
                for j in range(nw):
                    th = jnp.take_along_axis(
                        jnp.take_along_axis(
                            xhi_ref[pl.ds(base + j * SUB, SUB), :],
                            sidx, axis=0), ridx, axis=1)
                    tl = jnp.take_along_axis(
                        jnp.take_along_axis(
                            xlo_ref[pl.ds(base + j * SUB, SUB), :],
                            sidx, axis=0), ridx, axis=1)
                    sel = wsel == j
                    xh = jnp.where(sel, th, xh)
                    xl = jnp.where(sel, tl, xl)
        else:
            base = (ti >> 3) * SUB
            xh = jnp.take_along_axis(
                jnp.take_along_axis(xhi_ref[pl.ds(base, SUB), :], sidx,
                                    axis=0), ridx, axis=1)
            xl = jnp.take_along_axis(
                jnp.take_along_axis(xlo_ref[pl.ds(base, SUB), :], sidx,
                                    axis=0), ridx, axis=1)
        if palette:
            code = (m >> (10 + lb)) & (63 >> lb)
            vh = jnp.take_along_axis(palhi_ref[:], code, axis=1)
            vl = jnp.take_along_axis(pallo_ref[:], code, axis=1)
        else:
            vh = vhi_ref[k]
            vl = (_df16_decode(vh, vlo_ref[k]) if vlo16
                  else vlo_ref[k])
        ph, pe = _two_product(vh, xh)
        plo = pe + vh * xl + vl * xh
        if slot_mode:
            # per-slot accumulation — no sublane reduce, no row mask
            acchi, e = _two_sum(acchi, ph)
            acclo = acclo + e + plo
            continue
        shi, slo = _df_sublane_total(ph, plo)
        row = ti & 7
        mask = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANES), 0) == row
        chi = jnp.where(mask, shi, 0.0)
        clo = jnp.where(mask, slo, 0.0)
        acchi, e = _two_sum(acchi, chi)
        acclo = acclo + e + clo
    ohi, e = _two_sum(ohi_ref[0], acchi)
    ohi_ref[0] = ohi
    olo_ref[0] += e + acclo


@functools.partial(jax.jit, static_argnames=("g", "palette", "nsteps",
                                             "nslices", "n", "interpret",
                                             "slot_mode", "nw", "planes",
                                             "vlo16", "cell_w"))
def _run_v2_df(tinfo, ginfo, x, meta, vhi, vlo, palhi, pallo, *, g,
               palette, nsteps, nslices, n, interpret=False,
               slot_mode=False, nw=1, planes=False, vlo16=False,
               cell_w=False):
    n_pad = -(-n // (WINDOW * nw)) * (WINDOW * nw)
    if n_pad != n:
        x = jnp.concatenate([x, jnp.zeros(n_pad - n, x.dtype)])
    xhi = x.astype(jnp.float32)
    xlo = (x - xhi.astype(x.dtype)).astype(jnp.float32)
    x2hi = xhi.reshape(-1, LANES)
    x2lo = xlo.reshape(-1, LANES)
    ngroups = nslices if slot_mode else max(-(-nslices // SUB), 1)
    nrows_x2 = n_pad // LANES

    tile_spec = pl.BlockSpec((g, SUB, LANES), lambda t, ti, gi: (t, 0, 0))
    const_spec = pl.BlockSpec((SUB, LANES), lambda t, ti, gi: (0, 0))
    x_spec = pl.BlockSpec((nrows_x2, LANES), lambda t, ti, gi: (0, 0))
    dummy = jnp.zeros((SUB, LANES), jnp.float32)
    in_specs = [x_spec, x_spec, tile_spec,
                const_spec if palette else tile_spec,
                const_spec if palette else tile_spec,
                const_spec, const_spec]
    args = (x2hi, x2lo, meta,
            dummy if palette else vhi, dummy if palette else vlo,
            palhi if palette else dummy, pallo if palette else dummy)
    kern = functools.partial(_kernel_v2_df, g=g, palette=palette,
                             slot_mode=slot_mode, nw=nw, vlo16=vlo16,
                             cell_w=cell_w)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nsteps,),
        in_specs=in_specs,
        out_specs=[pl.BlockSpec((1, SUB, LANES),
                                lambda t, ti, gi: (gi[t] >> 1, 0, 0))] * 2,
    )
    # x64 may be globally on (f64 front end); kernel internals are all
    # 32-bit, and jnp.take_along_axis picks int64 indices under x64 —
    # which Mosaic rejects.  Trace the kernel with x64 scoped off.
    with jax.enable_x64(False):
        ohi, olo = pl.pallas_call(
            kern,
            out_shape=[jax.ShapeDtypeStruct((ngroups, SUB, LANES),
                                            jnp.float32)] * 2,
            grid_spec=grid_spec,
            interpret=interpret,
        )(tinfo, ginfo, *args)
    if planes:
        # keep the (hi, lo) f32 planes separate: y64 == hi.f64 + lo.f64
        # exactly — the hybrid's binary fold kernel folds each plane and
        # converts once at the end (avoids the ~0.9 ms m-length f64
        # scatter-add, baselines/probe_fold2_df.out)
        return ohi, olo
    return ohi.astype(jnp.float64) + olo.astype(jnp.float64)


def build_sell8w_v2_fn(packed, g: int = 16, interpret: bool = False,
                       planes: bool = False):
    """x -> y closure over the v2 grouped tile stream.

    Accepts a :class:`Sell8W` (regrouped here) or a prebuilt
    :class:`Sell8WV2`.  Requires n ≤ V2_MAX_N (x resident in VMEM).

    ``planes`` (df modes only): return the raw f32 ``(hi, lo)`` output
    planes instead of their f64 sum — the hybrid fold consumes them
    plane-wise so the combine stays in f32 until one final convert.
    """
    v2 = packed if isinstance(packed, Sell8WV2) else plan_v2(packed, g=g)
    if v2.n > V2_MAX_N:
        raise ValueError(f"v2 kernel needs n <= {V2_MAX_N}, got {v2.n}")
    tinfo = _asr(v2.tinfo)
    ginfo = _asr(v2.ginfo)
    meta = _asr(v2.meta)
    vals = (_asr(v2.vals) if v2.vals is not None
            else None)

    def _bcast(p):
        return jnp.asarray(np.tile(
            (p if p is not None else np.zeros(LANES, np.float32))[None, :],
            (SUB, 1)))

    pal = _bcast(v2.palette)
    m, n, nsteps, nslices = v2.m, v2.n, v2.nsteps, v2.nslices
    value_mode, G = v2.value_mode, v2.g

    if value_mode in ("df", "df16", "palette_df"):
        vals_lo = _asr(v2.vals_lo)
        pal_lo = _bcast(v2.palette_lo)
        is_pal = value_mode == "palette_df"
        vlo16 = value_mode == "df16"

        if planes:
            def fn_planes(x):
                oh, ol = _run_v2_df(
                    tinfo, ginfo, x, meta, vals, vals_lo, pal, pal_lo,
                    g=G, palette=is_pal, nsteps=nsteps, nslices=nslices,
                    n=n, interpret=interpret, planes=True, vlo16=vlo16)
                return oh.reshape(-1)[:m], ol.reshape(-1)[:m]

            return fn_planes

        def fn(x):
            out = _run_v2_df(tinfo, ginfo, x, meta, vals, vals_lo, pal,
                             pal_lo, g=G, palette=is_pal, nsteps=nsteps,
                             nslices=nslices, n=n, interpret=interpret,
                             vlo16=vlo16)
            return out.reshape(-1)[:m]

        return fn
    if planes:
        raise ValueError("planes output is a df-mode contract")

    def fn(x):
        out = _run_v2(tinfo, ginfo, x, meta, vals, pal,
                      g=G, value_mode=value_mode, nsteps=nsteps,
                      nslices=nslices, n=n, interpret=interpret)
        return out.reshape(-1)[:m]

    return fn


#: scalar-prefetch SMEM budget: tinfo (per tile) + ginfo (per step)
#: int32s share ~1 MB of SMEM (PERFNOTES "Mosaic/Pallas constraints");
#: stay under ~800 KB — beyond it the remote compile helper dies
#: (measured: a 437k-tile slot plan → HTTP 500 subprocess crash)
_MAX_PREFETCH_INT32 = 200_000


def _slot_chunks(ginfo_np: np.ndarray, g: int):
    """Split a slot-mode tile stream into SMEM-sized chunks.

    The stream is output-block monotone with a first-visit zero flag in
    ginfo bit 0 (pack invariant, tests/test_windowed_slot.py), so each
    chunk covers a contiguous block range [b0, b1] and executes as its
    own pallas_call over a fresh (b1-b0+1)-block buffer; the caller adds
    the partials (blocks only overlap at chunk boundaries).  Returns
    None when one call fits.
    """
    nsteps = len(ginfo_np)
    max_steps = max(_MAX_PREFETCH_INT32 // (g + 1), 1)
    if nsteps <= max_steps:
        return None
    blocks = (ginfo_np.astype(np.int64) >> 1)
    chunks = []
    s0 = 0
    while s0 < nsteps:
        s1 = min(s0 + max_steps, nsteps)
        b0, b1 = int(blocks[s0]), int(blocks[s1 - 1])
        gi = (((blocks[s0:s1] - b0) << 1)
              | (ginfo_np[s0:s1] & 1)).astype(np.int32)
        gi[0] |= 1          # fresh buffer: zero its first block
        chunks.append((s0, s1, b0, b1, gi))
        s0 = s1
    return chunks


def build_sell8d_fn(packed, interpret: bool = False):
    """x -> y closure over a SELL-8D deep-slice stream (slot-mode v2).

    n ≤ V2_MAX_N keeps x resident in VMEM; past it the windowed-DMA slot
    kernels take over (≈ nw·4 KB/tile of extra x traffic — the scattered
    tier no longer ends at VMEM residency, VERDICT round-2 item 3).
    Output rows come back in natural order (slot position encodes the
    row), so no inverse permutation is needed.  Tile streams past the
    SMEM scalar-prefetch budget execute as block-range chunks
    (:func:`_slot_chunks`) — the format has no size ceiling.
    """
    windowed = packed.n > V2_MAX_N
    chunks = _slot_chunks(np.asarray(packed.ginfo), packed.g)
    tinfo = _asr(packed.tinfo)
    ginfo = _asr(packed.ginfo)
    meta = _asr(packed.meta)
    vals = _asr(packed.vals)

    def tile_pal(p):
        return jnp.asarray(np.tile(
            (p if p is not None
             else np.zeros(LANES, np.float32))[None, :], (SUB, 1)))

    pal = tile_pal(packed.palette)
    m, n, nsteps, nslices = packed.m, packed.n, packed.nsteps, packed.nslices
    value_mode, G, nw = packed.value_mode, packed.g, packed.nw
    cell_w = bool(getattr(packed, "cell_w", False))

    def _tile_parts(*arrs):
        """Per-chunk (tinfo, ginfo, tile-array..., nsteps, nslices, b0)."""
        if chunks is None:
            return [(tinfo, ginfo) + tuple(arrs)
                    + (nsteps, nslices, 0)]
        parts = []
        for s0, s1, b0, b1, gi in chunks:
            sliced = tuple(a[s0 * G: s1 * G] if a is not None else None
                           for a in arrs)
            parts.append((tinfo[s0 * G: s1 * G], jnp.asarray(gi))
                         + sliced + (s1 - s0, b1 - b0 + 1, b0))
        return parts

    if value_mode in ("df", "df16", "palette_df"):
        # double-float f64 slot mode (aligned hi/lo planes from the pack)
        vlo = (_asr(packed.vals_lo)
               if packed.vals_lo is not None else None)
        pallo = tile_pal(packed.palette_lo)
        is_pal = value_mode == "palette_df"
        vlo16 = value_mode == "df16"
        dummy = jnp.zeros((SUB, LANES), jnp.float32)
        parts = _tile_parts(meta, vals, vlo)

        def fn_df(x):
            out = (jnp.zeros((nslices, SUB, LANES), jnp.float64)
                   if chunks is not None else None)
            for ti_c, gi_c, meta_c, v_c, vlo_c, nst, nsl, b0 in parts:
                run = _run_v2w_df if windowed else _run_v2_df
                o = run(ti_c, gi_c, x, meta_c,
                        dummy if is_pal else v_c,
                        dummy if is_pal else vlo_c,
                        pal if is_pal else dummy,
                        pallo if is_pal else dummy,
                        g=G, palette=is_pal, nsteps=nst, nslices=nsl,
                        n=n, interpret=interpret, slot_mode=True, nw=nw,
                        vlo16=vlo16, cell_w=cell_w)
                if out is None:
                    out = o
                else:
                    out = out.at[b0: b0 + nsl].add(o)
            return out.reshape(-1)[:m]

        return fn_df

    parts = _tile_parts(meta, vals)

    def fn(x):
        out = (jnp.zeros((nslices, SUB, LANES), jnp.float32)
               if chunks is not None else None)
        for ti_c, gi_c, meta_c, v_c, nst, nsl, b0 in parts:
            if windowed:
                o = _run_v2w_slot(ti_c, gi_c, x, meta_c, v_c, pal, g=G,
                                  nw=nw, value_mode=value_mode,
                                  nsteps=nst, nslices=nsl, n=n,
                                  interpret=interpret, cell_w=cell_w)
            else:
                o = _run_v2(ti_c, gi_c, x, meta_c, v_c, pal, g=G,
                            value_mode=value_mode, nsteps=nst,
                            nslices=nsl, n=n, interpret=interpret,
                            slot_mode=True, nw=nw, cell_w=cell_w)
            if out is None:
                out = o
            else:
                out = out.at[b0: b0 + nsl].add(o)
        return out.reshape(-1)[:m]

    return fn


def build_sell8w_fn(packed: Sell8W, interpret: bool = False,
                    binary: bool = False):
    """Returns a jitted x -> y closure over device-resident tile arrays.

    ``interpret=True`` runs the kernel in the Pallas interpreter (CPU tests;
    the 8-device virtual mesh has no Mosaic backend).  ``binary=True`` drops
    the values stream — every stored value is treated as 1.0, with slot
    validity encoded in meta bit 15 (COO2's R reduction).
    """
    window_ids = _asr(packed.window_ids)
    gpk = _asr(pack_gpk(packed.slice_ids))
    if binary:
        # validity rides the int16 sign bit (bit 15 set ⇔ value 1.0);
        # int16 can't shift into the sign bit, so build in uint16 and
        # reinterpret
        meta_np = packed.meta.astype(np.int32)
        valid = (packed.vals != 0)
        meta = _asr(
            ((meta_np | (valid.astype(np.int32) << 15)) & 0xFFFF)
            .astype(np.uint16).view(np.int16))
        vals = None
    else:
        meta = _asr(packed.meta)
        vals = _asr(packed.vals)
    ntiles, nslices, m, n = (packed.ntiles, packed.nslices, packed.m,
                             packed.n)

    def fn(x):
        out = _run(window_ids, gpk, x, meta, vals,
                   ntiles=ntiles, nslices=nslices, n=n,
                   interpret=interpret, binary=binary)
        return out.reshape(-1)[:m]

    return fn


def sell8w_spmv(packed: Sell8W, x, interpret: bool = False) -> jax.Array:
    return build_sell8w_fn(packed, interpret=interpret)(x)
