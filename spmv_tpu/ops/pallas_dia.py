"""Pallas DIA kernel: banded SpMV with x read once.

The XLA DIA plan (ops/xla_csr.dia_spmv) re-reads a shifted copy of x per
diagonal — with bf16-compressed diagonals the x traffic dominates (e.g.
banded1m bw=4: 18 MB data + 36 MB x re-reads).  This kernel keeps the whole
``x2 = x.reshape(-1, 128)`` resident in VMEM (n ≤ ~3M f32) and builds each
diagonal's shifted view on-chip:

* offset o = q·128 + r decomposes into a static sublane shift (two dynamic
  row-slices of x2, the second one row below) and a static lane roll
  (``pltpu.roll`` + lane select) — zero HBM re-reads;
* out-of-range row slices are clamped; the garbage they read is multiplied
  by the structural zeros pack_dia stores outside the band, so edges stay
  exact;
* diagonal data streams as (ndiags, 16, 128) blocks (bf16-ready tiling).

Traffic: data once + x once + y once — the roofline for this format.
Gated to ndiags ≤ 33 (unrolled) and n ≤ VMEM; the XLA plan covers the rest.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from ..utils.profiling import dev_asarray as _asr

__all__ = ["build_dia_fn", "build_dia_fn_from_parts", "prepare_dia",
           "MAX_DIAGS", "MAX_N"]

LANES = 128
ROWS = 16               # rows of x2 per grid step (2048 matrix rows)
MAX_DIAGS = 33
MAX_N = 3_000_000       # x2 resident in VMEM; measured at 4M rows the
                        # 32 MB residency hurts pipelining (0.84x vs the
                        # XLA plan) — larger n stays on the XLA path
MAX_N_DF = 1_500_000    # double-float keeps TWO x planes resident


def _make_kernel(offsets, ndiags, pad_top):
    qr = [divmod(int(o), LANES) for o in offsets]   # python divmod: r in [0,128)

    def kernel(x_ref, data_ref, out_ref):
        blk = pl.program_id(0)
        acc = jnp.zeros((ROWS, LANES), jnp.float32)
        for k, (q, r) in enumerate(qr):
            # x_ref is padded with pad_top zero guard rows on top (and
            # enough at the bottom), so starts are always in range —
            # no clamping, which would silently shift boundary blocks.
            start = blk * ROWS + q + pad_top
            base = x_ref[pl.ds(start, ROWS), :]
            if r == 0:
                xs = base
            else:
                base2 = x_ref[pl.ds(start + 1, ROWS), :]
                # roll by -r ≡ roll by 128-r (pltpu.roll rejects negatives)
                rolled = pltpu.roll(base, LANES - r, 1)
                rolled2 = pltpu.roll(base2, LANES - r, 1)
                lane = jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 1)
                xs = jnp.where(lane < LANES - r, rolled, rolled2)
            acc = acc + data_ref[k].astype(jnp.float32) * xs
        out_ref[:] = acc

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("offsets", "m", "n", "interpret"))
def _run(data3, x, *, offsets, m, n, interpret=False):
    ndiags = len(offsets)
    blk_rows = ROWS * LANES
    m_pad = -(-m // blk_rows) * blk_rows
    # zero guard rows so every (start, start+1) slice is in range without
    # clamping: top covers the most negative q, bottom the most positive
    q_min = min(o // LANES for o in offsets)
    q_max = max(o // LANES for o in offsets)
    pad_top = max(0, -q_min)
    s_min = m_pad // LANES + max(q_max, 0) + 2
    n_pad = max(-(-n // LANES), s_min) * LANES
    x32 = x.astype(jnp.float32)
    x32 = jnp.concatenate([jnp.zeros(pad_top * LANES, jnp.float32),
                           x32, jnp.zeros(n_pad - n, jnp.float32)])
    x2 = x32.reshape(-1, LANES)
    nblocks = m_pad // blk_rows

    # trace with x64 off: global x64 (a live f64 handle elsewhere) promotes
    # in-kernel index math to int64, which Mosaic rejects (PERFNOTES.md)
    import jax as _jax
    with _jax.enable_x64(False):
        out = pl.pallas_call(
        _make_kernel(offsets, ndiags, pad_top),
        out_shape=jax.ShapeDtypeStruct((nblocks * ROWS, LANES), jnp.float32),
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),              # x2 full
            pl.BlockSpec((ndiags, ROWS, LANES),
                         lambda b: (0, b, 0)),
        ],
        out_specs=pl.BlockSpec((ROWS, LANES), lambda b: (b, 0)),
        interpret=interpret,
    )(x2, data3)
    return out.reshape(-1)[:m]


def _make_kernel_df(offsets, pad_top):
    """Double-float (f64 ≈ hi/lo f32) DIA body — the f64 banded tier.

    The reference is f64-first (include/spmv.h:49); the XLA f64 DIA plan
    re-reads a shifted f64 x per diagonal.  This kernel keeps BOTH hi/lo
    x planes resident in VMEM (read once) and accumulates with error-free
    transforms (same EFT toolkit as the SELL df kernels,
    ops/pallas_sell.py — Mosaic preserves IEEE evaluation order)."""
    from .pallas_sell import _two_sum, _two_product
    qr = [divmod(int(o), LANES) for o in offsets]

    def kernel(xhi_ref, xlo_ref, dhi_ref, dlo_ref, ohi_ref, olo_ref):
        blk = pl.program_id(0)
        acchi = jnp.zeros((ROWS, LANES), jnp.float32)
        acclo = jnp.zeros((ROWS, LANES), jnp.float32)
        for k, (q, r) in enumerate(qr):
            start = blk * ROWS + q + pad_top

            def shifted(x_ref, _r=r, _start=start):
                base = x_ref[pl.ds(_start, ROWS), :]
                if _r == 0:
                    return base
                base2 = x_ref[pl.ds(_start + 1, ROWS), :]
                rolled = pltpu.roll(base, LANES - _r, 1)
                rolled2 = pltpu.roll(base2, LANES - _r, 1)
                lane = jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES),
                                                1)
                return jnp.where(lane < LANES - _r, rolled, rolled2)

            xh = shifted(xhi_ref)
            xl = shifted(xlo_ref)
            vh = dhi_ref[k]
            vl = dlo_ref[k]
            ph, pe = _two_product(vh, xh)
            plo = pe + vh * xl + vl * xh
            acchi, e = _two_sum(acchi, ph)
            acclo = acclo + e + plo
        ohi_ref[:] = acchi
        olo_ref[:] = acclo

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("offsets", "m", "n", "interpret"))
def _run_df(dhi3, dlo3, x, *, offsets, m, n, interpret=False):
    ndiags = len(offsets)
    blk_rows = ROWS * LANES
    m_pad = -(-m // blk_rows) * blk_rows
    q_min = min(o // LANES for o in offsets)
    q_max = max(o // LANES for o in offsets)
    pad_top = max(0, -q_min)
    s_min = m_pad // LANES + max(q_max, 0) + 2
    n_pad = max(-(-n // LANES), s_min) * LANES
    xhi = x.astype(jnp.float32)
    xlo = (x - xhi.astype(x.dtype)).astype(jnp.float32)

    def plane(v):
        return jnp.concatenate(
            [jnp.zeros(pad_top * LANES, jnp.float32), v,
             jnp.zeros(n_pad - n, jnp.float32)]).reshape(-1, LANES)

    x2hi, x2lo = plane(xhi), plane(xlo)
    nblocks = m_pad // blk_rows
    with jax.enable_x64(False):   # Mosaic rejects x64-promoted index math
        ohi, olo = pl.pallas_call(
            _make_kernel_df(offsets, pad_top),
            out_shape=[jax.ShapeDtypeStruct((nblocks * ROWS, LANES),
                                            jnp.float32)] * 2,
            grid=(nblocks,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec((ndiags, ROWS, LANES), lambda b: (0, b, 0)),
                pl.BlockSpec((ndiags, ROWS, LANES), lambda b: (0, b, 0)),
            ],
            out_specs=[pl.BlockSpec((ROWS, LANES), lambda b: (b, 0))] * 2,
            interpret=interpret,
        )(x2hi, x2lo, dhi3, dlo3)
    y = ohi.astype(jnp.float64) + olo.astype(jnp.float64)
    return y.reshape(-1)[:m]


def prepare_dia(dia):
    """Device-side plan parts for :func:`build_dia_fn_from_parts`.

    Raises ValueError when out of the kernel's envelope.  The VMEM
    residency scales with the PADDED x2 (which covers both n and the row
    extent m), so both dimensions gate; f64 input selects the double-float
    kernel (two resident planes → tighter n bound).
    """
    import numpy as np
    offsets = tuple(int(o) for o in dia.offsets)
    if len(offsets) == 0 or len(offsets) > MAX_DIAGS:
        raise ValueError(f"pallas DIA: ndiags {len(offsets)} out of range")
    df = np.dtype(dia.data.dtype) == np.float64
    max_n = MAX_N_DF if df else MAX_N
    if max(dia.m, dia.n) > max_n:
        raise ValueError(
            f"pallas DIA: padded x2 for m={dia.m}, n={dia.n} exceeds the "
            f"VMEM budget (limit {max_n})")
    blk_rows = ROWS * LANES
    m_pad = -(-dia.m // blk_rows) * blk_rows
    if df:
        hi = dia.data.astype(np.float32)
        lo = (dia.data - hi.astype(np.float64)).astype(np.float32)
        dhi = np.zeros((len(offsets), m_pad), dtype=np.float32)
        dlo = np.zeros((len(offsets), m_pad), dtype=np.float32)
        dhi[:, : dia.m] = hi
        dlo[:, : dia.m] = lo
        return {"data3": _asr(dhi.reshape(len(offsets), -1, LANES)),
                "data3_lo": _asr(dlo.reshape(len(offsets), -1,
                                                    LANES)),
                "offsets": offsets, "m": dia.m, "n": dia.n}
    data = np.zeros((len(offsets), m_pad), dtype=dia.data.dtype)
    data[:, : dia.m] = dia.data
    # lossless bf16 diagonal stream (round-5, VERDICT item 8): the DIA
    # kernel is stream-bound and the data planes are its dominant bytes
    # (x is read once, resident); dyadic-exact value sets (the reference
    # harness's k/8 values, test_spmv.c:200) round-trip bf16 exactly, so
    # storing bf16 halves the stream at zero accuracy cost — the kernel
    # body already upcasts per block (data_ref[k].astype(f32))
    if np.dtype(data.dtype) == np.float32:
        import ml_dtypes
        dbf = data.astype(ml_dtypes.bfloat16)
        if np.array_equal(dbf.astype(np.float32), data):
            data = dbf
    data3 = _asr(data.reshape(len(offsets), -1, LANES))
    return {"data3": data3, "offsets": offsets, "m": dia.m, "n": dia.n}


def build_dia_fn_from_parts(parts, interpret: bool = False):
    data3, offsets = parts["data3"], parts["offsets"]
    m, n = parts["m"], parts["n"]
    if "data3_lo" in parts:          # double-float f64 plan
        dlo3 = parts["data3_lo"]

        def fn_df(x):
            return _run_df(data3, dlo3, x, offsets=offsets, m=m, n=n,
                           interpret=interpret)

        return fn_df

    def fn(x):
        return _run(data3, x, offsets=offsets, m=m, n=n,
                    interpret=interpret)

    return fn


def build_dia_fn(dia, interpret: bool = False):
    """x -> y closure for a DiaMatrix (convenience wrapper)."""
    return build_dia_fn_from_parts(prepare_dia(dia), interpret=interpret)
