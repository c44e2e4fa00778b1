"""Pallas pass-1 kernel for COO2: windowed gather+FMA → product stream.

Identical gather structure to the SELL-8W kernel (ops/pallas_sell.py) but
without output accumulation: each grid step writes its (8,128) product tile
straight to the stream.  Pass 2 is the unmodified SELL-8W kernel applied to
the R matrix (formats/coo2.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..formats.coo2 import Coo2
from ..formats.sell8w import LANES, SUB, WINDOW
from .pallas_sell import build_sell8w_v2w_fn
from ..utils.profiling import dev_asarray as _asr

__all__ = ["build_coo2_fn"]

G1 = 16  # pass-1 tiles per grid step (same amortization as SELL-8W v2)


def _make_pass1_kernel(g: int):
    def kern(*refs):
        w_ref = refs[0]
        wins = refs[1: 1 + g]
        meta_ref, vals_ref, out_ref = refs[1 + g], refs[2 + g], refs[3 + g]
        for k in range(g):
            m = meta_ref[k].astype(jnp.int32)
            t1 = jnp.take_along_axis(wins[k][:], m >> 7, axis=0)
            xg = jnp.take_along_axis(t1, m & 127, axis=1)
            out_ref[k] = vals_ref[k].astype(jnp.float32) * xg
    return kern


@functools.partial(jax.jit, static_argnames=("ntiles", "n", "interpret"))
def _pass1(window_ids, x, meta, vals, *, ntiles, n, interpret=False):
    n_pad = -(-n // WINDOW) * WINDOW
    if n_pad != n:
        x = jnp.concatenate([x, jnp.zeros(n_pad - n, x.dtype)])
    x2 = x.astype(jnp.float32).reshape(-1, LANES)

    def win_spec(k):
        return pl.BlockSpec((SUB, LANES),
                            lambda t, w, _k=k: (w[t * G1 + _k], 0))

    tile_spec = pl.BlockSpec((G1, SUB, LANES), lambda t, w: (t, 0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ntiles // G1,),
        in_specs=[win_spec(k) for k in range(G1)] + [tile_spec, tile_spec],
        out_specs=tile_spec,
    )
    # trace with x64 off: Mosaic rejects x64-promoted indices (PERFNOTES.md)
    with jax.enable_x64(False):
        out = pl.pallas_call(
            _make_pass1_kernel(G1),
            out_shape=jax.ShapeDtypeStruct((ntiles, SUB, LANES),
                                           jnp.float32),
            grid_spec=grid_spec,
            interpret=interpret,
        )(window_ids, *([x2] * G1), meta, vals)
    return out


def build_coo2_fn(packed: Coo2, interpret: bool = False):
    """x -> y closure: pass-1 product stream, pass-2 SELL-8W v2w reduce.

    Both passes run grouped (G tiles per grid step) — the one-tile-per-step
    cost dominated the marginal time (~250 ns/tile, baselines/probe*.out).
    Pass-1 tiles are zero-padded to a G multiple; R positions only ever
    reference the unpadded prefix.
    """
    ntiles_p = -(-packed.ntiles // G1) * G1
    meta_np = np.zeros((ntiles_p, SUB, LANES), dtype=np.int16)
    # lossless bf16 halves the pass-1 values stream AND the host→device
    # transfer (the dominant predeal cost through the tunnel)
    from ..formats.dia import is_lossless_bf16
    vdt = np.float32
    if is_lossless_bf16(packed.vals.reshape(-1)):
        import ml_dtypes
        vdt = ml_dtypes.bfloat16
    vals_np = np.zeros((ntiles_p, SUB, LANES), dtype=vdt)
    win_np = np.zeros(ntiles_p, dtype=np.int32)
    meta_np[: packed.ntiles] = packed.meta
    vals_np[: packed.ntiles] = packed.vals.astype(vdt)
    win_np[: packed.ntiles] = packed.window_ids
    window_ids = _asr(win_np)
    meta = _asr(meta_np)
    vals = _asr(vals_np)
    n = packed.n
    n_positions = packed.reduce_plan.n
    reduce_fn = build_sell8w_v2w_fn(packed.reduce_plan, binary=True,
                                    interpret=interpret)

    def fn(x):
        prod = _pass1(window_ids, x, meta, vals, ntiles=ntiles_p, n=n,
                      interpret=interpret)
        return reduce_fn(prod.reshape(-1)[:n_positions])

    return fn
