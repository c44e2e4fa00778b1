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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..formats.coo2 import Coo2
from ..formats.sell8w import LANES, SUB, WINDOW
from .pallas_sell import build_sell8w_fn

__all__ = ["build_coo2_fn"]


def _pass1_kernel(w_ref, xwin_ref, meta_ref, vals_ref, out_ref):
    m = meta_ref[0].astype(jnp.int32)
    t1 = jnp.take_along_axis(xwin_ref[:], m >> 7, axis=0)
    xg = jnp.take_along_axis(t1, m & 127, axis=1)
    out_ref[0] = vals_ref[0] * xg


@functools.partial(jax.jit, static_argnames=("ntiles", "n", "interpret"))
def _pass1(window_ids, x, meta, vals, *, ntiles, n, interpret=False):
    n_pad = -(-n // WINDOW) * WINDOW
    if n_pad != n:
        x = jnp.concatenate([x, jnp.zeros(n_pad - n, x.dtype)])
    x2 = x.astype(jnp.float32).reshape(-1, LANES)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((SUB, LANES), lambda t, w: (w[t], 0)),
            pl.BlockSpec((1, SUB, LANES), lambda t, w: (t, 0, 0)),
            pl.BlockSpec((1, SUB, LANES), lambda t, w: (t, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, SUB, LANES), lambda t, w: (t, 0, 0)),
    )
    out = pl.pallas_call(
        _pass1_kernel,
        out_shape=jax.ShapeDtypeStruct((ntiles, SUB, LANES), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(window_ids, x2, meta, vals)
    return out


def build_coo2_fn(packed: Coo2, interpret: bool = False):
    """x -> y closure: pass-1 product stream, pass-2 SELL-8W reduce."""
    window_ids = jnp.asarray(packed.window_ids)
    meta = jnp.asarray(packed.meta)
    vals = jnp.asarray(packed.vals)
    ntiles, n = packed.ntiles, packed.n
    reduce_fn = build_sell8w_fn(packed.reduce_plan, interpret=interpret,
                                binary=True)

    def fn(x):
        prod = _pass1(window_ids, x, meta, vals, ntiles=ntiles, n=n,
                      interpret=interpret)
        return reduce_fn(prod.reshape(-1))

    return fn
