"""Probe 2: co-timed pallas streaming variants on the clustered200k tile set.

All variants stream the same (ntiles, 8, 128) f32 vals array (46 MB); a tiny
(8,128) carry block threads the data dependency through the kernel so the
fori chain can't fold/dedupe, without adding a full-array pass.

Variants:
  S_big   : (64,8,128) blocks, accumulated out          -> best-case stream
  S_tile  : (1,8,128) blocks, accumulated out           -> per-step overhead
  S_tile8 : (8,8,128) blocks, accumulated out
  S_nodep : (8,8,128) blocks, out written per step      -> no out dependency
  G8      : (8,8,128) blocks + real two-stage gathers + masked accumulate
            (the v2 kernel body) with the x window fetched per step
"""
import functools
import json

from spmv_tpu.utils import enable_compile_cache
enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spmv_tpu.bench.timing import time_op_samples
from spmv_tpu.io import generate
from spmv_tpu.formats.sell8w import pack_sell8w, SUB, LANES


def make_stream_fn(vals, block, accumulate=True):
    nt = vals.shape[0] // block * block
    v = vals[:nt]
    nsteps = nt // block

    if accumulate:
        def kern(v_ref, c_ref, o_ref):
            t = pl.program_id(0)

            @pl.when(t == 0)
            def _():
                o_ref[0] = c_ref[:]
            o_ref[0] += jnp.sum(v_ref[:], axis=0)
        out_shape = jax.ShapeDtypeStruct((1, SUB, LANES), jnp.float32)
        out_spec = pl.BlockSpec((1, SUB, LANES), lambda t: (0, 0, 0))
    else:
        def kern(v_ref, c_ref, o_ref):
            o_ref[0] = jnp.sum(v_ref[:], axis=0) + c_ref[:]
        out_shape = jax.ShapeDtypeStruct((nsteps, SUB, LANES), jnp.float32)
        out_spec = pl.BlockSpec((1, SUB, LANES), lambda t: (t, 0, 0))

    @jax.jit
    def run(v, c):
        return pl.pallas_call(
            kern,
            out_shape=out_shape,
            grid=(nsteps,),
            in_specs=[pl.BlockSpec((block, SUB, LANES), lambda t: (t, 0, 0)),
                      pl.BlockSpec((SUB, LANES), lambda t: (0, 0))],
            out_specs=out_spec,
        )(v, c)

    def step(c):
        out = run(v, c)
        return out[0] * 1e-3

    return step, nt


def make_g8_fn(packed, G=8):
    nt = packed.ntiles // G * G
    meta = jnp.asarray(packed.meta[:nt])
    vals = jnp.asarray(packed.vals[:nt])
    wid = jnp.asarray(packed.window_ids[:nt:G])   # one window per step
    n_pad = -(-packed.n // 1024) * 1024

    def kern(w_ref, xwin_ref, meta_ref, vals_ref, c_ref, o_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            o_ref[0] = c_ref[:]
        acc = jnp.zeros((SUB, LANES), jnp.float32)
        for k in range(G):
            m = meta_ref[k].astype(jnp.int32)
            t1 = jnp.take_along_axis(xwin_ref[:], (m >> 7) & 7, axis=0)
            xg = jnp.take_along_axis(t1, m & 127, axis=1)
            contrib = jnp.sum(vals_ref[k] * xg, axis=0)      # (128,)
            row = k & 7
            mask = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANES), 0) == row
            acc += jnp.where(mask, contrib[None, :], 0.0)
        o_ref[0] += acc

    @jax.jit
    def run(w, meta, vals, x, c):
        x2 = x.reshape(-1, LANES)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nt // G,),
            in_specs=[pl.BlockSpec((SUB, LANES), lambda t, w: (w[t], 0)),
                      pl.BlockSpec((G, SUB, LANES), lambda t, w: (t, 0, 0)),
                      pl.BlockSpec((G, SUB, LANES), lambda t, w: (t, 0, 0)),
                      pl.BlockSpec((SUB, LANES), lambda t, w: (0, 0))],
            out_specs=pl.BlockSpec((1, SUB, LANES), lambda t, w: (0, 0, 0)),
        )
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((1, SUB, LANES), jnp.float32),
            grid_spec=grid_spec,
        )(w, meta, vals, x, c)

    x0 = jnp.ones((n_pad,), jnp.float32)

    def step(c):
        out = run(wid, meta, vals, x0, c)
        return out[0] * 1e-3

    return step, nt


def main():
    a = generate.clustered(200_000, 200_000, 32, spread=512,
                           dtype=np.float32, seed=9)
    packed = pack_sell8w(a, max_pad_ratio=3.0)
    vals = jnp.asarray(packed.vals)
    c0 = jnp.ones((SUB, LANES), jnp.float32)

    for name, block, acc in [("S_big", 64, True), ("S_tile", 1, True),
                             ("S_tile8", 8, True), ("S_nodep", 8, False)]:
        step, nt = make_stream_fn(vals, block, acc)
        dts = time_op_samples(step, c0, iters=10, repeats=3)
        dt = min(dts)
        print(json.dumps({"variant": name, "ms": round(dt * 1e3, 3),
                          "gbs": round(nt * 1024 * 4 / dt / 1e9, 1),
                          "all_ms": [round(d * 1e3, 3) for d in dts]}),
              flush=True)

    step, nt = make_g8_fn(packed)
    dts = time_op_samples(step, c0, iters=10, repeats=3)
    dt = min(dts)
    print(json.dumps({"variant": "G8", "ms": round(dt * 1e3, 3),
                      "equiv_gflops": round(2 * a.nnz / dt / 1e9, 2),
                      "all_ms": [round(d * 1e3, 3) for d in dts]}),
          flush=True)


if __name__ == "__main__":
    main()
