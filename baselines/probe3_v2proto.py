"""Probe 3: v2 kernel prototypes, co-timed with honest XLA stream.

A: XLA roll-stream (honest non-foldable elementwise) — the XLA rate now.
B: pallas huge-block stream (512 tiles/step) — does block size lift the
   16.6 GB/s pallas ceiling?
C: v2 proto — x resident in VMEM, G=16 tiles/step, per-tile window via
   dynamic slice, f32 vals (timing only; row routing faked).
D: v2 palette — values decoded from 3 meta bits (k/8 dyadic), no vals input.
E: v2 bf16 vals.
"""
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

G = 16


def xla_roll_stream(vals_flat):
    v = vals_flat

    def step(z):
        return jnp.roll(z, 1) * 1.0000001

    dts = time_op_samples(step, v, iters=10, repeats=3)
    dt = min(dts)
    return dt, [round(d * 1e3, 3) for d in dts]


def pallas_huge(vals):
    block = 512
    nt = vals.shape[0] // block * block
    v = vals[:nt]
    nsteps = nt // block

    def kern(v_ref, c_ref, o_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            o_ref[0] = c_ref[:]
        o_ref[0] += jnp.sum(v_ref[:], axis=0)

    @jax.jit
    def run(v, c):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((1, SUB, LANES), jnp.float32),
            grid=(nsteps,),
            in_specs=[pl.BlockSpec((block, SUB, LANES), lambda t: (t, 0, 0)),
                      pl.BlockSpec((SUB, LANES), lambda t: (0, 0))],
            out_specs=pl.BlockSpec((1, SUB, LANES), lambda t: (0, 0, 0)),
        )(v, c)

    def step(c):
        return run(v, c)[0] * 1e-3

    dts = time_op_samples(step, jnp.ones((SUB, LANES), jnp.float32),
                          iters=10, repeats=3)
    return min(dts), nt, [round(d * 1e3, 3) for d in dts]


def v2_proto(packed, mode):
    nt = packed.ntiles // G * G
    nsteps = nt // G
    meta_np = packed.meta[:nt].astype(np.int32)
    if mode == "palette":
        # codes 0..7 in bits 10-12 (fake codes for timing)
        meta_np = meta_np | ((np.arange(nt)[:, None, None] & 7) << 10)
    meta = jnp.asarray((meta_np & 0xFFFF).astype(np.uint16).view(np.int16))
    if mode == "bf16":
        vals = jnp.asarray(packed.vals[:nt]).astype(jnp.bfloat16)
    else:
        vals = jnp.asarray(packed.vals[:nt])
    # per-tile info: window<<3 | fake_row
    tinfo = jnp.asarray((packed.window_ids[:nt].astype(np.int64) << 3
                         | (np.arange(nt) & 7)).astype(np.int32))
    # per-step info: fake monotone group<<1|first
    ngroups = -(-packed.nslices // SUB)
    sg = (np.arange(nsteps) * ngroups // max(nsteps, 1)).astype(np.int64)
    first = np.ones(nsteps, np.int64)
    first[1:] = (sg[1:] != sg[:-1]).astype(np.int64)
    ginfo = jnp.asarray((sg << 1 | first).astype(np.int32))

    n_pad = -(-packed.n // 1024) * 1024
    x0 = jnp.ones((n_pad,), jnp.float32)
    use_vals = mode != "palette"

    def kern(*refs):
        if use_vals:
            tinfo_ref, ginfo_ref, x_ref, meta_ref, vals_ref, c_ref, o_ref = refs
        else:
            tinfo_ref, ginfo_ref, x_ref, meta_ref, c_ref, o_ref = refs
        p = pl.program_id(0)
        g = ginfo_ref[p]

        @pl.when((g & 1) == 1)
        def _():
            o_ref[0] = c_ref[:] * 1e-20
        acc = jnp.zeros((SUB, LANES), jnp.float32)
        for k in range(G):
            ti = tinfo_ref[p * G + k]
            w = ti >> 3
            row = ti & 7
            xwin = x_ref[pl.ds(w * SUB, SUB), :]
            m = meta_ref[k].astype(jnp.int32)
            t1 = jnp.take_along_axis(xwin, (m >> 7) & 7, axis=0)
            xg = jnp.take_along_axis(t1, m & 127, axis=1)
            if mode == "palette":
                v = ((m >> 10) & 7).astype(jnp.float32) * 0.125
            elif mode == "bf16":
                v = vals_ref[k].astype(jnp.float32)
            else:
                v = vals_ref[k]
            contrib = jnp.sum(v * xg, axis=0)
            mask = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANES), 0) == row
            acc += jnp.where(mask, contrib[None, :], 0.0)
        o_ref[0] += acc

    nrows_x2 = n_pad // LANES

    @jax.jit
    def run(tinfo, ginfo, x, meta, vals, c):
        x2 = x.reshape(-1, LANES)
        in_specs = [pl.BlockSpec((nrows_x2, LANES), lambda t, ti, gi: (0, 0)),
                    pl.BlockSpec((G, SUB, LANES), lambda t, ti, gi: (t, 0, 0))]
        args = [x2, meta]
        if use_vals:
            in_specs.append(pl.BlockSpec((G, SUB, LANES),
                                         lambda t, ti, gi: (t, 0, 0)))
            args.append(vals)
        in_specs.append(pl.BlockSpec((SUB, LANES), lambda t, ti, gi: (0, 0)))
        args.append(c)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nsteps,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, SUB, LANES),
                                   lambda t, ti, gi: (gi[t] >> 1, 0, 0)),
        )
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((ngroups, SUB, LANES),
                                           jnp.float32),
            grid_spec=grid_spec,
        )(tinfo, ginfo, *args)

    def step(c):
        out = run(tinfo, ginfo, x0, meta, vals, c)
        return out[0] * 1e-3

    dts = time_op_samples(step, jnp.ones((SUB, LANES), jnp.float32),
                          iters=10, repeats=3)
    return min(dts), nt, [round(d * 1e3, 3) for d in dts]


def main():
    a = generate.clustered(200_000, 200_000, 32, spread=512,
                           dtype=np.float32, seed=9)
    packed = pack_sell8w(a, max_pad_ratio=3.0)
    vals = jnp.asarray(packed.vals)

    dt, samples = xla_roll_stream(vals.reshape(-1))
    print(json.dumps({"variant": "A_xla_roll", "ms": round(dt * 1e3, 3),
                      "gbs": round(2 * vals.size * 4 / dt / 1e9, 1),
                      "all_ms": samples}), flush=True)

    dt, nt, samples = pallas_huge(vals)
    print(json.dumps({"variant": "B_huge512", "ms": round(dt * 1e3, 3),
                      "gbs": round(nt * 1024 * 4 / dt / 1e9, 1),
                      "all_ms": samples}), flush=True)

    for mode in ("f32", "palette", "bf16"):
        dt, nt, samples = v2_proto(packed, mode)
        eq_nnz = a.nnz * nt / packed.ntiles
        print(json.dumps({"variant": f"C_v2_{mode}",
                          "ms": round(dt * 1e3, 3),
                          "equiv_gflops": round(2 * eq_nnz / dt / 1e9, 2),
                          "all_ms": samples}), flush=True)


if __name__ == "__main__":
    main()
