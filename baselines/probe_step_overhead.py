"""Isolate the SELL-8W kernel's cost structure on clustered200k.

Hypotheses for the 4x gap between the traffic model (~19 B/nnz at pad 1.92)
and the measured 75 B/nnz: (a) fixed per-grid-step overhead, (b) x-window
DMA on window changes, (c) the masked accumulate.  Micro-kernels with the
same data sizes, varying one factor at a time; co-timed within one run.
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
from spmv_tpu.formats.sell8w import pack_sell8w
from spmv_tpu.ops.pallas_sell import build_sell8w_fn, pack_gpk


def honest_stream_gbs(nbytes=128 * 1024 * 1024):
    """Streaming rate with a non-foldable carry (renormalize by max)."""
    n = nbytes // 4
    x = jnp.ones((n,), jnp.float32)

    def step(x):
        y = x * 1.0000001
        scale = jnp.exp2(-jnp.ceil(jnp.log2(jnp.maximum(
            jnp.max(jnp.abs(y)), 1e-30))))
        return y * scale

    dt = min(time_op_samples(step, x, iters=10, repeats=2))
    # ~3 passes over x (read for mul, read for max fused?, write) — report
    # the 2-pass convention used in PERFNOTES
    return 2 * n * 4 / dt / 1e9


# --- micro kernel 1: pure tile stream accumulate, B tiles per grid step ---
def _acc_kernel(v_ref, o_ref):
    o_ref[0] += jnp.sum(v_ref[:], axis=0)


def tile_stream_time(vals, block):
    nt = vals.shape[0] // block * block
    v = vals[:nt]

    @jax.jit
    def run(v):
        return pl.pallas_call(
            _acc_kernel,
            out_shape=jax.ShapeDtypeStruct((1, 8, 128), jnp.float32),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=0,
                grid=(nt // block,),
                in_specs=[pl.BlockSpec((block, 8, 128), lambda t: (t, 0, 0))],
                out_specs=pl.BlockSpec((1, 8, 128), lambda t: (0, 0, 0)),
            ),
        )(v)

    def step(x):
        out = run(v * (1 + x[0, 0, 0] * 1e-20))
        return out

    dts = time_op_samples(step, v[:1] * 0 + 1.0, iters=10, repeats=2)
    return min(dts)


def main():
    print(json.dumps({"stream_gbs": round(honest_stream_gbs(), 1)}), flush=True)

    a = generate.clustered(200_000, 200_000, 32, spread=512,
                           dtype=np.float32, seed=9)
    packed = pack_sell8w(a, max_pad_ratio=3.0)
    nt = packed.ntiles
    print(json.dumps({"ntiles": nt, "pad": round(packed.pad_ratio, 3),
                      "n_window_changes": int(np.sum(np.diff(
                          packed.window_ids.astype(np.int64)
                          + packed.slice_ids.astype(np.int64) * (1 << 32)) != 0))}),
          flush=True)

    # full kernel (reference point, compile cached from round 1)
    fn = build_sell8w_fn(packed)
    x0 = jnp.asarray(np.random.default_rng(0).standard_normal(a.n).astype(np.float32))
    from spmv_tpu.bench.timing import time_spmv_samples
    dt_full = min(time_spmv_samples(fn, x0, iters=10, repeats=2))
    print(json.dumps({"full_kernel_ms": round(dt_full * 1e3, 3),
                      "gflops": round(2 * a.nnz / dt_full / 1e9, 2)}), flush=True)

    # same data, window_ids forced to 0 (no x DMA churn; results wrong)
    import dataclasses
    packed0 = dataclasses.replace(packed, window_ids=np.zeros_like(packed.window_ids))
    fn0 = build_sell8w_fn(packed0)
    dt_w0 = min(time_spmv_samples(fn0, x0, iters=10, repeats=2))
    print(json.dumps({"window0_kernel_ms": round(dt_w0 * 1e3, 3)}), flush=True)

    # binary variant (no vals stream)
    fnb = build_sell8w_fn(packed, binary=True)
    dt_b = min(time_spmv_samples(fnb, x0, iters=10, repeats=2))
    print(json.dumps({"binary_kernel_ms": round(dt_b * 1e3, 3)}), flush=True)

    # pure tile-stream accumulate at matching tile count, 1 vs 8 per step
    vals = jnp.asarray(packed.vals)
    for block in (1, 8):
        dt = tile_stream_time(vals, block)
        print(json.dumps({"acc_block": block,
                          "ms": round(dt * 1e3, 3),
                          "gbs": round(vals.size * 4 / dt / 1e9, 1)}), flush=True)


if __name__ == "__main__":
    main()
