"""Round-5 probe: can ONE wide dim1 gather replace the per-window loop?

The slot df16 kernel is COMPUTE-bound at ~44 ns/tile (nw=8): the window
loop costs 8 x (2 take0 + 2 take1 + 2 select) = 48 vector ops per tile
(PERFNOTES round-4).  If Mosaic supports take_along_axis axis=1 with an
(8, nw*128) source and an (8,128) index, the whole loop collapses to
2 gathers per plane:

    t1 = take_along_axis(xbundle(8, nw*128), C, axis=1)   # C: cell table
    xg = take_along_axis(t1, S, axis=0)                   # S: per-slot

composed as xg[i,j] = xb[S[i,j], C[S[i,j], j]] — i.e. the full in-bundle
column must live in a cell table keyed by (window-row, lane), a NEW
conflict class the packer would have to resolve (same machinery as the
existing s-table).  This probe answers, ON CHIP:

  q1: does the wide dim1 gather compile at nw*128 = 1024?
  q2: what does it cost vs the window loop (co-timed, same tile count)?
  q3: is the composed result exact (vs numpy oracle)?

Run: python baselines/probe_wide_gather_r5.py      (alone on the chip)
"""
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from spmv_tpu.utils import enable_compile_cache            # noqa: E402
enable_compile_cache()

import jax                                                  # noqa: E402
import jax.numpy as jnp                                     # noqa: E402
from jax.experimental import pallas as pl                   # noqa: E402
from jax.experimental.pallas import tpu as pltpu            # noqa: E402

SUB, LANES = 8, 128
NW = 8
WIDTH = NW * LANES          # 1024


def kern_loop(sidx_ref, ridx_ref, wsel_ref, x_ref, o_ref, *, g):
    """Current style: per-window (take0 + take1) + select, hi plane only."""
    acc = jnp.zeros((SUB, LANES), jnp.float32)
    for k in range(g):
        s = sidx_ref[k]
        r = ridx_ref[k]
        w = wsel_ref[k]
        xg = jnp.zeros((SUB, LANES), jnp.float32)
        for j in range(NW):
            xwin = x_ref[pl.ds(j * SUB, SUB), :]
            t1 = jnp.take_along_axis(xwin, s, axis=0)
            gj = jnp.take_along_axis(t1, r, axis=1)
            xg = jnp.where(w == j, gj, xg)
        acc += xg
    o_ref[0] = acc


def kern_wide(ctab_ref, srow_ref, xb_ref, o_ref, *, g):
    """Proposed: ONE wide dim1 gather on the (8, nw*128) bundle + take0."""
    acc = jnp.zeros((SUB, LANES), jnp.float32)
    for k in range(g):
        t1 = jnp.take_along_axis(xb_ref[:], ctab_ref[k], axis=1)
        xg = jnp.take_along_axis(t1, srow_ref[k], axis=0)
        acc += xg
    o_ref[0] = acc


def run(kind, g, nsteps, arrs, interpret=False):
    if kind == "loop":
        sidx, ridx, wsel, x2 = arrs
        kern = functools.partial(kern_loop, g=g)
        tile = pl.BlockSpec((g, SUB, LANES), lambda t: (t, 0, 0))
        in_specs = [tile, tile, tile,
                    pl.BlockSpec((NW * SUB, LANES), lambda t: (0, 0))]
        args = (sidx, ridx, wsel, x2)
    else:
        ctab, srow, xb = arrs
        kern = functools.partial(kern_wide, g=g)
        tile = pl.BlockSpec((g, SUB, LANES), lambda t: (t, 0, 0))
        in_specs = [tile, tile,
                    pl.BlockSpec((SUB, WIDTH), lambda t: (0, 0))]
        args = (ctab, srow, xb)
    with jax.enable_x64(False):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((1, SUB, LANES), jnp.float32),
            grid=(nsteps,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, SUB, LANES), lambda t: (0, 0, 0)),
            interpret=interpret,
        )(*args)


def main():
    rng = np.random.default_rng(0)
    g, nsteps = 32, 2048              # 65_536 tiles
    x = rng.standard_normal(SUB * WIDTH).astype(np.float32)
    x2 = x.reshape(NW * SUB, LANES)       # window-major (current layout)
    xb = x.reshape(SUB, WIDTH)            # bundle rows (proposed layout)
    # random targets: per slot a (srow, col-in-bundle) pair
    srow = rng.integers(0, SUB, (g, SUB, LANES)).astype(np.int32)
    # r = lane identity (cin ≡ j mod 128): the loop kernel's composed
    # take0∘take1 needs s stored at cell (i, r) — with r = j the per-slot
    # s plane IS the cell table, so both kernels read identical targets
    # (runtime data either way; the op count under test is unchanged)
    cin = (rng.integers(0, SUB, (g, SUB, LANES)).astype(np.int32) * LANES
           + np.arange(LANES, dtype=np.int32)[None, None, :])
    # loop-kernel meta: element x[srow*WIDTH + cin] in window-major terms:
    # global = srow*1024 + cin → window w = global // 1024 = srow (rows of
    # xb ARE the bundle sublane rows)... map exactly:
    # x2 layout: x[p] at (p // 128, p % 128); window j = rows 8j..8j+7.
    gidx = srow.astype(np.int64) * WIDTH + cin
    w_of = (gidx // 1024).astype(np.int32)
    s_of = ((gidx // 128) % 8).astype(np.int32)
    r_of = (gidx % 128).astype(np.int32)
    # the loop kernel's s is stored per-slot here (probe simplification —
    # the real s-table sharing doesn't change the op count)
    oracle = np.zeros((SUB, LANES), np.float64)
    xg = x[gidx]            # (g, 8, 128)
    oracle = xg.sum(axis=0)

    # wide kernel needs C at (srow, lane): build a CONSISTENT instance —
    # for the probe, force srow rows so that C[s, j] is well-defined:
    # regenerate per (slot) with srow = slot's own cell row...  simplest
    # consistent case: srow[i,j] = i (identity) → C[i,j] = cin[i,j].
    srow_id = np.tile(np.arange(SUB, dtype=np.int32)[None, :, None],
                      (g, 1, LANES))
    gidx_id = srow_id.astype(np.int64) * WIDTH + cin
    w_id = (gidx_id // 1024).astype(np.int32)
    s_id = ((gidx_id // 128) % 8).astype(np.int32)
    r_id = (gidx_id % 128).astype(np.int32)
    oracle_id = x[gidx_id].sum(axis=0)

    interp = "--interpret" in sys.argv
    if interp:
        jax.config.update("jax_platforms", "cpu")
    dev = jax.devices()[0]
    print(f"# backend: {dev.platform} interpret={interp}", flush=True)
    put = jax.device_put
    loop_args = (put(s_id), put(r_id), put(w_id), put(x2))
    wide_args = (put(cin), put(srow_id), put(xb))

    # q1+q3: compile & exactness
    try:
        yw = np.asarray(run("wide", g, nsteps, wide_args,
                            interpret=interp))[0]
    except Exception as e:  # noqa: BLE001
        print(f"WIDE GATHER REJECTED: {type(e).__name__}: "
              f"{str(e)[:400]}")
        return 1
    yl = np.asarray(run("loop", g, nsteps, loop_args,
                        interpret=interp))[0]
    print(f"# wide max err vs oracle: "
          f"{np.abs(yw - oracle_id).max():.3e}")
    print(f"# loop max err vs oracle: "
          f"{np.abs(yl - oracle_id).max():.3e}")
    if interp:
        return 0

    # q2: co-timed via the chained-k protocol (rect mode: the varying
    # carry is the gathered-from x array, scalar feedback — never naive
    # loops, CLAUDE.md)
    from spmv_tpu.bench.timing import time_spmv_chain
    s_d, r_d, w_d, x2_d = loop_args
    c_d, sr_d, xb_d = wide_args
    f_loop = jax.jit(
        lambda x2v: run("loop", g, nsteps, (s_d, r_d, w_d, x2v)))
    f_wide = jax.jit(
        lambda xbv: run("wide", g, nsteps, (c_d, sr_d, xbv)))
    for name, f, x0 in (("loop", f_loop, x2_d), ("wide", f_wide, xb_d)):
        r = time_spmv_chain(f, x0, iters=10, k=16, repeats=2)
        ns_tile = r["marginal"] / (g * nsteps) * 1e9
        print(f"{name}: incl {r['inclusive']*1e3:.3f} ms  "
              f"marg {r['marginal']*1e3:.3f} ms  {ns_tile:.2f} ns/tile",
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
