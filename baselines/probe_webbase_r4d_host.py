"""Webbase plan-space sweep — HOST ONLY (no chip, estimates + real packs).

The x-extension fold fixed powerlaw_f64 (1.23x) but regressed webbase
(1.11x -> 0.97x, probe_r4_fixes*.out).  Decompose the plan on the host:
per (hub config, r_thresh) candidate, the REAL packed tile counts for
heavy (with/without straggler split) and light (with/without fold
entries), plus rest sizes — then cost them with the calibrated tables
to pick 2-3 on-chip candidates.

Run:  JAX_PLATFORMS=cpu python baselines/probe_webbase_r4d_host.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
jax.config.update("jax_platforms", "cpu")

from spmv_tpu.io import generate                              # noqa: E402
from spmv_tpu.types import CsrMatrix                          # noqa: E402
from spmv_tpu.formats import graph as graph_fmt               # noqa: E402
from spmv_tpu.formats import sell8w as w_fmt                  # noqa: E402
from spmv_tpu.formats import sell8d as d_fmt                  # noqa: E402
from spmv_tpu.handle import _append_fold_entries              # noqa: E402

_TILE8W_NS = 9.3      # 8W v2 palette per-tile (PERFNOTES round-2/3)
_REST_NS = 28.0       # measured end-to-end f32 straggler cost


def cost_plan(th, tl, nrest, nhub, nw):
    tns = d_fmt._TILE_NS[nw]
    return (th * _TILE8W_NS + tl * tns + nrest * _REST_NS
            + nhub * 8.0) / 1e6   # ms


def main():
    a = generate.webbase_like(1_000_000, 1_000_000, 3_100_000,
                              dtype=np.float32, seed=11)
    print(f"matrix: {a.m}x{a.n} nnz={a.nnz}", flush=True)

    for hub_min, hub_max in ((8, 65536), (6, 65536), (8, 262144),
                             (4, 262144)):
        t0 = time.time()
        prep = graph_fmt.prepare_graph_split(
            a, hub_min_count=hub_min, hub_max=hub_max)
        if prep is None:
            print(f"hub({hub_min},{hub_max}): no prep")
            continue
        k = 0 if prep.hub_cols is None else len(prep.hub_cols)
        print(f"\nhub(min={hub_min},max={hub_max}): k={k} "
              f"chose t_heavy={prep.t_heavy} t_light={prep.t_light} "
              f"spill={prep.spilled} nw={prep.nw} "
              f"cost={prep.cost/1e6:.3f}ms  [{time.time()-t0:.1f}s]",
              flush=True)
        if prep.heavy is None:
            continue
        hm = prep.heavy
        # heavy: with and without the straggler split
        hm2, hrest, hfrac = w_fmt.split_stragglers(hm)
        th_keep = w_fmt.estimate_sell8w_tiles(hm)
        th_split = w_fmt.estimate_sell8w_tiles(hm2)
        nrest_h = 0 if hrest is None else len(hrest[0])
        print(f"  heavy: m2={hm.m} nnz={hm.nnz} tiles keep={th_keep} "
              f"split={th_split} (rest {nrest_h}) -> "
              f"keep {th_keep*_TILE8W_NS/1e6:.3f}ms vs "
              f"split {(th_split*_TILE8W_NS + nrest_h*_REST_NS)/1e6:.3f}ms",
              flush=True)
        # light: real pack, with and without fold entries, nw in {2,4}
        for hm_used, tag in ((hm, "keep"), (hm2, "split")):
            lm = _append_fold_entries(prep.light, prep.fold_rows,
                                      np.float32)
            for nw in (prep.nw, 4) if prep.nw != 4 else (prep.nw,):
                g = 8
                t0 = time.time()
                packed, rest8d = d_fmt.pack_sell8d(
                    lm, max_pad_ratio=48.0, nw=nw, g=g)
                nr = 0 if rest8d is None else len(rest8d[0])
                tot = cost_plan(
                    (th_keep if tag == "keep" else th_split),
                    packed.ntiles,
                    nr + (0 if tag == "keep" else nrest_h), k, nw)
                print(f"  light+fold[{tag}] nw={nw}: tiles={packed.ntiles} "
                      f"mode={packed.value_mode} rest={nr} "
                      f"-> EST total {tot:.3f}ms  [{time.time()-t0:.1f}s]",
                      flush=True)
            break   # fold entries identical for keep/split at same hm.m
        # light without fold (cost of fold entries in tiles)
        packed0, rest0 = d_fmt.pack_sell8d(
            prep.light, max_pad_ratio=48.0, nw=prep.nw, g=8)
        print(f"  light-nofold nw={prep.nw}: tiles={packed0.ntiles} "
              f"rest={0 if rest0 is None else len(rest0[0])}", flush=True)
    print("HOST SWEEP OK")


if __name__ == "__main__":
    main()
