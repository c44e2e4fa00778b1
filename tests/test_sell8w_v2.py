"""v2 grouped SELL-8W kernel: plan regrouping + interpret-mode correctness
(palette / bf16 / f32 value modes)."""

import numpy as np
import pytest

from spmv_tpu.formats.sell8w import (pack_sell8w, plan_v2, value_palette,
                                     SUB, WINDOW)
from spmv_tpu.io import generate
from spmv_tpu.oracle import spmv_golden
from spmv_tpu.types import CsrMatrix


def _v2_fn(a, g=4, **pack_kw):
    from spmv_tpu.ops.pallas_sell import build_sell8w_v2_fn
    packed = pack_sell8w(a, **pack_kw)
    v2 = plan_v2(packed, g=g)
    return build_sell8w_v2_fn(v2, interpret=True), v2


def test_value_palette_roundtrip():
    rng = np.random.default_rng(0)
    vals = generate.exact_values(rng, 1000, np.float32)
    pal, codes = value_palette(vals)
    assert pal[0] == 0.0
    np.testing.assert_array_equal(pal[codes], vals)
    # >64 distinct values: no palette
    assert value_palette(rng.standard_normal(1000).astype(np.float32)) is None


def test_plan_v2_structure():
    a = generate.clustered(600, 600, 10, spread=200, dtype=np.float32, seed=1)
    packed = pack_sell8w(a)
    v2 = plan_v2(packed, g=4)
    assert v2.value_mode == "palette"          # exact k/8 values
    assert v2.ntiles % 4 == 0 and v2.nsteps == v2.ntiles // 4
    assert v2.pad_ratio >= packed.pad_ratio    # zero-padding only adds tiles
    # every step maps to exactly one output group
    groups = v2.ginfo >> 1
    assert (np.diff(groups) >= 0).all()


@pytest.mark.parametrize("gen,seed", [
    ("clustered", 2), ("banded", 3), ("tall", 4)])
def test_v2_palette_matches_golden(gen, seed):
    if gen == "clustered":
        a = generate.clustered(500, 500, 8, spread=150,
                               dtype=np.float32, seed=seed)
    elif gen == "banded":
        a = generate.banded(300, 300, 4, dtype=np.float32, seed=seed)
    else:
        a = generate.clustered(1100, 300, 6, spread=100,
                               dtype=np.float32, seed=seed)
    fn, v2 = _v2_fn(a, g=4)
    assert v2.value_mode == "palette"
    x = generate.make_x(a.n, np.float32, kind="normal", seed=seed)
    y = np.asarray(fn(x))
    g = spmv_golden(a.astype(np.float64), x.astype(np.float64))
    np.testing.assert_allclose(y, g, rtol=2e-5, atol=1e-5)


def test_v2_bf16_mode():
    a = generate.clustered(400, 400, 8, spread=150, dtype=np.float32, seed=5)
    # 200 distinct bf16-exact values -> no palette, lossless bf16
    rng = np.random.default_rng(5)
    vals = (rng.integers(1, 200, size=a.nnz) * 0.5).astype(np.float32)
    a = CsrMatrix(a.m, a.n, a.rowptr, a.colidx, vals)
    fn, v2 = _v2_fn(a, g=4)
    assert v2.value_mode == "bf16"
    x = generate.make_x(a.n, np.float32, kind="normal", seed=6)
    np.testing.assert_allclose(
        np.asarray(fn(x)),
        spmv_golden(a.astype(np.float64), x.astype(np.float64)),
        rtol=2e-5, atol=1e-4)


def test_v2_f32_mode():
    a = generate.clustered(400, 400, 8, spread=150, dtype=np.float32,
                           seed=7, exact=False)
    fn, v2 = _v2_fn(a, g=4)
    assert v2.value_mode == "f32"
    x = generate.make_x(a.n, np.float32, kind="normal", seed=8)
    np.testing.assert_allclose(
        np.asarray(fn(x)),
        spmv_golden(a.astype(np.float64), x.astype(np.float64)),
        rtol=2e-5, atol=1e-4)


def test_v2_empty_rows_and_g_padding():
    a = generate.with_empty_rows(
        generate.clustered(700, 700, 9, spread=120, dtype=np.float32,
                           seed=9), 0.4, seed=10)
    fn, v2 = _v2_fn(a, g=8)
    x = generate.make_x(a.n, np.float32, kind="normal", seed=11)
    np.testing.assert_allclose(
        np.asarray(fn(x)),
        spmv_golden(a.astype(np.float64), x.astype(np.float64)),
        rtol=2e-5, atol=1e-5)
