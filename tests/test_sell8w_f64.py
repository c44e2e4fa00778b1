"""Double-float (f64) SELL-8W v2 kernel — correctness + accuracy.

The f64 Pallas tier (VERDICT round-1 item 3): values/x/accumulators are
(hi, lo) f32 pairs with error-free transforms (Dekker/Knuth).

IMPORTANT tolerance caveat: XLA:CPU (= interpret mode, these tests)
algebraically simplifies EFT patterns, collapsing the compensation terms to
f32-grade accuracy (~1e-7).  The REAL Mosaic kernel preserves IEEE order —
measured ON-CHIP at palette_df exact / df 1.8e-12 / clustered100k 5.7e-14
max-rel (baselines/validate_df_onchip.py, 2026-08-17).  These CPU tests
therefore assert structure + f32-level bounds; the tight bound is asserted
by the on-chip validator.
"""

import numpy as np

from spmv_tpu.formats.sell8w import pack_sell8w, plan_v2
from spmv_tpu.io import generate
from spmv_tpu.oracle import spmv_golden
from spmv_tpu.types import CsrMatrix


def _df_fn(a64, g=4, force=None):
    from spmv_tpu.ops.pallas_sell import build_sell8w_v2_fn
    hi = pack_sell8w(a64)
    hi_back = a64.vals.astype(np.float32).astype(np.float64)
    lo = pack_sell8w(CsrMatrix(a64.m, a64.n, a64.rowptr, a64.colidx,
                               (a64.vals - hi_back).astype(np.float32)))
    v2 = plan_v2(hi, g=g, lo_tiles=lo.vals, force_value_mode=force)
    return build_sell8w_v2_fn(v2, interpret=True), v2


def test_df16_is_default_f64_mode():
    a = generate.clustered(500, 500, 8, spread=150, dtype=np.float64,
                           seed=1, exact=False)
    fn, v2 = _df_fn(a)
    assert v2.value_mode == "df16"
    assert v2.vals_lo is not None and v2.vals_lo.dtype == np.int16
    import jax
    jax.config.update("jax_enable_x64", True)
    x = generate.make_x(a.n, np.float64, kind="normal", seed=2)
    y = np.asarray(fn(x))
    assert y.dtype == np.float64
    g = spmv_golden(a, x)
    rel = np.abs(y - g).max() / np.abs(g).max()
    assert rel < 2e-6    # interpret-mode bound; on-chip bound is ~1e-11


def test_df_mode_forced_full_lo_plane():
    a = generate.clustered(500, 500, 8, spread=150, dtype=np.float64,
                           seed=1, exact=False)
    fn, v2 = _df_fn(a, force="df")
    assert v2.value_mode == "df" and v2.vals_lo.dtype == np.float32
    import jax
    jax.config.update("jax_enable_x64", True)
    x = generate.make_x(a.n, np.float64, kind="normal", seed=2)
    y = np.asarray(fn(x))
    g = spmv_golden(a, x)
    rel = np.abs(y - g).max() / np.abs(g).max()
    assert rel < 2e-6    # interpret-mode bound; on-chip bound is 1e-12


def test_df16_codec_roundtrip_accuracy():
    """Pure-numpy codec bound (no interpret-mode EFT collapse): decoded
    hi+lo must carry ≥ ~40 mantissa bits across 12 orders of magnitude."""
    from spmv_tpu.formats.sell8w import df16_encode_lo, df16_safe
    rng = np.random.default_rng(7)
    v = rng.standard_normal(200_000) * np.exp(
        rng.uniform(-15, 15, size=200_000))
    vh = v.astype(np.float32)
    q = df16_encode_lo(vh, v - vh.astype(np.float64))
    pulse = (vh.view(np.int32) & 0x7F800000).view(np.float32)
    dec = q.astype(np.float32) * (pulse * np.float32(2.0 ** -39))
    rel = np.abs(vh.astype(np.float64) + dec - v) / np.abs(v)
    assert rel.max() < 2.0 ** -39
    assert df16_safe(v)
    assert not df16_safe(np.array([1.0, 2.0 ** -120]))
    assert not df16_safe(np.array([1.0, np.inf]))


def test_palette_df_mode():
    a = generate.clustered(400, 400, 6, spread=120, dtype=np.float64,
                           seed=3)                     # exact k/8 values
    fn, v2 = _df_fn(a)
    assert v2.value_mode == "palette_df"
    x = generate.make_x(a.n, np.float64, kind="normal", seed=4)
    y = np.asarray(fn(x))
    g = spmv_golden(a, x)
    rel = np.abs(y - g).max() / max(np.abs(g).max(), 1e-30)
    assert rel < 2e-6    # interpret-mode bound; on-chip: exact (0.0)


def test_df_large_magnitude_spread():
    """hi/lo split must survive values spanning many orders of magnitude."""
    rng = np.random.default_rng(5)
    a = generate.clustered(300, 300, 6, spread=100, dtype=np.float64,
                           seed=5, exact=False)
    vals = a.vals * np.exp(rng.uniform(-20, 20, size=a.nnz))
    a = CsrMatrix(a.m, a.n, a.rowptr, a.colidx, vals)
    fn, v2 = _df_fn(a)
    x = generate.make_x(a.n, np.float64, kind="normal", seed=6)
    y = np.asarray(fn(x))
    g = spmv_golden(a, x)
    denom = np.maximum(np.abs(g), np.abs(g).max() * 1e-8)
    assert (np.abs(y - g) / denom).max() < 2e-5  # interpret bound; chip ~1e-12
