"""Double-float Pallas DIA (the f64 banded tier, VERDICT round-2 item 2).

Interpret mode: XLA:CPU simplifies the error-free transforms, so assert
f32-level accuracy only; the tight bound is validated on hardware
(baselines/validate_f64_dia_onchip.py).
"""

import numpy as np

from spmv_tpu.types import CsrMatrix
from spmv_tpu.io import generate
from spmv_tpu.oracle import spmv_golden
from spmv_tpu.formats.dia import pack_dia
from spmv_tpu.ops.pallas_dia import (build_dia_fn_from_parts, prepare_dia,
                                     MAX_N_DF)


def _banded_f64(m=6000, bw=4, seed=3):
    a32 = generate.banded(m, m, bw, dtype=np.float32, seed=seed)
    rng = np.random.default_rng(7)
    return CsrMatrix(a32.m, a32.n, a32.rowptr, a32.colidx,
                     rng.standard_normal(a32.nnz))


def test_dia_df_interpret():
    a = _banded_f64()
    parts = prepare_dia(pack_dia(a))
    assert "data3_lo" in parts
    fn = build_dia_fn_from_parts(parts, interpret=True)
    x = np.random.default_rng(0).standard_normal(a.n)
    y = np.asarray(fn(x))
    assert y.dtype == np.float64
    g = spmv_golden(a, x)
    assert np.abs(y - g).max() / np.abs(g).max() < 2e-6


def test_dia_df_rect_offsets():
    # negative and positive offsets, rectangular-ish band placement
    a = _banded_f64(m=3000, bw=7, seed=9)
    parts = prepare_dia(pack_dia(a))
    fn = build_dia_fn_from_parts(parts, interpret=True)
    x = np.random.default_rng(1).standard_normal(a.n)
    y = np.asarray(fn(x))
    g = spmv_golden(a, x)
    assert np.abs(y - g).max() / np.abs(g).max() < 2e-6


def test_dia_df_envelope_gate():
    import pytest
    a = _banded_f64(m=2000)
    d = pack_dia(a)
    big = type(d)(m=MAX_N_DF + 1024, n=MAX_N_DF + 1024,
                  nnz_stored=d.nnz_stored, offsets=d.offsets, data=d.data)
    with pytest.raises(ValueError, match="VMEM"):
        prepare_dia(big)


def test_handle_routes_f64_dia(monkeypatch):
    import spmv_tpu.handle as handle_mod
    monkeypatch.setattr(handle_mod, "_is_tpu", lambda: True)
    from spmv_tpu.handle import create_handle
    from spmv_tpu.types import Method
    a = _banded_f64(m=20_000)
    h = create_handle(a, method=Method.DIA)
    assert "dia_pallas" in h.plan
    assert "data3_lo" in h.plan["dia_pallas"]
