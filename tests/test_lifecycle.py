"""Handle lifecycle + config-knob semantics (reference parity).

clear → re-prep → destroy mirrors common.c:31-41 + :161-188; nthreads and
VectorizedWay.MXU are honored (no accepted-but-ignored knobs — the dead
VECTOR_AVX512 lesson from SURVEY.md §2.3).
"""

import numpy as np
import pytest

from spmv_tpu import create_handle, spmv, Method
from spmv_tpu.handle import (spmv_clear_handle, spmv_destory_handle,
                             _tile_for)
from spmv_tpu.io import generate
from spmv_tpu.oracle import spmv_golden
from spmv_tpu.types import VectorizedWay


def test_clear_then_prepare_reuses_handle():
    a = generate.random_uniform(200, 200, 6, dtype=np.float64, seed=0)
    x = generate.make_x(a.n, np.float64, kind="normal", seed=1)
    g = spmv_golden(a, x)
    h = create_handle(a, method=Method.SERIAL)
    y0 = np.asarray(spmv(h, x))
    spmv_clear_handle(h)
    assert h.plan == {}
    with pytest.raises(RuntimeError):
        spmv(h, x)
    # re-prep with a different method on the same handle (reference flow)
    h.prepare(Method.BALANCED)
    assert h.method == Method.BALANCED
    y1 = np.asarray(spmv(h, x))
    np.testing.assert_allclose(y0, g, rtol=1e-10)
    np.testing.assert_allclose(y1, g, rtol=1e-8)


def test_prepare_preserves_reorder_contract():
    a = generate.banded(300, 300, 5, dtype=np.float64, seed=2)
    x = generate.make_x(a.n, np.float64, kind="normal", seed=3)
    g = spmv_golden(a, x)
    h = create_handle(a, method=Method.SERIAL, reorder="rcm")
    np.testing.assert_allclose(np.asarray(spmv(h, x)), g, rtol=1e-10)
    h.clear()
    h.prepare(Method.BALANCED_YID)
    np.testing.assert_allclose(np.asarray(spmv(h, x)), g, rtol=1e-8)


def test_destroy_ends_lifecycle():
    a = generate.banded(50, 50, 2)
    h = create_handle(a, method=Method.SERIAL)
    spmv_destory_handle(h)   # the reference's spelling
    with pytest.raises(RuntimeError):
        spmv(h, np.ones(a.n))
    with pytest.raises(RuntimeError):
        h.prepare(Method.SERIAL)


def test_nthreads_shapes_the_plan():
    """nthreads guarantees at least that many equal-nnz tiles (the
    reference's ceil(nnz/T) stride contract, parallel_balanced_spmv.c:41)."""
    nnz = 40_000
    t_default = _tile_for(nnz, 0, Method.BALANCED)
    t_wide = _tile_for(nnz, 128, Method.BALANCED)
    assert nnz // t_wide >= 128
    assert t_wide < t_default  # the knob actually changed the plan
    # and the plan built with it stays correct
    a = generate.random_uniform(400, 400, 100, dtype=np.float64, seed=4)
    x = generate.make_x(a.n, np.float64, kind="normal", seed=5)
    h = create_handle(a, method=Method.BALANCED, nthreads=128)
    np.testing.assert_allclose(np.asarray(spmv(h, x)), spmv_golden(a, x),
                               rtol=1e-8)


def test_mxu_knob_selects_bcsr_on_blocky():
    a = generate.block_random(4, 4, blocks_per_row=2, fill=0.5,
                              dtype=np.float32, seed=6)
    h = create_handle(a, method=Method.PARALLEL,
                      vectorized=VectorizedWay.MXU)
    assert h.method == Method.BCSR            # MXU routed to the MXU plan
    assert h.requested_method == Method.PARALLEL
    x = generate.make_x(a.n, np.float32, kind="normal", seed=7)
    np.testing.assert_allclose(np.asarray(spmv(h, x)),
                               spmv_golden(a.astype(np.float64),
                                           x.astype(np.float64)),
                               rtol=2e-5, atol=1e-5)


def test_mxu_knob_falls_through_on_scattered():
    a = generate.random_uniform(600, 600, 4, dtype=np.float32, seed=8)
    h = create_handle(a, method=Method.PARALLEL,
                      vectorized=VectorizedWay.MXU)
    assert h.method == Method.PARALLEL        # no block structure: unchanged
