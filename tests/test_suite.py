"""Bench-suite harness tests (CPU, small matrices)."""

import io as _io

import numpy as np

from spmv_tpu.bench import suite
from spmv_tpu.types import Method


def test_bench_matrix_csv_schema():
    from spmv_tpu.io import generate
    a = generate.banded(200, 200, 2, dtype=np.float32)
    buf = _io.StringIO()
    rows = suite.bench_matrix("t", a, [Method.SERIAL, Method.DIA],
                              iters=2, repeats=1, out=buf)
    assert len(rows) == 2
    for row in rows:
        fields = row.split(",")
        assert len(fields) == 10                       # reference schema
        assert fields[0] == "t"
        assert float(fields[5]) < 1e-5                 # rmse
        assert int(fields[4]) == a.nnz


def test_load_any_builtin():
    name, a = suite.load_any("builtin:uniform10k")
    assert name == "uniform10k" and a.m == 10_000


def test_bench_matrix_accepts_rect():
    """Round-2: rect matrices time via the scalar-feedback chain
    (timing.time_spmv_chain) — no square-only restriction left."""
    from spmv_tpu.io import generate
    a = generate.random_uniform(50, 70, 4)
    rows = suite.bench_matrix("r", a, [Method.SERIAL], iters=1, repeats=1,
                              out=__import__("io").StringIO())
    assert len(rows) == 1
