"""The driver records only the last 2000 chars of bench.py's stdout and
parses the final line as JSON (round-4 VERDICT item 1: rounds 2-4 lost the
front of a single giant line — parsed:null, 3 of 9 families dropped).
These tests pin the fix: the compact line survives a 2000-char tail whole,
parses, and carries every family with the pack/transfer split."""
import importlib.util
import json
import os
import sys

import pytest


def _load_bench():
    root = os.path.join(os.path.dirname(__file__), "..")
    spec = importlib.util.spec_from_file_location(
        "bench_mod", os.path.join(root, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def bench():
    return _load_bench()


def _fake_configs(bench, fail=()):
    names = list(bench.REFS)
    configs = {}
    for name in names:
        ref_label, ref = bench.REFS[name]
        if name in fail:
            configs[name] = {"error": "Traceback (most recent call "
                                      "last)\n" + "x" * 400,
                             "ref_gflops": ref, "ref": ref_label}
            continue
        configs[name] = {
            "gflops": 123.45, "gflops_marginal": 234.56, "ms": 12.345,
            "sync_bubble_ms": 2.987, "nnz": 32_000_000,
            "method": "Method_SellCSigma", "value_mode": "palette_df",
            "predeal_ms": 75123.4, "pack_ms": 60123.4,
            "transfer_ms": 15000.0, "ref_gflops": ref, "ref": ref_label,
            "vs_ref": 12.34,
        }
    return names, configs


def test_compact_line_survives_tail(bench, tmp_path, capsys):
    names, configs = _fake_configs(bench)
    head = configs["banded4m"]
    line = bench.emit_records("banded4m", head, "tpu", names, configs,
                              out_dir=str(tmp_path))
    # widest realistic field values still fit the driver's tail window
    assert len(line) < 1900
    tail = line[-2000:]          # what the driver keeps
    rec = json.loads(tail)       # the whole line survived
    assert rec["vs_baseline"] == head["vs_ref"]
    assert set(rec["families"]) == set(names)   # ALL 9 families present
    for fam in rec["families"].values():
        assert {"g", "vr", "pk", "tx"} <= set(fam)
    # stdout is exactly the one line
    out = capsys.readouterr().out.strip().splitlines()
    assert out == [line]


def test_full_record_on_disk(bench, tmp_path):
    names, configs = _fake_configs(bench, fail=("webbase1m",))
    head = configs["banded4m"]
    line = bench.emit_records("banded4m", head, "tpu", names, configs,
                              out_dir=str(tmp_path))
    rec = json.loads(line)
    assert rec["families"]["webbase1m"] == {"e": 1}
    full = json.load(open(tmp_path / "bench_latest.json"))
    assert full["configs"]["uniform100k"]["pack_ms"] == 60123.4
    assert full["configs"]["uniform100k"]["transfer_ms"] == 15000.0
    assert "error" in full["configs"]["webbase1m"]
    assert "timing_protocol" in full


def test_compact_even_with_errors(bench, tmp_path, capsys):
    names, configs = _fake_configs(
        bench, fail=tuple(n for n in bench.REFS if n != "banded4m"))
    head = configs["banded4m"]
    line = bench.emit_records("banded4m", head, "tpu", names, configs,
                              out_dir=str(tmp_path))
    capsys.readouterr()
    assert len(line) < 1900
    json.loads(line[-2000:])
