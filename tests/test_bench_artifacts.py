"""Regression tests for bench.py's artifact machinery — pure Python, no
Spark. The grading driver records only the last 2000 chars of bench
stdout, so the loader must survive truncated prior artifacts and the
emitter must keep its line under the window (BENCH_r06 lost its parse
to exactly this)."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _load_prev_artifact


def _write(tmp_path, name, payload):
    with open(os.path.join(tmp_path, name), "w") as f:
        json.dump(payload, f)


def test_loads_newest_parsed_artifact(tmp_path):
    _write(tmp_path, "BENCH_r01.json", {"parsed": {"value": 1.0, "queries": {"a": 1.0}}})
    _write(tmp_path, "BENCH_r02.json", {"parsed": {"value": 2.0, "queries": {"a": 2.0}}})
    rec, name = _load_prev_artifact(str(tmp_path))
    assert name == "BENCH_r02.json"
    assert rec["value"] == 2.0


def test_reconstructs_truncated_tail_like_r06(tmp_path):
    # the r6 failure mode: the JSON line outgrew the 2000-char tail and
    # lost exactly its '{"metric": "' prefix; parsed came back null
    full = {
        "metric": "headline_suite_total",
        "value": 9.86,
        "queries": {"orders_by_status": 1.34},
        "context": {"calib_spin_ms": 122.5},
    }
    line = json.dumps(full)
    assert line.startswith('{"metric": "')
    _write(
        tmp_path,
        "BENCH_r06.json",
        {"n": 6, "rc": 0, "parsed": None, "tail": line[len('{"metric": "'):]},
    )
    rec, name = _load_prev_artifact(str(tmp_path))
    assert name == "BENCH_r06.json"
    assert rec["value"] == 9.86
    assert rec["context"]["calib_spin_ms"] == 122.5


def test_unusable_newest_falls_back_to_older(tmp_path):
    _write(tmp_path, "BENCH_r01.json", {"parsed": {"value": 1.0, "queries": {}}})
    # newest: no parse, tail is garbage that no prefix completion fixes
    _write(
        tmp_path,
        "BENCH_r02.json",
        {"n": 2, "rc": 1, "parsed": None, "tail": "Traceback (most recent...)"},
    )
    rec, name = _load_prev_artifact(str(tmp_path))
    assert name == "BENCH_r01.json"
    assert rec["value"] == 1.0


def test_no_artifacts_returns_none(tmp_path):
    rec, name = _load_prev_artifact(str(tmp_path))
    assert rec is None and name is None


def test_bare_bench_record_is_accepted(tmp_path):
    # a non-driver-wrapped record (e.g. a dev run saved by hand)
    _write(tmp_path, "BENCH_r03.json", {"value": 4.2, "queries": {"q": 4.2}})
    rec, name = _load_prev_artifact(str(tmp_path))
    assert name == "BENCH_r03.json"
    assert rec["value"] == 4.2
