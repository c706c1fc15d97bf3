"""bench.py driver-artifact contract (round-9 verdict #1).

The driver captures the LAST 2000 chars of bench.py's stdout and
json-parses them. Round 8 shipped a final line longer than that and
the round's headline arrived truncated (BENCH_r08.json parsed:null).
These tests pin the compact-line budget with a worst-case payload so
the failure mode is a loud assertion at bench time, never a silent
parsed:null in the driver artifact.
"""

from __future__ import annotations

import json

import pytest

import bench


def _worst_case_payload() -> dict:
    # every query at a 4-digit-seconds value (xxx.xxx) — wider than any
    # plausible real record; paired per-query maps at full width too
    queries = {k: 999.999 for k in bench.HEADLINE}
    return {
        "metric": "headline_total_spark",
        "value": 99999.999,
        "unit": "sec",
        "queries": queries,
        "sf": 256.0,
        "protocol": "interleaved_v2",
        "at_scale": True,
        "calibration": {
            "null_job_sec": 999.9999,
            "jvm_probe_sec": 999.9999,
            "null_job_sec_post": 999.9999,
            "jvm_probe_sec_post": 999.9999,
            "null_job_interspersed_sec": 999.9999,
            "null_job_interspersed_n": 28,
            "spark_total_over_null_job": 99999.9,
        },
        "paired": {
            "pandas_total": 99999.999,
            "duckdb_total": 99999.999,
            "spark_total_on_pandas_subset": 99999.999,
            "spark_total_on_duckdb_subset": 99999.999,
            "ratio_vs_pandas": 999.999,
            "ratio_vs_duckdb": 999.999,
            "pandas": dict(queries),
            "duckdb": dict(queries),
        },
        "regression_rule": "x" * 300,
    }


def test_compact_line_fits_driver_tail_capture():
    line = bench.compact_line(_worst_case_payload(), "BENCH_full_sf256full.json")
    assert len(line) <= 1900, len(line)
    parsed = json.loads(line)
    # contract fields the driver reads
    for k in ("metric", "value", "unit", "queries", "sf"):
        assert k in parsed, k
    assert len(parsed["queries"]) == len(bench.HEADLINE)
    # the r8 bloat sources must be gone from the printed line
    assert "pandas" not in parsed["paired"]
    assert "duckdb" not in parsed["paired"]
    assert "regression_rule" not in parsed
    # and the full record pointer must survive
    assert parsed["full_record"] == "BENCH_full_sf256full.json"
    # the ratios the M7 rule gates on must be ON the line
    assert "ratio_vs_pandas" in parsed["paired"]
    assert "ratio_vs_duckdb" in parsed["paired"]
    assert "spark_total_over_null_job" in parsed["calibration"]


def test_compact_line_overflow_is_loud():
    payload = _worst_case_payload()
    payload["queries"] = {f"q{i}_padding_padding_padding": 1.0 for i in range(200)}
    with pytest.raises(AssertionError):
        bench.compact_line(payload, "BENCH_full_sf0.1.json")


def test_at_scale_duck_subset_is_headline_subset():
    assert set(bench.AT_SCALE_DUCK) <= set(bench.HEADLINE)
