#!/usr/bin/env python
"""Capture the POST-EXECUTION (AQE-final) formatted plan per headline
query. The *_before.txt plans are pre-execution (isFinalPlan=false), so
they cannot show AQE's runtime stage reuse — a duplicated subtree in the
initial plan may or may not actually run twice. This tool executes each
query through the noop sink, then prints explain("formatted"), which for
an executed AQE plan includes the final plan with ReusedExchange /
ReusedQueryStage / AQEShuffleRead markers.

Usage: python tools/final_plans.py [label ...]   (default: all headline)
Writes plans/r09/<label>_final.txt
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r09"
)


def main() -> None:
    from bench import HEADLINE, _size_shuffle_to_data
    from pandas_tsdb_spark.registry import load_all
    from pandas_tsdb_spark.session import get_spark

    spark = get_spark("final-plans")
    spark.sparkContext.setLogLevel("ERROR")
    _size_shuffle_to_data(spark)
    specs = load_all()
    only = set(sys.argv[1:])
    for label, key in HEADLINE.items():
        if only and label not in only and key not in only:
            continue
        df = specs[key].builder(spark, SF_DIR)
        spark.sparkContext.setJobDescription(f"final_plan:{label}")
        # Execute the df's OWN QueryExecution (a noop write builds a new
        # one whose final plan explain() cannot see): toRdd().count()
        # runs entirely JVM-side and finalizes the AdaptiveSparkPlan.
        df._jdf.queryExecution().toRdd().count()
        spark.sparkContext.setJobDescription(None)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        text = buf.getvalue()
        out = os.path.join(OUT_DIR, f"{label}_final.txt")
        with open(out, "w") as f:
            f.write(f"# {label} ({key}) @ {SF_DIR} — post-execution final plan\n")
            f.write(text)
        n_reuse = text.count("ReusedExchange") + text.count("ReusedQueryStage")
        n_scan = text.count("Scan parquet")
        n_exch = text.count("(\n") if False else text.count("+- Exchange") + text.count(":- Exchange")
        print(f"{label:24s} scans {n_scan:2d}  reused {n_reuse:2d}  -> {out}")


if __name__ == "__main__":
    main()
