#!/usr/bin/env python
"""Composition correctness AT SCALE: fuzz pipelines x layout A/B.

tests/test_compose_fuzz.py proves the engine agrees with DuckDB on
seeded random operator pipelines at sf0.01/sf0.1. This tool carries the
same generated pipelines to the scaled fixtures (256x = 153.6M-row
lineitem), where no oracle engine can follow, and verifies them the
same way the 614M-row lineitem family was verified (BASELINE.md
round-7): each pipeline executes under two deliberately different
physical layouts —

  A: 128 MB splits / 32 shuffle partitions / AQE on
  B: 16 MB splits / 157 shuffle partitions / AQE off

— and is digested ORDER-INDEPENDENTLY (count(*) plus
sum(xxhash64(to_json(struct(*)))) in decimal(38,0)). Equal digests mean
every row's every value is identical under both task layouts,
partial-agg merge orders, and plan choices. Because the digest is an
aggregation, even ungrouped 150M-row pipeline outputs verify without
materializing to the driver.

Usage: python tools/compose_scale_ab.py [sf_dir] [n_seeds] [start]
e.g.   python tools/compose_scale_ab.py /tmp/sf256full 12
       python tools/compose_scale_ab.py /tmp/sf256full 12 12  # seeds 12..23
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from pandas_tsdb_spark.session import get_spark  # noqa: E402
from tests.test_compose_fuzz import build_pipeline  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf256full"
N_SEEDS = int(sys.argv[2]) if len(sys.argv) > 2 else 12
START = int(sys.argv[3]) if len(sys.argv) > 3 else 0

LAYOUTS = {
    "A": {
        "spark.sql.files.maxPartitionBytes": "134217728",
        "spark.sql.shuffle.partitions": "32",
        "spark.sql.adaptive.enabled": "true",
    },
    "B": {
        "spark.sql.files.maxPartitionBytes": "16777216",
        "spark.sql.shuffle.partitions": "157",
        "spark.sql.adaptive.enabled": "false",
    },
}


def digest(df):
    """(rows, sum-of-row-hashes) — order-independent whole-row digest
    (same construction as tools/lineitem_1024_selfcheck.py)."""
    row = df.select(
        F.xxhash64(F.to_json(F.struct(*df.columns))).alias("h")
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.col("h").cast("decimal(38,0)")).alias("s"),
    ).collect()[0]
    return int(row.n), int(row.s if row.s is not None else 0)


def main() -> int:
    spark = get_spark("compose-scale-ab")
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    print("| seed | rows | digests equal | A s | B s |")
    print("| --- | --- | --- | --- | --- |")
    for seed in range(START, START + N_SEEDS):
        res = {}
        for lname, confs in LAYOUTS.items():
            for k, v in confs.items():
                spark.conf.set(k, v)
            spark._jvm.System.gc()
            t0 = time.perf_counter()
            rel = build_pipeline(spark, seed, SF_DIR)
            n, s = digest(rel.df)
            res[lname] = (n, s, time.perf_counter() - t0)
        eq = res["A"][:2] == res["B"][:2]
        out[seed] = {
            "rows": res["A"][0],
            "digest": str(res["A"][1]),
            "equal": eq,
            "a_sec": round(res["A"][2], 2),
            "b_sec": round(res["B"][2], 2),
        }
        print(
            f"| {seed} | {res['A'][0]:,} | "
            f"{'YES' if eq else '** NO **'} | "
            f"{res['A'][2]:.1f} | {res['B'][2]:.1f} |"
        )
    n_eq = sum(1 for v in out.values() if v["equal"])
    print(json.dumps({"sf_dir": SF_DIR, "equal": n_eq, "total": len(out)}))
    return 0 if n_eq == len(out) else 1


if __name__ == "__main__":
    sys.exit(main())
