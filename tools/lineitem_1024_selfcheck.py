"""Round-7 verdict item 6: lineitem-family CORRECTNESS at the sixth
doubling (614.4M-row lineitem, /tmp/sf1024full), where no DuckDB oracle
can exist (the 1024x COPY peaked at 93 GB RSS and OOM'd — BASELINE.md).

Method: Spark-internal LAYOUT A/B self-consistency. Each query runs
twice under deliberately different physical executions of the same
logical plan —

  A: maxPartitionBytes=128m, shuffle.partitions=32,  AQE on
  B: maxPartitionBytes=16m,  shuffle.partitions=157, AQE off

— so scan split boundaries, task count, aggregation grouping order,
join strategy selection pressure, and partial-agg combining order all
differ. The result digest is ORDER-INDEPENDENT and collision-strong:

  count(*), sum(xxhash64(to_json(struct(*)))) as int128-ish (sum of
  64-bit hashes in a decimal(38,0) — commutes, overflows never)

Equal digests across A/B means every row's every value is identical
under both executions — the same class of evidence as the r5/r6
integer-sum differentials, generalized to whole rows. A bug that
depends on scan order, partial-agg order, partition count, or AQE
(exactly the classes that appear only at scale) would make the
digests diverge.

Usage: python tools/lineitem_1024_selfcheck.py [sf_dir=/tmp/sf1024full]
Prints a markdown table + one JSON line for BASELINE.md.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from pandas_tsdb_spark.registry import load_all  # noqa: E402
from pandas_tsdb_spark.session import get_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1024full"

QUERIES = {
    "q1_lineitem_agg": "agg_groupby",
    "q2_join_inner": "join_inner",
    "q3_join_broadcast": "join_broadcast",
    "q16_tpch_q6": "tpch_q6",
    "q19_upsert_cdc": "upsert_cdc",
    "q20_partition_prune": "sink_partition_prune",
}

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
    """(rows, sum-of-row-hashes) — order-independent whole-row digest.
    to_json canonicalizes every value (floats already rounded by the
    builders' oracle discipline); decimal(38) sum cannot overflow
    (2^63 * 10^9 rows < 10^28)."""
    row = df.select(
        F.xxhash64(F.to_json(F.struct(*df.columns))).alias("h")
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.col("h").cast("decimal(38,0)")).alias("s"),
    ).collect()[0]
    return int(row.n), int(row.s if row.s is not None else 0)


def main() -> int:
    spark = get_spark("lineitem-1024-selfcheck")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()
    out = {}
    print("| query | layout A digest | layout B digest | equal | A s | B s |")
    print("| --- | --- | --- | --- | --- | --- |")
    for label, key in QUERIES.items():
        res = {}
        for lname, confs in LAYOUTS.items():
            for k, v in confs.items():
                spark.conf.set(k, v)
            # a rewritten fixture cache or stale scan must never leak
            # across layouts — drop the per-session scan cache
            if hasattr(spark, "_pandas_tsdb_scan_cache"):
                spark._pandas_tsdb_scan_cache.clear()
            spark._jvm.System.gc()
            t0 = time.perf_counter()
            n, s = digest(specs[key].builder(spark, SF_DIR))
            res[lname] = (n, s, time.perf_counter() - t0)
        eq = res["A"][:2] == res["B"][:2]
        out[label] = {
            "rows": res["A"][0],
            "digest": str(res["A"][1]),
            "equal": eq,
            "a_sec": round(res["A"][2], 2),
            "b_sec": round(res["B"][2], 2),
        }
        print(
            f"| {label} | {res['A'][0]} rows / {res['A'][1]} | "
            f"{res['B'][0]} rows / {res['B'][1]} | "
            f"{'YES' if eq else '**NO**'} | {res['A'][2]:.1f} | "
            f"{res['B'][2]:.1f} |",
            flush=True,
        )
    print(json.dumps({"metric": "lineitem_1024_selfcheck", "sf_dir": SF_DIR,
                      "all_equal": all(v["equal"] for v in out.values()),
                      "queries": out}))
    return 0 if all(v["equal"] for v in out.values()) else 1


if __name__ == "__main__":
    raise SystemExit(main())
