#!/usr/bin/env python
"""q19 upsert_cdc 256x A/B: registered (2 window sorts + full outer
join) vs A (per-key argmax struct pair — one scan, one aggregate) vs
B (single 3-key window — one scan, one sort + tiny regroup).

Equality asserted against the registered output before timing.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/tmp/sf256full")
REPS = int(os.environ.get("AB_REPS", "5"))

from pandas_tsdb_spark.catalog import Tables
from pandas_tsdb_spark.registry import load_all
from pandas_tsdb_spark.session import get_spark


def variant_a(spark, sf_dir):
    v = Tables(spark, sf_dir).sql_views()
    return spark.sql(f"""
    WITH pair AS (
      SELECT user_id, event_type,
             max(CASE WHEN ts < TIMESTAMP '2024-01-25'
                      THEN named_struct('event_id', event_id,
                                        'value', value) END) AS b,
             max(CASE WHEN ts >= TIMESTAMP '2024-01-25'
                      THEN named_struct('event_id', event_id,
                                        'value', value) END) AS u
      FROM {v}events
      GROUP BY user_id, event_type
    )
    SELECT user_id, event_type,
           CASE WHEN u IS NOT NULL THEN u.value ELSE b.value END AS value,
           coalesce(u.event_id, b.event_id) AS src_event
    FROM pair
    """)


def variant_b(spark, sf_dir):
    v = Tables(spark, sf_dir).sql_views()
    return spark.sql(f"""
    WITH ranked AS (
      SELECT user_id, event_type, value, event_id,
             ts >= TIMESTAMP '2024-01-25' AS after,
             row_number() OVER (
                 PARTITION BY user_id, event_type,
                              ts >= TIMESTAMP '2024-01-25'
                 ORDER BY event_id DESC) AS rn
      FROM {v}events
    ),
    pair AS (
      SELECT user_id, event_type,
             max(CASE WHEN NOT after THEN named_struct(
                 'event_id', event_id, 'value', value) END) AS b,
             max(CASE WHEN after THEN named_struct(
                 'event_id', event_id, 'value', value) END) AS u
      FROM ranked WHERE rn = 1
      GROUP BY user_id, event_type
    )
    SELECT user_id, event_type,
           CASE WHEN u IS NOT NULL THEN u.value ELSE b.value END AS value,
           coalesce(u.event_id, b.event_id) AS src_event
    FROM pair
    """)


def main() -> None:
    spark = get_spark("ab-q19")
    spark.sparkContext.setLogLevel("ERROR")
    total = 0
    for dirpath, _d, fnames in os.walk(SF):
        for f in fnames:
            total += os.path.getsize(os.path.join(dirpath, f))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.conf.set(
        "spark.sql.shuffle.partitions",
        str(max(8, min(4 * cpus, total // (64 * 1024 * 1024) + 1))),
    )
    specs = load_all()
    reg = lambda s, d: specs["upsert_cdc"].builder(s, d)  # noqa: E731

    # equality check at sf0.01 AND the scaled fixture
    for chk in ("/root/testdata/sf0.01", SF):
        base = reg(spark, chk)
        for name, fn in (("A", variant_a), (
"B", variant_b)):
            got = fn(spark, chk)
            diff = base.exceptAll(got).count() + got.exceptAll(base).count()
            print(f"equality {name} @ {os.path.basename(chk)}: "
                  f"{'OK' if diff == 0 else f'DIFF {diff}'}")

    variants = {"registered": reg, "A_argmax": variant_a, "B_one_window": variant_b}

    def run(fn):
        t0 = time.perf_counter()
        fn(spark, SF).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    for name, fn in variants.items():  # warm fence
        spark._jvm.System.gc()
        run(fn)
    samples = {n: [] for n in variants}
    for _ in range(REPS):
        for name, fn in variants.items():
            spark._jvm.System.gc()
            spark.sparkContext.setJobDescription(f"q19 {name}")
            samples[name].append(run(fn))
    for name, vals in samples.items():
        print(f"{name}: median {statistics.median(vals):.2f}s "
              f"reps={[round(x, 2) for x in vals]}")


if __name__ == "__main__":
    main()
