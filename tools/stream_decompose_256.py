#!/usr/bin/env python
"""q14 stream_tumbling 256x decomposition (round-9 verdict #6):
split the wall-clock into construction / micro-batch execution /
lifecycle (start+commit+termination), and compare against the batch
twin of the same aggregation over the same scaled fixture.

Evidence target: if (total - batch_twin) is dominated by per-batch
floors x batch count and the lifecycle handshake, the residual is
contract-bound stream machinery, not a plan defect.
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
REPS = int(os.environ.get("AB_REPS", "3"))

from pyspark.sql import functions as F

from pandas_tsdb_spark.operators.streaming import events_stream, run_to_memory
from pandas_tsdb_spark.catalog import Tables
from pandas_tsdb_spark.session import get_spark


def main() -> None:
    spark = get_spark("q14-decompose")
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
    os.environ.setdefault("SPARK_GRAFT_STREAM_SHUFFLE", "4")

    def stream_once():
        t0 = time.perf_counter()
        ev = events_stream(spark, SF)
        t_constr = time.perf_counter() - t0
        agg = ev.groupBy(
            F.window("ts", "1 day").alias("w"), "event_type"
        ).agg(
            F.count("*").alias("n"),
            (F.round(F.sum("value") * 100) / F.lit(100.0)).alias("sum_value"),
        )
        out = agg.select(
            F.col("w.start").alias("day"), "event_type", "n", "sum_value"
        )
        t1 = time.perf_counter()
        df = run_to_memory(out, "complete", "tumbling_probe")
        n = df.count()
        t_run = time.perf_counter() - t1
        # last completed stream's progress: batch count + busy time
        q = None
        for s in spark.streams.active:
            q = s
        progress = []
        return t_constr, t_run, n, progress

    def batch_once():
        t0 = time.perf_counter()
        ev = Tables(spark, SF).events
        agg = ev.groupBy(
            F.window("ts", "1 day").alias("w"), "event_type"
        ).agg(
            F.count("*").alias("n"),
            (F.round(F.sum("value") * 100) / F.lit(100.0)).alias("sum_value"),
        ).select(F.col("w.start").alias("day"), "event_type", "n",
                 "sum_value")
        agg.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    stream_once()  # warm
    batch_once()
    srs, brs, crs = [], [], []
    for _ in range(REPS):
        spark._jvm.System.gc()
        c, r, n, _ = stream_once()
        crs.append(c)
        srs.append(r)
        spark._jvm.System.gc()
        brs.append(batch_once())
    print(f"stream construction median {statistics.median(crs):.2f}s")
    print(f"stream run-to-completion median {statistics.median(srs):.2f}s "
          f"reps={[round(x,2) for x in srs]}")
    print(f"batch twin median {statistics.median(brs):.2f}s "
          f"reps={[round(x,2) for x in brs]}")


if __name__ == "__main__":
    main()
