#!/usr/bin/env python
"""q20 sink_partition_prune 256x layout A/B (round-9 verdict #5):
registered one-writer-per-day layout vs salted k-writers-per-day.

Also prints the produced layout (files per day dir, sizes) so the
file-sizing claim is checked against actual bytes, not guessed.
"""

from __future__ import annotations

import os
import statistics
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/tmp/sf256full")
REPS = int(os.environ.get("AB_REPS", "4"))
SALT = int(os.environ.get("AB_SALT", "4"))

from pyspark.sql import functions as F

from pandas_tsdb_spark.catalog import Tables
from pandas_tsdb_spark.session import get_spark


def build(spark, sf_dir, salt):
    ev = Tables(spark, sf_dir).events
    path = tempfile.mkdtemp(prefix="pts_ab20_") + "/events_by_day"
    dated = ev.withColumn("event_date", F.to_date("ts"))
    if salt <= 1:
        part = dated.repartition("event_date")
    else:
        part = dated.repartition(
            "event_date", F.pmod(F.col("event_id"), F.lit(salt))
        )
    part.write.mode("overwrite").partitionBy("event_date").parquet(path)
    back = spark.read.schema(dated.schema).parquet(path)
    out = (
        back.filter(F.col("event_date").between("2024-01-10", "2024-01-12"))
        .groupBy(
            F.col("event_date").cast("timestamp").alias("event_date"),
            "event_type",
        )
        .agg(F.count("*").alias("n"),
             F.round(F.sum("value"), 4).alias("total"))
    )
    out.write.format("noop").mode("overwrite").save()
    return path


def layout(path):
    days = sorted(os.listdir(path))
    sizes = []
    nfiles = 0
    for d in days:
        if not d.startswith("event_date="):
            continue
        fs = [f for f in os.listdir(os.path.join(path, d))
              if f.endswith(".parquet")]
        nfiles += len(fs)
        sizes += [os.path.getsize(os.path.join(path, d, f)) / 1e6
                  for f in fs]
    return (f"{len([d for d in days if d.startswith('event_date=')])} day "
            f"dirs, {nfiles} files, file MB min/med/max = "
            f"{min(sizes):.1f}/{statistics.median(sizes):.1f}/"
            f"{max(sizes):.1f}")


def main() -> None:
    spark = get_spark("ab-q20")
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
    import shutil

    for tag, salt in (("salt1", 1), (f"salt{SALT}", SALT)):  # warm
        p = build(spark, SF, salt)
        print(f"layout {tag}: {layout(p)}")
        shutil.rmtree(os.path.dirname(p), ignore_errors=True)
    samples = {"salt1": [], f"salt{SALT}": []}
    for _ in range(REPS):
        for tag, salt in (("salt1", 1), (f"salt{SALT}", SALT)):
            spark._jvm.System.gc()
            t0 = time.perf_counter()
            p = build(spark, SF, salt)
            samples[tag].append(time.perf_counter() - t0)
            shutil.rmtree(os.path.dirname(p), ignore_errors=True)
    for tag, vals in samples.items():
        print(f"{tag}: median {statistics.median(vals):.2f}s "
              f"reps={[round(x, 2) for x in vals]}")


if __name__ == "__main__":
    main()
