"""Round-6 verdict item 4: interleaved A/B harness for the fixed-floor
queries (q14 stream state-store setup, q20 partitioned-write commit).

The round-5 hard-won fact: this container drifts ±25% within an hour,
so ISOLATED perf runs lie — only same-process interleaved A/Bs are
trustworthy. This tool alternates variant runs A,B,A,B,... in ONE
session and prints per-variant medians, so ambient drift hits both
variants equally.

Variants are expressed as (setup, teardown) conf toggles around the
registered builder — the builder code itself is shared, so an A/B win
here transfers 1:1 to bench.py once the winning conf is made default.

Usage: python tools/ab_floor.py <q14|q20|...> [reps=7]
"""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pandas_tsdb_spark.registry import load_all  # noqa: E402
from pandas_tsdb_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def _run(spark, specs, key):
    t0 = time.time()
    df = specs[key].builder(spark, SF_DIR)
    _noop(df)
    return time.time() - t0


def _hadoop_set(spark, k, v):
    spark.sparkContext._jsc.hadoopConfiguration().set(k, v)


def main() -> int:
    target = sys.argv[1] if len(sys.argv) > 1 else "q20"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 7
    spark = get_spark()
    specs = load_all()

    if target == "q20":
        key = "sink_partition_prune"

        def setup_a():  # current default committer (v1 + _SUCCESS)
            _hadoop_set(
                spark, "mapreduce.fileoutputcommitter.algorithm.version", "1"
            )
            _hadoop_set(
                spark, "mapreduce.fileoutputcommitter.marksuccessfuljobs", "true"
            )

        def setup_b():  # direct task commit, no success marker
            _hadoop_set(
                spark, "mapreduce.fileoutputcommitter.algorithm.version", "2"
            )
            _hadoop_set(
                spark, "mapreduce.fileoutputcommitter.marksuccessfuljobs", "false"
            )

        variants = {"v1_commit": setup_a, "v2_commit": setup_b}
    elif target == "q14":
        key = "stream_tumbling"
        import os

        def setup_a():
            os.environ["SPARK_GRAFT_STREAM_SHUFFLE"] = "4"
            spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "true")
            os.environ.pop("SPARK_GRAFT_STREAM_CKPT", None)

        def setup_b():
            os.environ["SPARK_GRAFT_STREAM_SHUFFLE"] = "4"
            spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
            os.environ["SPARK_GRAFT_STREAM_CKPT"] = "/dev/shm/sg_ckpt"

        variants = {"nodata_on_disk": setup_a, "nodata_off_shm": setup_b}
    else:
        key = target
        variants = {"default": lambda: None}

    # warm-up once per variant (discarded)
    times: dict[str, list[float]] = {k: [] for k in variants}
    for name, setup in variants.items():
        setup()
        _run(spark, specs, key)
    for i in range(reps):
        for name, setup in variants.items():
            setup()
            times[name].append(_run(spark, specs, key))
    for name, ts in times.items():
        print(
            f"{target} {name}: median={statistics.median(ts):.3f} "
            f"min={min(ts):.3f} all={[round(t, 3) for t in ts]}",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
