"""SparkSession factory + per-session conf guard.

Two entry paths exist:

1. We own the session (tests, bench.py): ``get_spark()`` builds one with
   the §4 physical defaults (AQE, Arrow, UTC, small shuffle partition
   count for local scales).
2. The driver owns the session (``__spark_entry__.entry/queries``): we
   cannot rebuild it, so every plan builder calls ``ensure_conf(spark)``
   which pins the *runtime-settable* confs the plans depend on:

   - ``spark.sql.session.timeZone=UTC`` — date/time extraction must not
     depend on the host zone (oracle runs in naive/UTC DuckDB).
   - ``spark.sql.legacy.parquet.nanosAsLong=true`` — events.ts is
     INT64 TIMESTAMP(NANOS,false), an *illegal* parquet type for Spark 4
     otherwise; with this conf it reads as bigint nanoseconds and
     catalog.py converts with integer ``div`` (never ``/1000`` — double
     rounding at 1.7e18 ns loses microseconds).
   - ``spark.sql.parquet.inferTimestampNTZ.enabled=true`` — pin the
     default so date-like cols (o_orderdate, l_shipdate) always read as
     TIMESTAMP_NTZ, matching DuckDB's naive TIMESTAMP semantics
     independent of session zone.
   - Arrow on for every pandas interop path (applyInPandas kernels).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable confs every builder depends on (see module docstring).
RUNTIME_CONFS: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.parquet.inferTimestampNTZ.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
}


def ensure_conf(spark: SparkSession) -> SparkSession:
    """Idempotently pin runtime confs on a session we did not build."""
    for k, v in RUNTIME_CONFS.items():
        try:
            if spark.conf.get(k, None) != v:
                spark.conf.set(k, v)
        except Exception:
            # Non-settable in this deployment — plans degrade gracefully.
            pass
    return spark


def get_spark(app_name: str = "pandas-tsdb-spark") -> SparkSession:
    """Build the local bench/test session.

    Shuffle partitions default to the core count (not 200): at bench
    scale (sf0.1, ~600k-row lineitem) 200 partitions are pure scheduling
    overhead; on a real cluster this knob is surfaced via
    SPARK_GRAFT_SHUFFLE_PARTITIONS and AQE coalesces at runtime anyway.
    """
    # Make the vendored protobuf visible to this session's python
    # workers (un-gates transformWithStateInPandas; see protobuf_shim).
    # Must run BEFORE the JVM launches — workers inherit the JVM env.
    try:
        from pandas_tsdb_spark.protobuf_shim import ensure_env

        ensure_env()
    except Exception:
        pass
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    shuffle = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
        # v2 file-output committer: task outputs move to the destination
        # at TASK commit (one rename pass, no job-commit second pass) and
        # no _SUCCESS marker. Interleaved A/B on the partitioned-write
        # query (tools/ab_floor.py q20, 9 reps): v1 median 0.759 s vs v2
        # 0.681 s. Safe here because every engine write path lands in a
        # fresh or dot-prefixed staging dir swept/journaled by the
        # caller (TsStore) or a throwaway tmp dir (sink ops), so v2's
        # partial-visibility-on-job-failure caveat cannot corrupt a
        # reader. Driver-owned sessions are NOT touched (ensure_conf
        # leaves committer choice to the deployment).
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
        .config("spark.hadoop.mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return ensure_conf(spark)
