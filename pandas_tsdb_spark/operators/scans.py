"""§2.1 scans / sources / sinks.

Scale notes: all reads are bare parquet scans (Catalyst keeps pushdown);
the sink writes partitioned parquet and returns the re-read — on a
cluster the same code writes to any Hadoop-compatible FS.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pandas_tsdb_spark.catalog import SCHEMAS, TABLE_NAMES, Tables
from pandas_tsdb_spark.registry import query


@query(
    "scan_parquet",
    oracle="SELECT * FROM lineitem",
)
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-fidelity parquet scan: every column, every row, no transform.

    Raw column values come straight from the parquet pages, so floats are
    bit-identical to the oracle's read of the same file — no rounding.
    """
    return Tables(spark, sf_dir).lineitem


@query(
    "scan_events_ts",
    oracle="""
    SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value
    FROM events
    """,
)
def scan_events_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events scan proving the ns->µs timestamp bridge (catalog.py).

    Spark reads INT64 ns (nanosAsLong) and floors to µs; DuckDB narrows
    TIMESTAMP_NS to µs the same way, so epoch_us matches exactly.
    """
    ev = Tables(spark, sf_dir).events
    return ev.select(
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        "user_id",
        "event_type",
        "value",
    )


def _schema_oracle() -> str:
    parts = [
        f"SELECT '{t}' AS table_name, column_name FROM (DESCRIBE SELECT * FROM {t})"
        for t in TABLE_NAMES
    ]
    return " UNION ALL ".join(parts)


@query("scan_schema", oracle=_schema_oracle())
def scan_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema fidelity: (table, column) inventory as read by the engine.

    Uses the live parquet footers (via catalog loaders), not the declared
    SCHEMAS dict, so a drifted file shows up as a mismatch.
    """
    t = Tables(spark, sf_dir)
    rows = [
        (name, f.name) for name in TABLE_NAMES for f in t.load(name).schema.fields
    ]
    return spark.createDataFrame(rows, "table_name string, column_name string")


def declared_schema_diff(spark: SparkSession, sf_dir: str) -> list[str]:
    """Engine-side check (used by tests): live schema vs declared SCHEMAS."""
    t = Tables(spark, sf_dir)
    problems = []
    for name in TABLE_NAMES:
        live = t.load(name).schema
        want = SCHEMAS[name]
        if [f.name for f in live.fields] != [f.name for f in want.fields]:
            problems.append(f"{name}: names {live.fieldNames()} != {want.fieldNames()}")
            continue
        for lf, wf in zip(live.fields, want.fields):
            if lf.dataType.simpleString() != wf.dataType.simpleString():
                problems.append(
                    f"{name}.{lf.name}: {lf.dataType.simpleString()} != {wf.dataType.simpleString()}"
                )
    return problems


@query("sink_parquet", oracle=None)  # write path: rows-only check
def sink_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip sink: aggregate -> write parquet (partitioned) -> re-read.

    Partitioning by the group key demonstrates the layout a 100 TB sink
    would use (partition pruning on read); local tmp dir stands in for
    the cluster FS.
    """
    li = Tables(spark, sf_dir).lineitem
    out = (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"), F.count("*").alias("n"))
    )
    path = tempfile.mkdtemp(prefix="pts_sink_") + "/agg"
    out.write.mode("overwrite").partitionBy("l_returnflag").parquet(path)
    back = spark.read.parquet(path)
    return back.select("l_returnflag", "l_linestatus", "sum_qty", "n")
