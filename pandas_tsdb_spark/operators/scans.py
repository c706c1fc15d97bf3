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


_CSV_AGG_ORACLE = """
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS total_price
    FROM orders GROUP BY o_orderstatus, o_orderpriority
"""


@query("sink_csv_roundtrip", oracle=_CSV_AGG_ORACLE)
def sink_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV sink+source round-trip, oracle-checked: aggregate -> write
    CSV -> read back with an EXPLICIT schema -> compare to the oracle
    computing the same aggregate directly. Proves value fidelity through
    the text format: Spark writes doubles as shortest-round-trip
    decimal strings, so the re-read double is bit-identical. Explicit
    read schema (never inferSchema) is the 100 TB discipline — schema
    inference is an extra full scan and can widen types under you."""
    o = Tables(spark, sf_dir).orders
    agg = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    )
    path = tempfile.mkdtemp(prefix="pts_csv_") + "/agg"
    agg.write.mode("overwrite").option("header", True).csv(path)
    return spark.read.schema(
        "o_orderstatus string, o_orderpriority string, "
        "n_orders long, total_price double"
    ).option("header", True).csv(path)


_JSON_AGG_ORACLE = """
    SELECT event_type,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value,
           CAST(max(user_id) AS BIGINT) AS max_user
    FROM events GROUP BY event_type
"""


@query("sink_json_roundtrip", oracle=_JSON_AGG_ORACLE)
def sink_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines sink+source round-trip, oracle-checked (same contract
    as sink_csv_roundtrip). JSON lines is the interchange format most
    LLM-corpus tooling speaks; the explicit read schema keeps the scan
    single-pass and the types exact."""
    ev = Tables(spark, sf_dir).events
    agg = ev.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
        F.max("user_id").alias("max_user"),
    )
    path = tempfile.mkdtemp(prefix="pts_json_") + "/agg"
    agg.write.mode("overwrite").json(path)
    return spark.read.schema(
        "event_type string, n_events long, total_value double, max_user long"
    ).json(path)


_ORC_AGG_ORACLE = """
    SELECT l_returnflag, l_linestatus,
           count(*) AS n_rows,
           round(sum(l_extendedprice), 2) AS total_price
    FROM lineitem GROUP BY l_returnflag, l_linestatus
"""


@query("sink_orc_roundtrip", oracle=_ORC_AGG_ORACLE)
def sink_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink+source round-trip, oracle-checked: the second columnar
    format Spark ships natively (vectorized reader, predicate pushdown,
    zlib/zstd). Binary columnar round-trip is bit-exact by
    construction; this op pins the code path so a format regression
    (or a cluster defaulting to ORC hive tables) is caught."""
    li = Tables(spark, sf_dir).lineitem
    agg = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n_rows"),
        F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
    )
    path = tempfile.mkdtemp(prefix="pts_orc_") + "/agg"
    agg.write.mode("overwrite").orc(path)
    return spark.read.orc(path)
