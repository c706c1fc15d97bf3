"""§2.1 scans / sources / sinks.

Scale notes: all reads are bare parquet scans (Catalyst keeps pushdown);
the sink writes partitioned parquet and returns the re-read — on a
cluster the same code writes to any Hadoop-compatible FS.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from pandas_tsdb_spark.catalog import SCHEMAS, TABLE_NAMES, Tables
from pandas_tsdb_spark.registry import query, sum2_col


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


@query(
    "sink_parquet",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
)
def sink_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip sink: aggregate -> write parquet (partitioned) ->
    re-read — oracle-checked end to end like the CSV/JSON/ORC roundtrip
    trio (round-3 upgrade from rows-only: the write path itself is what
    the hash now certifies; l_quantity is integer-valued, so the
    rounded sum is exact on both engines and survives the parquet
    round-trip bit-identically).

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
    # explicit schema on the read-back: a zero-row write commits no
    # partition directories, and schema inference over the bare
    # _SUCCESS marker throws UNABLE_TO_INFER_SCHEMA (round-6 zero-row
    # sweep). The writer knows its schema — production read-after-write
    # should always pin it.
    back = spark.read.schema(out.schema).parquet(path)
    return back.select("l_returnflag", "l_linestatus", "sum_qty", "n")


_CSV_AGG_ORACLE = """
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
             / 100.0 AS total_price
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
        sum2_col("o_totalprice").alias("total_price"),
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
           (round(sum(value) * 100) / 100.0) AS total_value,
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
        (F.round(F.sum("value") * 100) / F.lit(100.0)).alias("total_value"),
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
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
             / 100.0 AS total_price
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
        sum2_col("l_extendedprice").alias("total_price"),
    )
    path = tempfile.mkdtemp(prefix="pts_orc_") + "/agg"
    agg.write.mode("overwrite").orc(path)
    return spark.read.orc(path)


@query(
    "sink_partition_prune",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS event_date,
           event_type, count(*) AS n, round(sum(value), 4) AS total
    FROM events
    WHERE date_trunc('day', ts) BETWEEN TIMESTAMP '2024-01-10'
                                    AND TIMESTAMP '2024-01-12'
    GROUP BY 1, 2
    """,
)
def sink_partition_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB data-layout loop, oracle-checked end-to-end: write
    events hive-partitioned by day -> read back -> query 3 of 30 days.
    The date predicate is resolved against the DIRECTORY STRUCTURE
    (PartitionFilters in the scan node — asserted in tests/test_plans),
    so 27/30 of the data is never opened; at cluster scale this is the
    difference between reading 10 TB and 100 TB. The partition column
    is re-emitted as a timestamp so both engines compare cleanly."""
    ev = Tables(spark, sf_dir).events
    path = tempfile.mkdtemp(prefix="pts_part_") + "/events_by_day"
    # Shuffle by the partition column before the partitioned write: each
    # day-directory is then written by exactly one task (30 parallel
    # writers, one file each) instead of every input task opening a
    # writer per day it happens to contain — at cluster scale the latter
    # is the classic tasks x partitions small-files explosion (1000
    # executors x 30 days = 30k files/day batch); here it's also a
    # measured 1.09 s -> 0.7 s. For skewed days, add a salt term to
    # spread one day over k writers.
    dated = ev.withColumn("event_date", F.to_date("ts"))
    # SPARK_GRAFT_DAY_SALT (r10-opt, round-9 verdict #5 measurement):
    # writers per day directory. Measured at 256x (tools/ab_q20_salt.py,
    # 4 reps interleaved): salt=4 is ~9% faster wall-clock (8.59 vs
    # 9.42 s) but fragments 30 x 9 MB day files into 113 x 2.2 MB —
    # already far under the 128 MB-1 GB guidance, so the default stays
    # 1 (layout quality over a single-session 9%). At 100 TB pick
    # salt ~= ceil(day_bytes / target_file_size); the knob is the same
    # mechanism production would drive from table stats. Salt only
    # changes the file LAYOUT, never the read-back aggregate.
    salt = int(os.environ.get("SPARK_GRAFT_DAY_SALT", "1"))
    part = (
        dated.repartition("event_date")
        if salt <= 1
        else dated.repartition(
            "event_date", F.pmod(F.col("event_id"), F.lit(salt))
        )
    )
    part.write.mode("overwrite").partitionBy("event_date").parquet(path)
    # explicit schema: a zero-row increment commits no day directories
    # and an inference read-back dies on the empty layout (round-6
    # zero-row sweep) — the exact first-run-of-an-incremental-pipeline
    # failure a 100 TB deployment hits.
    back = spark.read.schema(dated.schema).parquet(path)
    return (
        back.filter(
            F.col("event_date").between("2024-01-10", "2024-01-12")
        )
        .groupBy(
            F.col("event_date").cast("timestamp").alias("event_date"),
            "event_type",
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total"))
    )


@query(
    "upsert_cdc",
    # latest-ROW semantics via a rank window, NOT arg_max: CDC merge
    # means "the newest row's state wins", and if the newest row carries
    # a NULL value that NULL is the state. arg_max(value, event_id)
    # silently skips null values (a stale non-null would win), so it
    # mirrors the Spark plan only on null-free data (round-5
    # null-injection sweep catch).
    oracle="""
    SELECT user_id, event_type, value, event_id AS src_event
    FROM events
    QUALIFY row_number() OVER (
        PARTITION BY user_id, event_type ORDER BY event_id DESC) = 1
    """,
)
def upsert_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE/upsert (SCD type 1) without a table format: a base
    snapshot (latest state per key before the cutoff) receives a batch
    of changes (events after the cutoff) — updates overwrite matched
    keys, inserts pass through, via full-outer join + coalesce. The
    oracle closes the loop: merging latest-before with latest-after
    must equal latest-overall. Both compactions are one window over the
    same (user_id, event_type) partitioning; AQE plans the final join.
    At scale the base side is the big one — the join key equals the
    compaction key, so the changes side arrives pre-partitioned and
    only the small update batch shuffles again."""
    # ONE spark.sql() call (r9-opt, catalog.Tables.sql_views): 171 ms
    # of per-call plan construction -> ~70 ms; identical window + join
    # trees (oracle-equal at all SFs).
    # update-PRESENCE decides the merged value, not update-value
    # nullness: an update row carrying NULL overwrites the base
    # (latest-row CDC semantics) — coalesce(u_value, value) would
    # resurrect the stale base value (round-5 null-injection sweep
    # catch). Key presence on u_event_id (never null in an update row).
    t = Tables(spark, sf_dir)
    v = t.sql_views()
    return spark.sql(f"""
    WITH ranked AS (
      SELECT user_id, event_type, value, event_id, ts,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY event_id DESC) AS rn
      FROM {v}events
      WHERE ts < TIMESTAMP '2024-01-25'),
    base AS (SELECT user_id, event_type, value, event_id FROM ranked
             WHERE rn = 1),
    uranked AS (
      SELECT user_id, event_type, value, event_id,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY event_id DESC) AS rn
      FROM {v}events
      WHERE ts >= TIMESTAMP '2024-01-25'),
    upd AS (SELECT user_id AS u_user_id, event_type AS u_event_type,
                   value AS u_value, event_id AS u_event_id
            FROM uranked WHERE rn = 1)
    SELECT coalesce(user_id, u_user_id) AS user_id,
           coalesce(event_type, u_event_type) AS event_type,
           CASE WHEN u_event_id IS NOT NULL THEN u_value
                ELSE value END AS value,
           coalesce(u_event_id, event_id) AS src_event
    FROM base FULL OUTER JOIN upd
      ON user_id = u_user_id AND event_type = u_event_type
    """)


_SYNTH_TYPES = ("click", "view", "purchase", "error", "signup")
_SYNTH_PARTS = 8
_SYNTH_ROWS = 2500


@query(
    "source_python_datasource",
    oracle=f"""
    WITH g AS (
        SELECT range AS event_id FROM range({_SYNTH_PARTS * _SYNTH_ROWS})
    ), s AS (
        SELECT event_id,
               event_id % 97 AS user_id,
               CASE event_id % 5
                    WHEN 0 THEN 'click' WHEN 1 THEN 'view'
                    WHEN 2 THEN 'purchase' WHEN 3 THEN 'error'
                    ELSE 'signup' END AS event_type,
               CAST((event_id * 2654435761) % 100000 AS DOUBLE) / 100.0
                 AS value
        FROM g
    )
    SELECT event_type, count(*) AS n, count(DISTINCT user_id) AS n_users,
           (round(sum(value) * 100) / 100.0) AS total
    FROM s GROUP BY event_type
    """,
)
def source_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom source surface: a Spark 4 Python DataSource
    (pyspark.sql.datasource) generating deterministic synthetic events
    partition-parallel — each InputPartition derives its rows from its
    partition id alone, so 1000 executors generate 1000 disjoint shards
    with no coordination (the standard synthetic-benchmark source
    shape; also the template for wrapping any external system Spark
    lacks a connector for). Values are pure integer arithmetic on
    event_id, so the DuckDB oracle regenerates the identical table from
    range() — the whole custom-source path is value-checked, not just
    row-counted. Classes are defined in-closure: cloudpickle ships them
    by value to Python workers (module-level classes would need the
    repo on worker sys.path)."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    types, rows = _SYNTH_TYPES, _SYNTH_ROWS

    class SynthReader(DataSourceReader):
        def __init__(self, options):
            self.parts = int(options.get("partitions", _SYNTH_PARTS))
            self.rows = int(options.get("rowsperpartition", rows))

        def partitions(self):
            return [InputPartition(i) for i in range(self.parts)]

        def read(self, partition):
            pid = partition.value
            for i in range(self.rows):
                eid = pid * self.rows + i
                yield (
                    eid,
                    eid % 97,
                    types[eid % 5],
                    ((eid * 2654435761) % 100000) / 100.0,
                )

    class SynthEventsSource(DataSource):
        @classmethod
        def name(cls):
            return "tsdb_synth"

        def schema(self):
            return "event_id long, user_id long, event_type string, value double"

        def reader(self, schema):
            return SynthReader(self.options)

    spark.dataSource.register(SynthEventsSource)
    df = spark.read.format("tsdb_synth").option(
        "partitions", _SYNTH_PARTS
    ).load()
    return df.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.countDistinct("user_id").alias("n_users"),
        (F.round(F.sum("value") * 100) / F.lit(100.0)).alias("total"),
    )


_EVOLVE_ORACLE = """
    SELECT user_id, 1 AS batch, count(*) AS n_events,
           CAST(NULL AS DOUBLE) AS sum_value
    FROM events WHERE ts < TIMESTAMP '2024-07-01'
    GROUP BY user_id
    UNION ALL
    SELECT user_id, 2 AS batch, count(*) AS n_events,
           (CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0) AS sum_value
    FROM events WHERE ts >= TIMESTAMP '2024-07-01'
    GROUP BY user_id
"""


@query("scan_schema_evolution", oracle=_EVOLVE_ORACLE)
def scan_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution on read — the 100 TB reality that a table's
    files were written over months by different pipeline versions: an
    old batch lacks a column the new batch carries. Writes two parquet
    batches with DIFFERENT schemas (the second adds sum_value), reads
    them back in one scan with mergeSchema=true, and the oracle
    recomputes the merged result with the old batch NULL-filled —
    proving missing-column semantics end to end.

    Discipline notes: mergeSchema is a read-TIME footer union (no data
    rewrite — evolution is free if columns only get ADDED and types
    stay fixed); it costs a footer read per file, so production tables
    pin the merged schema in a catalog instead of re-deriving it per
    scan. Type-CHANGING evolution is not free and needs a rewrite —
    keep types stable."""
    ev = Tables(spark, sf_dir).events
    cutoff = "2024-07-01"
    b1 = (
        ev.filter(F.col("ts") < cutoff)
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"))
        .withColumn("batch", F.lit(1))
    )
    b2 = (
        ev.filter(F.col("ts") >= cutoff)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            sum2_col("value").alias("sum_value"),
        )
        .withColumn("batch", F.lit(2))
    )
    root = tempfile.mkdtemp(prefix="pts_evolve_")
    b1.write.mode("overwrite").parquet(f"{root}/v1")
    b2.write.mode("overwrite").parquet(f"{root}/v2")
    return (
        spark.read.option("mergeSchema", True)
        .parquet(f"{root}/v1", f"{root}/v2")
        .select("user_id", "batch", "n_events", "sum_value")
    )


@query(
    "rollup_continuous",
    oracle="""
    SELECT CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day, event_type,
           count(*) AS n, round(sum(value), 4) AS total
    FROM events GROUP BY 1, 2
    """,
)
def rollup_continuous(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous aggregate (TimescaleDB pattern) end-to-end: ingest
    events into a TsStore in TWO batches with an incremental
    refresh_rollup after each — the second refresh recomputes ONLY the
    days the second batch touched (per-day file fingerprints) — then
    read the rollup back. The oracle is the plain batch aggregate: the
    incremental path must converge to exactly what one full pass
    computes. Refresh cost at 100 TB is proportional to the appended
    debt (changed day partitions), never the store."""
    from pandas_tsdb_spark.store import TsStore

    ev = Tables(spark, sf_dir).events
    store = TsStore(spark, tempfile.mkdtemp(prefix="pts_rollup_"))

    def day_agg(day_df: DataFrame) -> DataFrame:
        return day_df.groupBy("event_type").agg(
            F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total")
        )

    cut = "2024-01-15"
    store.append("events", ev.filter(F.col("ts") < cut))
    store.refresh_rollup("events", "daily", day_agg)
    store.append("events", ev.filter(F.col("ts") >= cut))
    store.refresh_rollup("events", "daily", day_agg)
    # read_rollup, not a raw path read: an empty source leaves the
    # rollup with zero day partitions, and only the store's typed
    # empty-frame fallback keeps that from dying on schema inference
    # (round-6 zero-row sweep).
    roll = store.read_rollup("daily", keep_day=True)
    return roll.select(
        F.col("_date").cast("timestamp").alias("day"), "event_type", "n", "total"
    )


@query(
    "store_maintenance_roundtrip",
    oracle="""
    SELECT event_type, count(*) AS n_keys,
           (CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0) AS sum_value
    FROM events GROUP BY event_type
    """,
)
def store_maintenance_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full TsStore maintenance loop, oracle-checked end-to-end
    (round-6): two blind appends of the same events (every row now has
    a duplicate version on disk, the late/replay reality), then
    ``optimize`` (small-file layout rewrite via the journaled
    move-in-then-delete swap — the round-6 no-gap protocol, see
    store.py) and ``compact`` (keep-latest-per-event_id). The fetch
    that follows must return EXACTLY one physical row per event_id —
    so the per-type counts and sums equal a plain aggregate over the
    source table. Any row a maintenance pass loses, duplicates, or
    tears shows up as a count/sum mismatch against the oracle."""
    from pandas_tsdb_spark.store import TsStore

    ev = Tables(spark, sf_dir).events
    store = TsStore(spark, tempfile.mkdtemp(prefix="pts_maint_"))
    store.append("events", ev)
    store.append("events", ev)
    store.optimize("events", min_files=2)
    store.compact("events", key_cols=["event_id"])
    got = store.fetch("events")
    return got.groupBy("event_type").agg(
        F.count("*").alias("n_keys"),
        sum2_col("value").alias("sum_value"),
    )
