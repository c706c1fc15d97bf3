"""Fixture catalog: declared schemas + lazy loaders.

Tables (FIXTURES.md, measured from the driver parquet):
  region nation customer supplier part orders lineitem events
  documents embeddings

Design notes for scale:
- Every loader is a plain ``spark.read.parquet`` — a lazy scan node, so
  Catalyst keeps predicate pushdown / column pruning / partition pruning
  on the table; nothing is materialized here.
- ``events.ts`` is INT64 TIMESTAMP(NANOS) in parquet. Spark 4 refuses
  the type outright; with ``spark.sql.legacy.parquet.nanosAsLong=true``
  (set by session.ensure_conf) it scans as bigint ns and we convert with
  ``timestamp_micros(ts div 1000)``. ``div`` is 64-bit integer floor
  division — the same truncation DuckDB 1.0 applies when it narrows
  TIMESTAMP_NS to its µs TIMESTAMP, so both engines see bit-equal µs.
  (Never ``/1000``: that routes through double, which cannot represent
  1.7e18 exactly and perturbs the microsecond.)
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pandas_tsdb_spark.session import ensure_conf

TABLE_NAMES = (
    "region",
    "nation",
    "supplier",
    "customer",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Declared logical schemas (what a user of the engine sees), per FIXTURES.md.
# events.ts is declared as TimestampType — catalog converts from raw ns.
SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampNTZType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampNTZType()),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}


def _nn_key(value_col: str, key_col: str) -> F.Column:
    """Ordering key for a NULL-aware max_by/min_by: pandas
    first()/last()/ohlc() pick the first/last NON-null observation and
    DuckDB's arg_max/arg_min skip null values, but Spark's max_by/min_by
    return whatever value sits at the extreme key — NULL included.
    Nulling the key on null values makes Spark skip those rows (max_by
    ignores null ordering keys), aligning all three engines. Shared by
    every resample/last-per-group operator whose oracle uses arg_max."""
    return F.when(F.col(value_col).isNotNull(), F.col(key_col))


# Measure (double) columns per table: IEEE specials arriving in these
# are ingest noise (a scraped/exported corpus serves NaN and ±Inf), and
# they are normalized to SQL NULL (= missing) at the scan layer. Why:
# (a) the reference model is pandas, where NaN IS the missing marker —
# "skip missing" is already this engine's attested contract across three
# null-hardening sweeps, and specials inherit all of it for free;
# (b) left raw, ONE special is a job-killer under ANSI: the
# cents-integer aggregation trick (round(v*100) cast bigint, used for
# float-order-independent exact sums) throws CAST_OVERFLOW on NaN/Inf —
# the round-6 NaN/Inf sweep measured 48 of 96 swept queries crashing or
# diverging on a 3-prime injection; (c) DuckDB itself dies on Inf in
# stddev/corr, so IEEE-propagation parity is not even oracle-testable.
# Scale cost: ~zero. The rewrite is one codegen CASE per measure column;
# measure predicates lose parquet row-group pushdown, but uniform-domain
# measures never prune row groups anyway (min/max spans the domain in
# every group) — the selective predicates (dates, keys) ride untouched
# pass-through attributes and still push down. Embeddings are covered by
# the vector surface's own exclusion contract (llm_vectors module doc).
_MEASURE_DOUBLES: dict[str, tuple[str, ...]] = {
    "events": ("value",),
    "lineitem": ("l_quantity", "l_extendedprice", "l_discount", "l_tax"),
    "orders": ("o_totalprice",),
    "customer": ("c_acctbal",),
    "supplier": ("s_acctbal",),
    "part": ("p_retailprice",),
}


def sanitize_special(col: str) -> F.Column:
    """NaN/±Inf -> NULL, everything else unchanged (see _MEASURE_DOUBLES)."""
    c = F.col(col)
    return F.when(F.isnan(c) | (F.abs(c) == float("inf")), F.lit(None)).otherwise(c)


def artifact_memo(spark: SparkSession, sf_dir: str, table: str, tag: str, fn):
    """Session-scoped memo for DERIVED ARTIFACTS that are deterministic
    functions of ONE immutable fixture file: collected query blocks,
    trained ANN codebooks, a materialized (checkpointed) candidate set.
    Same (path, mtime_ns, size) invalidation contract as the scan cache
    in Tables.load — a rewritten file never serves a stale artifact, and
    tests that stage fresh fixtures under tmp dirs re-derive naturally.

    Why this exists: a session that re-runs vector/dedup queries
    (a dashboard, iterative notebook work, a benchmark loop) would
    otherwise re-collect the same bounded query block and re-train the
    same codebook on every call — at production scale, re-training an
    unchanged quantizer per query is pure waste, and this is exactly the
    reuse a feature-store serving layer implements. Bounded by contract:
    every memoized artifact is small (query blocks are <= _N_QUERIES
    rows, codebooks are fixed-shape, checkpointed candidate sets are
    proportional to true duplication), with LRU eviction at 64 entries
    (round-7: the old full clear dropped every HOT artifact the moment
    a 65th fixture appeared — a test session cycling tmp fixtures would
    evict the bench fixtures' codebooks for no reason).
    """
    path = f"{sf_dir.rstrip('/')}/{table}.parquet"
    try:
        st = os.stat(path)
        key = (path, tag, st.st_mtime_ns, st.st_size)
    except OSError:
        return fn()
    cache = getattr(spark, "_pandas_tsdb_artifact_cache", None)
    if cache is None:
        cache = {}  # dicts iterate in insertion order: LRU via re-insert
        spark._pandas_tsdb_artifact_cache = cache
    if key in cache:
        cache[key] = cache.pop(key)  # refresh recency
    else:
        while len(cache) >= 64:
            cache.pop(next(iter(cache)))  # evict least-recently-used
        cache[key] = fn()
    return cache[key]


def _normalize_ts(dt: T.DataType) -> F.Column:
    """events.ts -> TimestampType whatever the parquet physical type.

    - TIMESTAMP(NANOS) scans as bigint ns (via nanosAsLong) -> µs
      timestamp; integer ``div`` TRUNCATES TOWARD ZERO, and so does
      DuckDB's ns->µs narrowing — verified on pre-1970 negatives
      (-1500 ns -> -1 µs in both; floor would give -2) by the round-6
      date-extremes differential (tests/test_ts_extremes.py). Never
      ``/1000``: double rounding at 1.7e18 ns perturbs the
      microsecond.
    - TIMESTAMP(MICROS/MILLIS, isAdjustedToUTC=false) scans as
      TIMESTAMP_NTZ -> cast to TIMESTAMP (session zone is pinned UTC, so
      the wall time IS the instant, same as DuckDB's naive semantics).
    - Adjusted-to-UTC parquet already scans as TimestampType.
    """
    if isinstance(dt, T.LongType):
        return F.expr("timestamp_micros(ts div 1000)")
    if isinstance(dt, T.TimestampNTZType):
        return F.col("ts").cast(T.TimestampType())
    return F.col("ts")


class Tables:
    """Lazy per-(session, sf_dir) table access: ``Tables(spark, d).lineitem``."""

    def __init__(self, spark: SparkSession, sf_dir: str):
        self.spark = ensure_conf(spark)
        self.sf_dir = sf_dir.rstrip("/")

    def path(self, name: str) -> str:
        return f"{self.sf_dir}/{name}.parquet"

    def load(self, name: str) -> DataFrame:
        if name not in TABLE_NAMES:
            raise KeyError(name)
        path = self.path(name)
        # Reuse the resolved scan across queries: spark.read.parquet
        # costs ~75 ms of driver-side file listing + footer schema
        # inference PER CALL (measured at sf0.1), and a 28-query bench
        # run re-resolved the same ten immutable fixtures ~50 times —
        # ~3.5 s of pure fixed cost. The cache holds the LAZY DataFrame
        # (a plan node, no data); it lives on the session object so it
        # dies with the session, and the key carries the file's
        # (mtime, size) so a rewritten fixture (property tests write
        # fresh parquet under tmp dirs) never serves a stale FileIndex.
        try:
            st = os.stat(path)
            key = (path, name, st.st_mtime_ns, st.st_size)
        except OSError:
            key = None
        cache = getattr(self.spark, "_pandas_tsdb_scan_cache", None)
        if cache is None:
            cache = {}
            self.spark._pandas_tsdb_scan_cache = cache
        if key is not None and key in cache:
            return cache[key]
        df = self.spark.read.parquet(path)
        if name == "events":
            df = df.withColumn("ts", _normalize_ts(df.schema["ts"].dataType))
        for col in _MEASURE_DOUBLES.get(name, ()):
            # presence-guarded: narrowed user files (a projection
            # written back, a test fixture) may lack the column
            if col in df.columns and isinstance(
                df.schema[col].dataType, T.DoubleType
            ):
                df = df.withColumn(col, sanitize_special(col))
        if key is not None:
            if len(cache) > 256:  # bound growth across many tmp fixtures
                cache.clear()
            cache[key] = df
        return df

    def __getattr__(self, name: str) -> DataFrame:
        if name in TABLE_NAMES:
            return self.load(name)
        raise AttributeError(name)

    def sql_views(self) -> str:
        """Register the fixture tables as ``ptsdb_*`` temp views for
        builders written as ONE ``spark.sql(...)`` call, memoized per
        (session, sf_dir).

        Why monolithic SQL builders exist (r9-opt): every DataFrame
        transformation eagerly re-analyzes its whole logical subtree,
        measured at ~28-46 ms per op on this container as plans grow —
        a 12-op builder paid ~0.4-0.55 s of pure driver-side plan
        construction PER CALL (text_lm_bigram: 552 ms). One sql() call
        parses and analyzes the complete tree once: 552 -> 104 ms with
        a bit-identical result and the same physical plan (hints carry
        the broadcast/repartition decisions). At production query rates
        the driver-side saving is the same multiple.

        Memo: re-registers when sf_dir OR any table file's (mtime,
        size) changes — the same invalidation contract as the scan
        cache, so a rewritten fixture never serves a stale view and a
        session cycling fixtures (the oracle harness) re-points the
        views naturally. Returns the prefix.
        """
        stamp = [self.sf_dir]
        for name in TABLE_NAMES:
            try:
                st = os.stat(self.path(name))
                stamp.append((st.st_mtime_ns, st.st_size))
            except OSError:
                stamp.append(None)
        key = tuple(stamp)
        if getattr(self.spark, "_pandas_tsdb_sql_views_key", None) != key:
            self.register_views("ptsdb_")
            self.spark._pandas_tsdb_sql_views_key = key
        return "ptsdb_"

    def register_views(self, prefix: str = "") -> list[str]:
        """Register every fixture table as a session temp view
        (``{prefix}{table}``) so plain ``spark.sql(...)`` works against
        the catalog — the third entry path beside the DataFrame builders
        and the TsFrame surface (join_lateral demonstrates it inside an
        operator). Views are lazy pointers at the normalized loaders
        (events keeps its ns->µs ts normalization), so registering costs
        nothing until a query runs."""
        names = []
        for name in TABLE_NAMES:
            view = f"{prefix}{name}"
            try:
                df = self.load(name)
            except Exception:
                # partial fixtures (null-injection / holey-table test
                # stages, narrowed user dirs) may lack whole tables;
                # a builder that never references the missing view is
                # unaffected, one that does fails at ITS analysis with
                # the view name — strictly better than failing all
                # builders at registration. DROP any same-named view a
                # previous sf_dir registered: silently serving another
                # fixture's table would be a correctness bug.
                try:
                    self.spark.catalog.dropTempView(view)
                except Exception:
                    pass
                continue
            df.createOrReplaceTempView(view)
            names.append(view)
        return names
