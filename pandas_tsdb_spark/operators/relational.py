"""§2.2 projection/filter/predicates + §2.4 aggregations.

Pandas-capability mapping (SURVEY.md §2.2/§2.4): boolean masks, column
assign, dropna/notna, drop_duplicates, groupby().agg(...), nunique,
describe, pivot_table, masked aggregation, groupby().agg(list).

Scale notes:
- Filters are single Column expressions -> Catalyst pushes them into the
  parquet scan (PushedFilters) and prunes columns via the select list.
- Every groupBy here is a hash aggregate with map-side partial
  aggregation (automatic); output cardinality is tiny, so the shuffle
  moves only partial states, not rows.
- Float discipline: SUM/AVG of doubles are order-dependent -> rounded
  identically on both sides; raw or single-multiply values are
  bit-identical to the oracle and stay unrounded (registry.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pandas_tsdb_spark.catalog import Tables
from pandas_tsdb_spark.registry import oracle_avg, oracle_avg2, oracle_sum2, query, sum2_col

# ---------------------------------------------------------------- projection


@query(
    "project",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS net_price,
           upper(l_returnflag) AS flag,
           l_quantity + 1 AS qty_plus
    FROM lineitem
    """,
)
def project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column select/compute/rename (pandas df[['a']] / assign)."""
    li = Tables(spark, sf_dir).lineitem
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
        F.upper("l_returnflag").alias("flag"),
        (F.col("l_quantity") + 1).alias("qty_plus"),
    )


@query(
    "filter_pred",
    oracle="""
    SELECT * FROM lineitem
    WHERE (l_quantity > 30 OR l_returnflag = 'A')
      AND l_discount BETWEEN 0.02 AND 0.08
      AND l_linestatus IN ('O', 'F')
      AND NOT (l_returnflag = 'N' AND l_quantity < 5)
    """,
)
def filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound boolean mask: AND/OR/NOT, IN, BETWEEN (pandas df[mask])."""
    li = Tables(spark, sf_dir).lineitem
    return li.filter(
        ((F.col("l_quantity") > 30) | (F.col("l_returnflag") == "A"))
        & F.col("l_discount").between(0.02, 0.08)
        & F.col("l_linestatus").isin("O", "F")
        & ~((F.col("l_returnflag") == "N") & (F.col("l_quantity") < 5))
    )


@query(
    "filter_null",
    oracle="""
    SELECT o_orderkey, nullif(o_orderstatus, 'P') AS status_or_null,
           coalesce(nullif(o_orderstatus, 'P'), 'PENDING') AS status_filled
    FROM orders
    WHERE nullif(o_orderstatus, 'P') IS NOT NULL
    """,
)
def filter_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """isna/notna/fillna semantics (fixtures are null-free, so nulls are
    manufactured with nullif and then filtered/filled)."""
    o = Tables(spark, sf_dir).orders
    status_or_null = F.nullif(F.col("o_orderstatus"), F.lit("P"))
    return (
        o.select(
            "o_orderkey",
            status_or_null.alias("status_or_null"),
            F.coalesce(status_or_null, F.lit("PENDING")).alias("status_filled"),
        )
        .filter(F.col("status_or_null").isNotNull())
    )


@query(
    "filter_time_range",
    oracle="""
    SELECT event_id, user_id, event_type, value
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-05 00:00:00'
      AND ts <  TIMESTAMP '2024-01-10 00:00:00'
    """,
)
def filter_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DatetimeIndex slice df['2024-01-05':'2024-01-10'] as a ts filter.

    The predicate lands in PushedFilters -> parquet row-group min/max
    pruning at scale.
    """
    ev = Tables(spark, sf_dir).events
    return ev.filter(
        (F.col("ts") >= F.lit("2024-01-05 00:00:00").cast("timestamp"))
        & (F.col("ts") < F.lit("2024-01-10 00:00:00").cast("timestamp"))
    ).select("event_id", "user_id", "event_type", "value")


@query(
    "distinct_rows",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus, l_shipdate FROM lineitem",
)
def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """drop_duplicates() over a projection."""
    li = Tables(spark, sf_dir).lineitem
    return li.select("l_returnflag", "l_linestatus", "l_shipdate").distinct()


@query(
    "distinct_subset",
    oracle="""
    SELECT user_id, event_type, event_id, value FROM (
        SELECT user_id, event_type, event_id, value,
               row_number() OVER (PARTITION BY user_id, event_type
                                  ORDER BY event_id) AS rn
        FROM events
    ) WHERE rn = 1
    """,
)
def distinct_subset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """drop_duplicates(subset=..., keep='first') — first row per key in
    event_id order, made deterministic via row_number (unique key)."""
    from pyspark.sql import Window as W

    ev = Tables(spark, sf_dir).events
    w = W.partitionBy("user_id", "event_type").orderBy("event_id")
    return (
        ev.select("user_id", "event_type", "event_id", "value")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


# ------------------------------------------------------------- aggregations


@query(
    "agg_global",
    oracle=f"""
    SELECT {oracle_sum2('l_quantity')} AS sum_qty,
           {oracle_sum2('l_extendedprice')} AS sum_price,
           {oracle_avg2('l_extendedprice')} AS avg_price,
           min(l_extendedprice) AS min_price,
           max(l_extendedprice) AS max_price,
           count(*) AS n_rows
    FROM lineitem
    """,
)
def agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-table reduce (pandas df.agg) — partial aggregation means the
    shuffle carries one state per partition regardless of table size."""
    li = Tables(spark, sf_dir).lineitem
    return li.agg(
        sum2_col("l_quantity").alias("sum_qty"),
        sum2_col("l_extendedprice").alias("sum_price"),
        (sum2_col("l_extendedprice") / F.count("*")).alias("avg_price"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        F.count("*").alias("n_rows"),
    )


Q1_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       {oracle_sum2('l_quantity')} AS sum_qty,
       {oracle_sum2('l_extendedprice')} AS sum_base_price,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l_discount * 100) AS BIGINT)))
            AS DOUBLE) / 10000.0 AS sum_disc_price,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l_discount * 100) AS BIGINT))
                * (100 + CAST(round(l_tax * 100) AS BIGINT)))
            AS DOUBLE) / 1000000.0 AS sum_charge,
       {oracle_avg2('l_quantity')} AS avg_qty,
       {oracle_avg2('l_extendedprice')} AS avg_price,
       {oracle_avg2('l_discount')} AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@query("agg_groupby", oracle=Q1_ORACLE)
def agg_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: TPC-H-Q1-shaped multi-aggregate groupBy over lineitem.

    scan -> pushed filter -> hash agg (partial+final). Group cardinality
    is 6, so at 100 TB the shuffle is 6 rows x partitions of partial
    state — the canonical scalable aggregation shape.
    """
    # disc_price/charge accumulate in exact integer e4/e6 units (2dp
    # factor products; see tpch.py helpers rationale — round(sum, 2)
    # over multi-decimal addends can land on genuine half ties).
    # Overflow at 100 TB: the e6 product is ~3.6e10/row, BIGINT sum
    # overflows at ~2.5e8 rows/group (ANSI throw; DuckDB silently
    # promotes to HUGEINT). Sum(decimal(38,0)) is exact but its
    # aggregate path measures 1.8x BIGINT at 64x — so SPLIT-SUM
    # instead: two plain BIGINT sums of (p div M) and (p mod M),
    # recombined exactly in decimal on the 6-row aggregate output.
    # Headroom becomes ~9e12 rows/group (90x past 100 TB TPC-H) at
    # bigint-sum speed; verified bit-identical to the decimal path.
    # Expressions as SQL strings: each F.expr is ONE py4j roundtrip
    # where the equivalent Column-builder chain makes dozens (this
    # builder measured 163 ms of pure plan-construction chatter at
    # sf0.1 — a fixed per-query cost the bench pays every run). The
    # parsed expressions are identical Catalyst trees; the oracle is
    # unchanged. NOTE Spark parses bare float literals as DECIMAL —
    # the D suffix keeps every constant a double, and sum2's quotient
    # shape (cast(sum(bigint) as double) / 100.0D) mirrors sum2_col
    # operand for operand.
    # r9-opt: the whole tree is ONE spark.sql() call (filter + agg +
    # recombine projection analyzed once — catalog.Tables.sql_views):
    # 186 ms of per-call plan construction -> ~70 ms.
    def sum2(col):
        return f"cast(sum(cast(round({col} * 100, 0) as bigint)) as double) / 100.0D"

    disc_price = (
        "cast(round(l_extendedprice * 100, 0) as bigint)"
        " * (100L - cast(round(l_discount * 100, 0) as bigint))"
    )
    charge = f"({disc_price}) * (100L + cast(round(l_tax * 100, 0) as bigint))"

    def split_hi_lo(p, tag):
        # non-negative p == (p >> 20) * 2^20 + (p & (2^20-1)), exactly;
        # both halves sum in plain BIGINT (hi <= ~1.4e5/row)
        return (
            f"sum(shiftright({p}, 20)) AS _{tag}_hi,"
            f" sum(({p}) & {(1 << 20) - 1}L) AS _{tag}_lo"
        )

    def recombine(tag, scale):
        return (
            f"cast(cast(_{tag}_hi as decimal(38,0)) * {1 << 20} + _{tag}_lo"
            f" as double) / {scale}D"
        )

    v = Tables(spark, sf_dir).sql_views()
    return spark.sql(f"""
    WITH agg AS (
      SELECT l_returnflag, l_linestatus,
             {sum2('l_quantity')} AS sum_qty,
             {sum2('l_extendedprice')} AS sum_base_price,
             {split_hi_lo(disc_price, 'dp')},
             {split_hi_lo(charge, 'ch')},
             ({sum2('l_quantity')}) / count(*) AS avg_qty,
             ({sum2('l_extendedprice')}) / count(*) AS avg_price,
             ({sum2('l_discount')}) / count(*) AS avg_disc,
             count(*) AS count_order
      FROM {v}lineitem
      WHERE l_shipdate <= timestamp_ntz'1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus)
    SELECT l_returnflag, l_linestatus, sum_qty, sum_base_price,
           {recombine('dp', 10000.0)} AS sum_disc_price,
           {recombine('ch', 1000000.0)} AS sum_charge,
           avg_qty, avg_price, avg_disc, count_order
    FROM agg
    """)


@query(
    "agg_distinct",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS n_parts,
           count(DISTINCT l_suppkey) AS n_supps,
           count(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nunique per group (expands to a two-phase distinct aggregate)."""
    li = Tables(spark, sf_dir).lineitem
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count("*").alias("n_rows"),
    )


@query("agg_approx_distinct", oracle=None)  # approximate by design: rows-only
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx nunique (HyperLogLog++) — the 100 TB path where exact
    distinct would shuffle every key. Value is approximate, so no oracle;
    tests assert it within rsd of the exact count instead."""
    li = Tables(spark, sf_dir).lineitem
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts"),
        F.count("*").alias("n_rows"),
    )


@query(
    "agg_stats",
    oracle="""
    WITH c AS (
      SELECT l_returnflag,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS pc,
             l_extendedprice
      FROM lineitem
    )
    SELECT l_returnflag,
           round(sqrt((CAST(sum(pc * pc) AS DOUBLE)
                       - CAST(sum(pc) AS DOUBLE) * CAST(sum(pc) AS DOUBLE)
                         / count(*))
                      / (count(*) - 1)) / 100.0, 4) AS sd_price,
           round((CAST(sum(pc * pc) AS DOUBLE)
                  - CAST(sum(pc) AS DOUBLE) * CAST(sum(pc) AS DOUBLE)
                    / count(*))
                 / (count(*) - 1) / 10000.0, 4) AS var_price,
           round(quantile_cont(l_extendedprice, 0.5), 4) AS median_price,
           round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price,
           count(*) AS n
    FROM c GROUP BY l_returnflag
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """describe()-style moments + exact interpolated percentiles.

    Spark `percentile` (exact, interpolated) == DuckDB quantile_cont.
    Variance/stddev derive from EXACT integer moments in cents
    (Σx and Σx² as 128-bit integers — Spark DECIMAL(38,0) mirroring
    DuckDB's automatic HUGEINT sum): the streaming-moment var_samp of
    both engines diverges past round(4) at 64x rows (noise ∝
    sqrt(n)·ulp), while identical exact sums make every downstream
    IEEE op bit-identical at any scale. The two-pass cancellation
    (Σx² − (Σx)²/n) costs ~1 digit here (var is a sizable fraction of
    the second moment), far inside the rounding. Skew/kurtosis live in
    agg_skew_kurt."""
    li = Tables(spark, sf_dir).lineitem
    pc = F.round(F.col("l_extendedprice") * 100).cast("long")
    c = li.select("l_returnflag", "l_extendedprice", pc.alias("pc"))
    n = F.count("*")
    sum_pc = F.sum(F.col("pc").cast("decimal(38,0)")).cast("double")
    sum_pc2 = F.sum((F.col("pc") * F.col("pc")).cast("decimal(38,0)")).cast(
        "double"
    )
    var_c2 = (sum_pc2 - sum_pc * sum_pc / n) / (n - F.lit(1))
    return c.groupBy("l_returnflag").agg(
        F.round(F.sqrt(var_c2) / F.lit(100.0), 4).alias("sd_price"),
        F.round(var_c2 / F.lit(10000.0), 4).alias("var_price"),
        F.round(F.percentile("l_extendedprice", F.lit(0.5)), 4).alias("median_price"),
        F.round(F.percentile("l_extendedprice", F.lit(0.9)), 4).alias("p90_price"),
        F.count("*").alias("n"),
    )


@query(
    "agg_skew_kurt",
    # Spark emits POPULATION skewness g1 and excess kurtosis g2; DuckDB's
    # skewness/kurtosis are the SAMPLE-corrected G1/G2, so the oracle
    # computes the population moments explicitly.
    oracle="""
    WITH s AS (
        SELECT l_returnflag AS flag, avg(l_quantity) AS mu,
               stddev_pop(l_quantity) AS sd, count(l_quantity) AS n
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT s.flag AS l_returnflag,
           round(sum(pow(l_quantity - s.mu, 3)) / s.n / pow(s.sd, 3), 4) + 0.0
             AS skew_qty,
           round(sum(pow(l_quantity - s.mu, 4)) / s.n / pow(s.sd, 4) - 3, 4) + 0.0
             AS kurt_qty
    FROM lineitem JOIN s ON lineitem.l_returnflag IS NOT DISTINCT FROM s.flag
    GROUP BY s.flag, s.n, s.sd
    """,
)
def agg_skew_kurt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas .skew()/.kurt() analogue (population definition).

    `+ 0.0` after the round on BOTH sides: a tiny negative moment
    rounds to IEEE -0.0, which one engine prints as "-0.0" and the
    other as "0.0" — numerically equal, hash-different (hit at
    sf0.001 where a group's skewness is ~-1e-5). Adding +0.0
    canonicalizes the zero sign.

    Null semantics (round-6 core-table sweep): Spark's skewness/
    kurtosis skip NULL observations, so the oracle's n must be
    count(l_quantity), not count(*), and its self-join must use IS NOT
    DISTINCT FROM — a plain equi-join silently drops the NULL-flag
    GROUP that Spark's groupBy keeps."""
    li = Tables(spark, sf_dir).lineitem
    return li.groupBy("l_returnflag").agg(
        (F.round(F.skewness("l_quantity"), 4) + F.lit(0.0)).alias("skew_qty"),
        (F.round(F.kurtosis("l_quantity"), 4) + F.lit(0.0)).alias("kurt_qty"),
    )


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pivot_table(margins=True) analogue: CUBE subtotals.

    NOT df.cube(): Spark's Expand-based cube (a) shuffles 4x the fact
    rows (every input row expands once per grouping set before the
    exchange) and (b) silently drops even the global () row on EMPTY
    input, where standard SQL — and the DuckDB oracle — emit the
    identity row (sum NULL, n 0); the round-6 zero-row sweep caught
    the 0-vs-1-row divergence. Instead: ONE finest-grain aggregation
    of the fact (the only shuffle that scales with data), then the
    three coarser sets re-aggregate the tiny (rf x ls) base — exact,
    because rounding is applied once per output row over raw sums
    (l_quantity is integer-valued, so double sums are exact and
    reassociation-safe), and Spark's global .agg() DOES emit the
    identity row on empty input. Same multiset of rows as CUBE by
    construction, including the data-NULL vs subtotal-NULL pairs on
    null-injected group keys (core-nulls sweep re-verified)."""
    li = Tables(spark, sf_dir).lineitem
    base = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").alias("sq"), F.count("*").alias("cnt")
    )
    lvl_rl = base.select(
        "l_returnflag",
        "l_linestatus",
        F.round("sq", 2).alias("sum_qty"),
        F.col("cnt").alias("n"),
    )
    lvl_r = base.groupBy("l_returnflag").agg(
        F.round(F.sum("sq"), 2).alias("sum_qty"), F.sum("cnt").alias("n")
    ).select(
        "l_returnflag",
        F.lit(None).cast("string").alias("l_linestatus"),
        "sum_qty",
        "n",
    )
    lvl_l = base.groupBy("l_linestatus").agg(
        F.round(F.sum("sq"), 2).alias("sum_qty"), F.sum("cnt").alias("n")
    ).select(
        F.lit(None).cast("string").alias("l_returnflag"),
        "l_linestatus",
        "sum_qty",
        "n",
    )
    lvl_g = base.agg(
        F.round(F.sum("sq"), 2).alias("sum_qty"),
        F.coalesce(F.sum("cnt"), F.lit(0).cast("long")).alias("n"),
    ).select(
        F.lit(None).cast("string").alias("l_returnflag"),
        F.lit(None).cast("string").alias("l_linestatus"),
        "sum_qty",
        "n",
    )
    return (
        lvl_rl.unionByName(lvl_r).unionByName(lvl_l).unionByName(lvl_g)
    )


_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@query(
    "agg_pivot",
    oracle="""
    SELECT user_id,
           (round(sum(value) FILTER (event_type = 'click') * 100) / 100.0) AS click,
           (round(sum(value) FILTER (event_type = 'error') * 100) / 100.0) AS error,
           (round(sum(value) FILTER (event_type = 'purchase') * 100) / 100.0) AS purchase,
           (round(sum(value) FILTER (event_type = 'signup') * 100) / 100.0) AS signup,
           (round(sum(value) FILTER (event_type = 'view') * 100) / 100.0) AS view
    FROM events GROUP BY user_id
    """,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pivot_table wide reshape: one column per event_type.

    Explicit pivot values -> single pass, no extra job to discover
    distinct values (matters at scale)."""
    ev = Tables(spark, sf_dir).events
    return (
        ev.groupBy("user_id")
        .pivot("event_type", _EVENT_TYPES)
        .agg((F.round(F.sum("value") * 100) / F.lit(100.0)))
    )


@query(
    "agg_conditional",
    oracle=f"""
    SELECT l_returnflag,
           CAST(sum(CASE WHEN l_discount > 0.05
                         THEN CAST(round(l_extendedprice * 100) AS BIGINT)
                         ELSE 0 END) AS DOUBLE) / 100.0
               AS high_disc_rev,
           count(CASE WHEN l_quantity > 25 THEN 1 END) AS n_big,
           {oracle_avg("CASE WHEN l_linestatus = 'O' THEN l_quantity END", "count(CASE WHEN l_linestatus = 'O' THEN 1 END)")} AS avg_open_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Masked aggregation (pandas sum-where) via when/otherwise."""
    li = Tables(spark, sf_dir).lineitem
    return li.groupBy("l_returnflag").agg(
        (
            F.sum(
                F.when(
                    F.col("l_discount") > 0.05,
                    F.round(F.col("l_extendedprice") * 100).cast("long"),
                ).otherwise(F.lit(0).cast("long"))
            ).cast("double")
            / F.lit(100.0)
        ).alias("high_disc_rev"),
        F.count(F.when(F.col("l_quantity") > 25, 1)).alias("n_big"),
        (
            F.round(F.sum(F.when(F.col("l_linestatus") == "O", F.col("l_quantity"))), 2)
            / F.count(F.when(F.col("l_linestatus") == "O", 1))
        ).alias("avg_open_qty"),
    )


@query(
    "agg_collect",
    oracle="""
    SELECT user_id,
           array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types,
           count(*) AS n
    FROM events GROUP BY user_id
    """,
)
def agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupby().agg(list/set): collect_set sorted for determinism, then
    string-joined so the hash sees a scalar."""
    ev = Tables(spark, sf_dir).events
    return ev.groupBy("user_id").agg(
        F.array_join(F.array_sort(F.collect_set("event_type")), ",").alias("types"),
        F.count("*").alias("n"),
    )


@query(
    "agg_value_counts",
    oracle="""
    SELECT event_type, count(*) AS n,
           CAST(count(*) AS DOUBLE)
             / (SELECT count(*) FROM events) AS frac
    FROM events GROUP BY event_type
    """,
)
def agg_value_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas `value_counts(normalize=True)`: category counts plus
    proportion of total. The total is a 1-row aggregate broadcast into
    the projection — never a second full scan per group. Integer/
    integer division in float64 is bit-identical cross-engine."""
    ev = Tables(spark, sf_dir).events
    total = ev.agg(F.count("*").alias("tot"))
    return (
        ev.groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .crossJoin(F.broadcast(total))
        .select(
            "event_type",
            "n",
            (F.col("n").cast("double") / F.col("tot")).alias("frac"),
        )
    )


@query(
    "agg_bool",
    oracle="""
    SELECT user_id,
           bool_and(value > 0.5) AS all_gt_half,
           bool_or(value > 300) AS any_gt300,
           count(*) FILTER (WHERE value > 100) AS n_gt100,
           count(*) FILTER (WHERE event_type = 'error') AS n_err
    FROM events GROUP BY user_id
    """,
)
def agg_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregate surface (pandas `all()`/`any()`/masked count):
    bool_and/bool_or/count_if — partial-aggregating JVM primitives, one
    exchange."""
    ev = Tables(spark, sf_dir).events
    return ev.groupBy("user_id").agg(
        F.bool_and(F.col("value") > 0.5).alias("all_gt_half"),
        F.bool_or(F.col("value") > 300).alias("any_gt300"),
        F.count_if(F.col("value") > 100).alias("n_gt100"),
        F.count_if(F.col("event_type") == "error").alias("n_err"),
    )


@query(
    "filter_time_of_day",
    oracle="""
    SELECT event_id, user_id, event_type, value,
           CAST(extract(hour FROM ts) AS INT) AS hh
    FROM events
    WHERE extract(hour FROM ts) * 60 + extract(minute FROM ts)
          BETWEEN 570 AND 960
    """,
)
def filter_time_of_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas `DataFrame.between_time('09:30','16:00')` — time-of-day
    slice independent of the date. Minute-of-day arithmetic on both
    sides (ns-vs-µs precision cannot move a minute boundary). Map-only:
    no shuffle, and the hour/minute extraction stays inside
    whole-stage codegen."""
    ev = Tables(spark, sf_dir).events
    mod = F.hour("ts") * 60 + F.minute("ts")
    return ev.filter(mod.between(570, 960)).select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        F.hour("ts").alias("hh"),
    )


@query("agg_sketch_rollup", oracle=None)  # sketch estimates are impl-specific
def agg_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch rollup — the hypertable/datacube pattern that
    makes 100 TB distinct-count rollups cheap: build one HLL sketch per
    (day, event_type) cell [hll_sketch_agg], persist-sized partials,
    then MERGE sketches across cells [hll_union_agg] to answer the
    coarser per-event_type question without rescanning raw data. The
    merge phase touches |cells| rows, not |events|. Estimates are
    Datasketches-specific => rows-only check; the companion exact
    nunique per cell is asserted against the estimate in
    tests (rsd < 3% at default lgK=12 on this cardinality)."""
    ev = Tables(spark, sf_dir).events
    daily = ev.groupBy(
        F.date_trunc("day", F.col("ts")).alias("day"), "event_type"
    ).agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.countDistinct("user_id").alias("exact_nunique"),
    )
    return daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).cast("long").alias("approx_users"),
        F.sum("exact_nunique").alias("sum_daily_nunique"),
        F.count("*").alias("n_days"),
    )


@query(
    "agg_histogram",
    oracle="""
    WITH b AS (
        SELECT least(CAST(floor(l_quantity / 5.0) AS INT), 9) AS bucket
        FROM lineitem
    )
    SELECT bucket, bucket * 5.0 AS lo, (bucket + 1) * 5.0 AS hi,
           count(*) AS n
    FROM b GROUP BY bucket
    """,
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric histogram (pandas `value_counts(bins=...)` / np.histogram
    with fixed edges): explicit floor-division bucketing — deliberately
    NOT width_bucket(), whose edge conventions differ across engines —
    then one hash-agg. l_quantity in [1, 50] -> 10 buckets of width 5,
    top bucket right-closed (least(..., 9)). Map-side bucket compute,
    one exchange carrying <= 10 groups per partition."""
    li = Tables(spark, sf_dir).lineitem
    bucket = F.least(
        F.floor(F.col("l_quantity") / 5.0).cast("int"), F.lit(9)
    )
    return (
        li.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
        .select(
            "bucket",
            (F.col("bucket") * 5.0).alias("lo"),
            ((F.col("bucket") + 1) * 5.0).alias("hi"),
            "n",
        )
    )


@query(
    "agg_entropy",
    oracle="""
    WITH c AS (
      SELECT lang, source, count(*) AS cnt FROM documents GROUP BY 1, 2
    ),
    p AS (
      SELECT lang, cnt,
             CAST(cnt AS DOUBLE) / sum(cnt) OVER (PARTITION BY lang) AS p
      FROM c
    )
    SELECT lang, count(*) AS n_sources,
           -round(sum(p * ln(p)), 6) AS entropy,
           CASE WHEN count(*) > 1
                THEN round(-round(sum(p * ln(p)), 6) / ln(count(*)), 6)
           END AS norm_entropy
    FROM p
    GROUP BY lang
    """,
)
def agg_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of the source mixture per language — the
    corpus-composition diagnostic a training pipeline tracks to detect
    mixture drift (norm_entropy 1.0 = perfectly balanced sources).

    One exchange on lang serves both the per-(lang, source) count and
    the window total; p = cnt/total is a long/long division (identical
    doubles cross-engine), and the entropy sum is rounded at 6 digits
    before the normalizing division (registry float doctrine)."""
    from pyspark.sql import Window as W

    d = Tables(spark, sf_dir).documents
    c = d.groupBy("lang", "source").agg(F.count("*").alias("cnt"))
    p = c.select(
        "lang",
        (F.col("cnt") / F.sum("cnt").over(W.partitionBy("lang"))).alias("p"),
    )
    ent = -F.round(F.sum(F.col("p") * F.log("p")), 6)
    return (
        p.groupBy("lang")
        .agg(
            F.count("*").alias("n_sources"),
            ent.alias("entropy"),
        )
        .withColumn(
            "norm_entropy",
            F.when(
                F.col("n_sources") > 1,
                F.round(F.col("entropy") / F.log(F.col("n_sources").cast("double")), 6),
            ),
        )
    )


@query(
    "agg_crosstab",
    oracle="""
    SELECT c_mktsegment,
           count(*) FILTER (WHERE o_orderstatus = 'F') AS cnt_f,
           count(*) FILTER (WHERE o_orderstatus = 'O') AS cnt_o,
           count(*) FILTER (WHERE o_orderstatus = 'P') AS cnt_p,
           count(*) AS total
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
    tags=("relational", "agg"),
)
def agg_crosstab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pd.crosstab(c_mktsegment, o_orderstatus): contingency table of
    order status by customer segment, spelled as conditional counts
    over a static status domain ('F','O','P') so no distinct-collect
    job runs and the output schema is static (a pivot without values
    triggers a blocking distinct scan — never do that on a 100 TB fact
    table). ``total`` is count(*) — it also counts rows whose status is
    NULL/out-of-domain, so the margins stay honest on dirty data (a
    pivot-column sum would silently drop them; round-6 null sweep).
    The join broadcasts the customer dim under AQE; conditional counts
    partial-aggregate map-side, so the exchange carries
    |segments|x|statuses| cells, not rows."""
    t = Tables(spark, sf_dir)
    j = t.orders.join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
    return j.groupBy("c_mktsegment").agg(
        F.count_if(F.col("o_orderstatus") == "F").alias("cnt_f"),
        F.count_if(F.col("o_orderstatus") == "O").alias("cnt_o"),
        F.count_if(F.col("o_orderstatus") == "P").alias("cnt_p"),
        F.count("*").alias("total"),
    )


@query(
    "agg_stringagg",
    oracle="""
    SELECT user_id,
           string_agg(event_type, ',' ORDER BY event_id) AS type_seq,
           count(*) AS n
    FROM events GROUP BY user_id
    """,
    tags=("agg",),
)
def agg_stringagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (SQL LISTAGG / pandas
    ``groupby.agg(','.join)``): the per-key event-type sequence in
    event_id order — the session-path feature a behavioral model
    consumes. Spelled engine-portably as sort_array(collect_list(
    struct(order, val))) -> transform -> array_join, which pins the
    concatenation order deterministically (a bare collect_list order is
    partition-arrival nondeterminism). One hash-agg exchange; the
    struct array materializes per GROUP, so memory is bounded by the
    key's own row count (same envelope as any LISTAGG)."""
    return Tables(spark, sf_dir).events.groupBy("user_id").agg(
        F.expr(
            "array_join(transform(array_sort(collect_list("
            "struct(event_id, event_type))), x -> x.event_type), ',')"
        ).alias("type_seq"),
        F.expr("count(*)").alias("n"),
    )
