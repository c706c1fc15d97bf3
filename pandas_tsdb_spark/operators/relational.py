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
    # ONE spark.sql() call (r10-opt, catalog.Tables.sql_views).
    v = Tables(spark, sf_dir).sql_views()
    return spark.sql(f"""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS net_price,
           upper(l_returnflag) AS flag,
           l_quantity + 1 AS qty_plus
    FROM {v}lineitem
    """)


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
    """Compound boolean mask: AND/OR/NOT, IN, BETWEEN (pandas df[mask]).
    D suffixes keep the BETWEEN bounds double (bare SQL floats parse as
    DECIMAL)."""
    v = Tables(spark, sf_dir).sql_views()
    return spark.sql(f"""
    SELECT * FROM {v}lineitem
    WHERE (l_quantity > 30 OR l_returnflag = 'A')
      AND l_discount BETWEEN 0.02D AND 0.08D
      AND l_linestatus IN ('O', 'F')
      AND NOT (l_returnflag = 'N' AND l_quantity < 5)
    """)


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
    v = Tables(spark, sf_dir).sql_views()
    return spark.sql(f"""
    SELECT o_orderkey, nullif(o_orderstatus, 'P') AS status_or_null,
           coalesce(nullif(o_orderstatus, 'P'), 'PENDING') AS status_filled
    FROM {v}orders
    WHERE nullif(o_orderstatus, 'P') IS NOT NULL
    """)


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
    v = Tables(spark, sf_dir).sql_views()
    return spark.sql(f"""
    SELECT event_id, user_id, event_type, value
    FROM {v}events
    WHERE ts >= TIMESTAMP '2024-01-05 00:00:00'
      AND ts <  TIMESTAMP '2024-01-10 00:00:00'
    """)


@query(
    "distinct_rows",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus, l_shipdate FROM lineitem",
)
def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """drop_duplicates() over a projection."""
    v = Tables(spark, sf_dir).sql_views()
    return spark.sql(
        f"SELECT DISTINCT l_returnflag, l_linestatus, l_shipdate"
        f" FROM {v}lineitem"
    )


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
    v = Tables(spark, sf_dir).sql_views()
    return spark.sql(f"""
    SELECT user_id, event_type, event_id, value FROM (
        SELECT user_id, event_type, event_id, value,
               row_number() OVER (PARTITION BY user_id, event_type
                                  ORDER BY event_id) AS rn
        FROM {v}events
    ) WHERE rn = 1
    """)


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
    # ONE spark.sql() call (r10-opt): sum2 quotient shape mirrors
    # sum2_col operand for operand (cast(sum(bigint) as double)/100.0D).
    v = Tables(spark, sf_dir).sql_views()

    def sum2(col):
        return (
            f"cast(sum(cast(round({col} * 100) as bigint)) as double)"
            f" / 100.0D"
        )

    return spark.sql(f"""
    SELECT {sum2('l_quantity')} AS sum_qty,
           {sum2('l_extendedprice')} AS sum_price,
           ({sum2('l_extendedprice')}) / count(*) AS avg_price,
           min(l_extendedprice) AS min_price,
           max(l_extendedprice) AS max_price,
           count(*) AS n_rows
    FROM {v}lineitem
    """)


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
    v = Tables(spark, sf_dir).sql_views()
    return spark.sql(f"""
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS n_parts,
           count(DISTINCT l_suppkey) AS n_supps,
           count(*) AS n_rows
    FROM {v}lineitem GROUP BY l_returnflag
    """)


@query("agg_approx_distinct", oracle=None)  # approximate by design: rows-only
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx nunique (HyperLogLog++) — the 100 TB path where exact
    distinct would shuffle every key. Value is approximate, so no oracle;
    tests assert it within rsd of the exact count instead."""
    v = Tables(spark, sf_dir).sql_views()
    return spark.sql(f"""
    SELECT l_returnflag,
           approx_count_distinct(l_partkey, 0.02D) AS approx_parts,
           count(*) AS n_rows
    FROM {v}lineitem GROUP BY l_returnflag
    """)


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
    # ONE spark.sql() call (r10-opt): same exact integer moments
    # (DECIMAL(38,0) sums), same association order.
    v = Tables(spark, sf_dir).sql_views()
    sum_pc = "CAST(sum(CAST(pc AS DECIMAL(38,0))) AS DOUBLE)"
    sum_pc2 = "CAST(sum(CAST(pc * pc AS DECIMAL(38,0))) AS DOUBLE)"
    var_c2 = (
        f"({sum_pc2} - {sum_pc} * {sum_pc} / count(*)) / (count(*) - 1)"
    )
    return spark.sql(f"""
    WITH c AS (
      SELECT l_returnflag, l_extendedprice,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS pc
      FROM {v}lineitem
    )
    SELECT l_returnflag,
           round(sqrt({var_c2}) / 100.0D, 4) AS sd_price,
           round(({var_c2}) / 10000.0D, 4) AS var_price,
           round(percentile(l_extendedprice, 0.5D), 4) AS median_price,
           round(percentile(l_extendedprice, 0.9D), 4) AS p90_price,
           count(*) AS n
    FROM c GROUP BY l_returnflag
    """)


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
    v = Tables(spark, sf_dir).sql_views()
    return spark.sql(f"""
    SELECT l_returnflag,
           round(skewness(l_quantity), 4) + 0.0D AS skew_qty,
           round(kurtosis(l_quantity), 4) + 0.0D AS kurt_qty
    FROM {v}lineitem GROUP BY l_returnflag
    """)


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
    # ONE spark.sql() call (r10-opt): same finest-grain base + three
    # re-aggregations, UNION ALL in the same level order.
    v = Tables(spark, sf_dir).sql_views()
    return spark.sql(f"""
    WITH base AS (
      SELECT l_returnflag, l_linestatus,
             sum(l_quantity) AS sq, count(*) AS cnt
      FROM {v}lineitem GROUP BY l_returnflag, l_linestatus
    )
    SELECT l_returnflag, l_linestatus,
           round(sq, 2) AS sum_qty, cnt AS n
    FROM base
    UNION ALL
    SELECT l_returnflag, CAST(NULL AS STRING) AS l_linestatus,
           round(sum(sq), 2) AS sum_qty, sum(cnt) AS n
    FROM base GROUP BY l_returnflag
    UNION ALL
    SELECT CAST(NULL AS STRING) AS l_returnflag, l_linestatus,
           round(sum(sq), 2) AS sum_qty, sum(cnt) AS n
    FROM base GROUP BY l_linestatus
    UNION ALL
    SELECT CAST(NULL AS STRING) AS l_returnflag,
           CAST(NULL AS STRING) AS l_linestatus,
           round(sum(sq), 2) AS sum_qty,
           coalesce(sum(cnt), CAST(0 AS BIGINT)) AS n
    FROM base
    """)


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
    # ONE spark.sql() call (r10-opt): explicit-values PIVOT compiles to
    # the same single-pass conditional aggregate as .pivot(values).
    v = Tables(spark, sf_dir).sql_views()
    in_list = ", ".join(f"'{t}' AS {t}" for t in _EVENT_TYPES)
    return spark.sql(f"""
    SELECT * FROM (SELECT user_id, event_type, value FROM {v}events)
    PIVOT (round(sum(value) * 100) / 100.0D FOR event_type IN ({in_list}))
    """)


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
    v = Tables(spark, sf_dir).sql_views()
    return spark.sql(f"""
    SELECT l_returnflag,
           CAST(sum(CASE WHEN l_discount > 0.05D
                         THEN CAST(round(l_extendedprice * 100) AS BIGINT)
                         ELSE CAST(0 AS BIGINT) END) AS DOUBLE) / 100.0D
               AS high_disc_rev,
           count(CASE WHEN l_quantity > 25 THEN 1 END) AS n_big,
           round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2)
             / count(CASE WHEN l_linestatus = 'O' THEN 1 END)
               AS avg_open_qty
    FROM {v}lineitem GROUP BY l_returnflag
    """)


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
    v = Tables(spark, sf_dir).sql_views()
    return spark.sql(f"""
    SELECT user_id,
           array_join(array_sort(collect_set(event_type)), ',') AS types,
           count(*) AS n
    FROM {v}events GROUP BY user_id
    """)


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
    # ONE spark.sql() call (r10-opt): same 1-row broadcast cross join.
    v = Tables(spark, sf_dir).sql_views()
    return spark.sql(f"""
    WITH total AS (SELECT count(*) AS tot FROM {v}events)
    SELECT /*+ BROADCAST(total) */ event_type, n,
           CAST(n AS DOUBLE) / tot AS frac
    FROM (SELECT event_type, count(*) AS n FROM {v}events
          GROUP BY event_type)
    CROSS JOIN total
    """)


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
    v = Tables(spark, sf_dir).sql_views()
    return spark.sql(f"""
    SELECT user_id,
           bool_and(value > 0.5D) AS all_gt_half,
           bool_or(value > 300) AS any_gt300,
           count_if(value > 100) AS n_gt100,
           count_if(event_type = 'error') AS n_err
    FROM {v}events GROUP BY user_id
    """)


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
    v = Tables(spark, sf_dir).sql_views()
    return spark.sql(f"""
    SELECT event_id, user_id, event_type, value, hour(ts) AS hh
    FROM {v}events
    WHERE hour(ts) * 60 + minute(ts) BETWEEN 570 AND 960
    """)


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
    v = Tables(spark, sf_dir).sql_views()
    return spark.sql(f"""
    SELECT bucket, bucket * 5.0D AS lo, (bucket + 1) * 5.0D AS hi, n
    FROM (
      SELECT least(CAST(floor(l_quantity / 5.0D) AS INT), 9) AS bucket,
             count(*) AS n
      FROM {v}lineitem
      GROUP BY least(CAST(floor(l_quantity / 5.0D) AS INT), 9)
    )
    """)


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
    # ONE spark.sql() call (r10-opt): same one-exchange shape; the
    # norm division reuses the rounded entropy exactly as withColumn
    # did (CTE stage).
    v = Tables(spark, sf_dir).sql_views()
    return spark.sql(f"""
    WITH c AS (
      SELECT lang, source, count(*) AS cnt FROM {v}documents
      GROUP BY lang, source
    ),
    p AS (
      SELECT lang,
             cnt / sum(cnt) OVER (PARTITION BY lang) AS p
      FROM c
    ),
    e AS (
      SELECT lang, count(*) AS n_sources,
             -round(sum(p * ln(p)), 6) AS entropy
      FROM p GROUP BY lang
    )
    SELECT lang, n_sources, entropy,
           CASE WHEN n_sources > 1
                THEN round(entropy / ln(CAST(n_sources AS DOUBLE)), 6)
           END AS norm_entropy
    FROM e
    """)


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
    v = Tables(spark, sf_dir).sql_views()
    return spark.sql(f"""
    SELECT c_mktsegment,
           count_if(o_orderstatus = 'F') AS cnt_f,
           count_if(o_orderstatus = 'O') AS cnt_o,
           count_if(o_orderstatus = 'P') AS cnt_p,
           count(*) AS total
    FROM {v}orders JOIN {v}customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """)


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
    v = Tables(spark, sf_dir).sql_views()
    return spark.sql(f"""
    SELECT user_id,
           array_join(transform(array_sort(collect_list(
               struct(event_id, event_type))), x -> x.event_type), ',')
             AS type_seq,
           count(*) AS n
    FROM {v}events GROUP BY user_id
    """)
