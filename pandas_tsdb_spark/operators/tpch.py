"""TPC-H composite query shapes (beyond q3/q5 in analytics.py).

Reference basis: the public TPC-H specification (the fixtures are the
driver's reduced TPC-H-ish tables, TESTDATA.md). Columns the fixtures
lack (l_commitdate, l_receiptdate, l_shipmode, partsupp) force two
adaptations, noted per-query. These queries exist to exercise the
planner shapes that dominate a 100 TB warehouse: scan-heavy single-pass
aggregation (q6), broadcast dim join with residual OR predicates (q19),
semi-join decorrelation (q4), fact-fact join + top-k (q10, q18), and a
conditional-aggregate ratio (q14).

Scale notes:
- q6 is the canonical pushdown test: every predicate reaches the
  parquet scan (PushedFilters), output is ONE row — at 100 TB the job
  is scan-bound, zero shuffle beyond the final partial-agg merge.
- q14/q19 join a huge fact against `part` — a dimension that stays
  broadcast-size (millions of rows ≪ executor memory) at any SF, so
  Catalyst picks BroadcastHashJoin and the fact table never shuffles.
- q4's EXISTS becomes a left-semi join; Spark builds the hash side on
  the filtered orders slice, not the full lineitem.
- q18's having-clause-on-sum aggregates lineitem BEFORE joining
  orders/customer, so the expensive join sees only the tiny qualifying
  key set (the same partial-agg-first shape the TPC-H spec intends).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pandas_tsdb_spark.catalog import Tables
from pandas_tsdb_spark.registry import query, sum2_col

# ---------------------------------------------------------------- q6


# Exact integer revenue units: 2dp x 2dp factors make revenue a
# 4-decimal quantity, and round(sum(<4dp floats>), 2) can land on a
# GENUINE x.xx50 tie that engine accumulation noise resolves either
# way (hit at sf0.1 on q9; odds ~1/100 per output group). Revenue
# sums therefore accumulate in integer e4 units (cents x percent) —
# bit-identical across engines — and divide by 1e4 ONCE at the end
# (emitted raw: the quotient of identical doubles is identical).
_E4_NET_SQL = (
    "CAST(round({p}l_extendedprice * 100) AS BIGINT)"
    " * (100 - CAST(round({p}l_discount * 100) AS BIGINT))"
)
_E4_DISCREV_SQL = (
    "CAST(round({p}l_extendedprice * 100) AS BIGINT)"
    " * CAST(round({p}l_discount * 100) AS BIGINT)"
)


def _ext_c() -> F.Column:
    return F.round(F.col("l_extendedprice") * 100).cast("long")


def _disc_c() -> F.Column:
    return F.round(F.col("l_discount") * 100).cast("long")


def _net_e4() -> F.Column:
    return _ext_c() * (F.lit(100) - _disc_c())


def _discrev_e4() -> F.Column:
    return _ext_c() * _disc_c()


def _e4_out(c: F.Column) -> F.Column:
    return c.cast("double") / F.lit(10000.0)


@query(
    "tpch_q6",
    oracle="""
    SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * CAST(round(l_discount * 100) AS BIGINT))
                AS DOUBLE) / 10000.0 AS revenue,
           count(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    tags=("analytics", "tpch"),
)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change): pure scan+filter+global
    agg. All four predicates push into the parquet scan (row-group
    min/max pruning on l_shipdate); the aggregate is a map-side partial
    sum merged once — the cheapest possible 100 TB query shape."""
    # ONE spark.sql() call (r9-opt, catalog.Tables.sql_views): ~83 ms
    # of per-call plan construction -> ~30 ms; same pushed-filter scan
    # + partial/final agg. D-suffixed float literals (bare SQL floats
    # parse as DECIMAL and would change the comparison tree).
    v = Tables(spark, sf_dir).sql_views()
    return spark.sql(f"""
    SELECT cast(sum(cast(round(l_extendedprice * 100) as bigint)
                    * cast(round(l_discount * 100) as bigint))
                as double) / 10000.0D AS revenue,
           count(*) AS n_rows
    FROM {v}lineitem
    WHERE l_shipdate >= cast('1996-01-01 00:00:00' as timestamp)
      AND l_shipdate < cast('1997-01-01 00:00:00' as timestamp)
      AND l_discount BETWEEN 0.05D AND 0.07D
      AND l_quantity < 24
    """)


# ---------------------------------------------------------------- q4


@query(
    "tpch_q4",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    """,
    tags=("analytics", "tpch"),
)
def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (order priority checking), adapted: the spec's
    l_commitdate < l_receiptdate late-flag doesn't exist in the
    fixtures, so "late" = some lineitem shipped >60 days after the
    order date. The EXISTS is expressed directly as a left-semi join —
    no decorrelation pass needed, no duplicate-orderkey inflation, and
    the quarter filter shrinks the orders build side before the join."""
    # ONE spark.sql() call (r10-opt): EXISTS plans as the same
    # left-semi join over the quarter-pruned orders slice.
    v = Tables(spark, sf_dir).sql_views()
    return spark.sql(f"""
    SELECT o_orderpriority, count(*) AS order_count
    FROM {v}orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM {v}lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    """)


# ---------------------------------------------------------------- q10


@query(
    "tpch_q10",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS DOUBLE) / 10000.0 AS revenue,
           c.c_acctbal, n.n_name
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("analytics", "tpch"),
)
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned item reporting), trimmed to fixture columns:
    top-20 customers by revenue lost to returns in one quarter. The
    orders quarter predicate prunes the fact scan; nation broadcasts;
    the top-20 runs as TakeOrderedAndProject with a c_custkey
    tie-break so LIMIT is deterministic cross-engine."""
    # ONE spark.sql() call (r10-opt): mirrors the oracle text.
    v = Tables(spark, sf_dir).sql_views()
    return spark.sql(f"""
    SELECT c.c_custkey, c.c_name,
           CAST(sum({_E4_NET_SQL.format(p='l.')}) AS DOUBLE) / 10000.0D
             AS revenue,
           c.c_acctbal, n.n_name
    FROM {v}customer c
    JOIN {v}orders o ON c.c_custkey = o.o_custkey
    JOIN {v}lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN {v}nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """)


# ---------------------------------------------------------------- q14


@query(
    "tpch_q14",
    oracle="""
    SELECT 100.0 * CAST(sum(CASE WHEN p.p_type = 'PROMO'
                     THEN CAST(round(l.l_extendedprice * 100) AS BIGINT)
                          * (100 - CAST(round(l.l_discount * 100) AS BIGINT))
                     ELSE 0 END) AS DOUBLE)
               / CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                          * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
                      AS DOUBLE)
               AS promo_revenue_pct,
           count(*) AS n_rows
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1996-10-01 00:00:00'
    """,
    tags=("analytics", "tpch"),
)
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): conditional-aggregate ratio over a
    fact⋈dim join. `part` broadcasts (dimension stays executor-memory
    size at any SF) so lineitem never shuffles; the month predicate
    prunes the scan. Float discipline: numerator and denominator are
    exact integer e4 sums (module helpers) — bit-identical across
    engines — and the ratio/scale ops are then single IEEE ops, also
    bit-identical."""
    # ONE spark.sql() call (r10-opt): BROADCAST hint keeps the part
    # dim on the build side; mirrors the oracle text.
    v = Tables(spark, sf_dir).sql_views()
    return spark.sql(f"""
    SELECT /*+ BROADCAST(p) */
           100.0D * CAST(sum(CASE WHEN p.p_type = 'PROMO'
                     THEN {_E4_NET_SQL.format(p='l.')}
                     ELSE CAST(0 AS BIGINT) END) AS DOUBLE)
               / CAST(sum({_E4_NET_SQL.format(p='l.')}) AS DOUBLE)
               AS promo_revenue_pct,
           count(*) AS n_rows
    FROM {v}lineitem l
    JOIN {v}part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1996-10-01 00:00:00'
    """)


# ---------------------------------------------------------------- q18


@query(
    "tpch_q18",
    oracle="""
    WITH big AS (
      SELECT l_orderkey, sum(l_quantity) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING sum(l_quantity) > 250.5
    )
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           o.o_orderdate AS o_orderdate, o.o_totalprice,
           round(big.sum_qty, 2) AS sum_qty
    FROM big
    JOIN orders o ON o.o_orderkey = big.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
    tags=("analytics", "tpch"),
)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customer): aggregate lineitem FIRST,
    keep only orders whose total quantity clears the threshold, then
    join the (tiny) qualifying key set to orders and customer. At
    100 TB the partial agg collapses lineitem map-side; the expensive
    3-way join only ever sees the handful of qualifying orders — the
    aggregate-before-join shape the spec's HAVING intends."""
    # ONE spark.sql() call (r10-opt): mirrors the oracle text.
    v = Tables(spark, sf_dir).sql_views()
    return spark.sql(f"""
    WITH big AS (
      SELECT l_orderkey, sum(l_quantity) AS raw_qty
      FROM {v}lineitem GROUP BY l_orderkey
      HAVING sum(l_quantity) > 250.5D
    )
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           o.o_orderdate AS o_orderdate, o.o_totalprice,
           round(big.raw_qty, 2) AS sum_qty
    FROM big
    JOIN {v}orders o ON o.o_orderkey = big.l_orderkey
    JOIN {v}customer c ON c.c_custkey = o.o_custkey
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """)


# ---------------------------------------------------------------- q19


@query(
    "tpch_q19",
    oracle="""
    SELECT CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
                AS DOUBLE) / 10000.0 AS revenue,
           count(*) AS n_rows
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#3'
           AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 15)
       OR (p.p_brand = 'Brand#13'
           AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 25)
       OR (p.p_brand = 'Brand#23'
           AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 35)
    """,
    tags=("analytics", "tpch"),
)
def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue): equi-join on partkey with a
    disjunctive residual predicate mixing both sides. Catalyst keeps
    the equi-key in a BroadcastHashJoin and evaluates the OR as a
    post-join filter; the p_brand IN (...) implied by the OR is pushed
    to the part side, shrinking the broadcast build."""
    # ONE spark.sql() call (r10-opt): BROADCAST hint keeps part on the
    # build side; mirrors the oracle text.
    v = Tables(spark, sf_dir).sql_views()
    return spark.sql(f"""
    SELECT /*+ BROADCAST(p) */
           CAST(sum({_E4_NET_SQL.format(p='l.')}) AS DOUBLE) / 10000.0D
             AS revenue,
           count(*) AS n_rows
    FROM {v}lineitem l
    JOIN {v}part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#3'
           AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 15)
       OR (p.p_brand = 'Brand#13'
           AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 25)
       OR (p.p_brand = 'Brand#23'
           AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 35)
    """)


# ---------------------------------------------------------------- q8


@query(
    "tpch_q8",
    oracle="""
    SELECT year(o.o_orderdate) AS o_year,
           100.0 * CAST(sum(CASE WHEN sn.n_name = 'NATION_3'
                       THEN CAST(round(l.l_extendedprice * 100) AS BIGINT)
                            * (100 - CAST(round(l.l_discount * 100) AS BIGINT))
                       ELSE 0 END) AS DOUBLE)
                 / CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                            * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
                        AS DOUBLE)
               AS mkt_share_pct,
           count(*) AS n_rows
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
    JOIN region r   ON cn.n_regionkey = r.r_regionkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
    WHERE r.r_name = 'EUROPE'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY year(o.o_orderdate)
    """,
    tags=("analytics", "tpch"),
)
def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share), adapted to fixture columns:
    per order-year share of European-customer revenue supplied by one
    nation. Joins nation TWICE (customer side for the region filter,
    supplier side for the share bucket) — both broadcast, disambiguated
    by renamed projections rather than alias resolution. The only
    shuffle moving data is the final year group-by of partial sums;
    both ratio legs are exact integer e4 sums (module helpers) so the
    division is bit-identical cross-engine."""
    # ONE spark.sql() call (r10-opt): BROADCAST hints carry the dim
    # decisions (nation twice via aliases); mirrors the oracle text.
    v = Tables(spark, sf_dir).sql_views()
    return spark.sql(f"""
    SELECT /*+ BROADCAST(cn, r, s, sn) */
           year(o.o_orderdate) AS o_year,
           100.0D * CAST(sum(CASE WHEN sn.n_name = 'NATION_3'
                       THEN {_E4_NET_SQL.format(p='l.')}
                       ELSE CAST(0 AS BIGINT) END) AS DOUBLE)
                 / CAST(sum({_E4_NET_SQL.format(p='l.')}) AS DOUBLE)
               AS mkt_share_pct,
           count(*) AS n_rows
    FROM {v}lineitem l
    JOIN {v}orders o   ON l.l_orderkey = o.o_orderkey
    JOIN {v}customer c ON o.o_custkey = c.c_custkey
    JOIN {v}nation cn  ON c.c_nationkey = cn.n_nationkey
    JOIN {v}region r   ON cn.n_regionkey = r.r_regionkey
    JOIN {v}supplier s ON l.l_suppkey = s.s_suppkey
    JOIN {v}nation sn  ON s.s_nationkey = sn.n_nationkey
    WHERE r.r_name = 'EUROPE'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY year(o.o_orderdate)
    """)


# ---------------------------------------------------------------- q22


@query(
    "tpch_q22",
    oracle="""
    SELECT c.c_mktsegment, count(*) AS n_cust,
           CAST(sum(CAST(round(c.c_acctbal * 100) AS BIGINT)) AS DOUBLE)
             / 100.0 AS total_bal
    FROM customer c
    WHERE c.c_acctbal > (
        SELECT CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS DOUBLE)
                 / 100.0 / count(*)
        FROM customer WHERE c_acctbal > 0
      )
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
      )
    GROUP BY c.c_mktsegment
    """,
    tags=("analytics", "tpch"),
)
def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity), adapted: LAPSED well-funded
    customers — balance above the positive-balance average, no order in
    the final data year (every fixture customer has SOME order, so the
    spec's never-ordered predicate is vacuous here). The scalar
    subquery becomes a 1-row aggregate broadcast-cross-joined into the
    filter (no recompute per row); the NOT EXISTS is a left-anti join
    against the date-pruned orders slice. The threshold is an exact
    integer-cents sum / count — bit-identical in both engines at any
    customer count — so the strict > comparison against exact
    2-decimal balances can't straddle engine noise."""
    # ONE spark.sql() call (r10-opt): the scalar subquery plans as a
    # 1-row broadcast, the NOT EXISTS as the same left-anti join.
    v = Tables(spark, sf_dir).sql_views()
    return spark.sql(f"""
    SELECT c.c_mktsegment, count(*) AS n_cust,
           CAST(sum(CAST(round(c.c_acctbal * 100) AS BIGINT)) AS DOUBLE)
             / 100.0D AS total_bal
    FROM {v}customer c
    WHERE c.c_acctbal > (
        SELECT CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS DOUBLE)
                 / 100.0D / count(*)
        FROM {v}customer WHERE c_acctbal > 0
      )
      AND NOT EXISTS (
        SELECT 1 FROM {v}orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
      )
    GROUP BY c.c_mktsegment
    """)


# ---------------------------------------------------------------- q7


@query(
    "tpch_q7",
    oracle="""
    SELECT cust_nation, supp_nation, l_year,
           CAST(sum(volume_e4) AS DOUBLE) / 10000.0 AS revenue
    FROM (
      SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
             year(l.l_shipdate) AS l_year,
             CAST(round(l.l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l.l_discount * 100) AS BIGINT)) AS volume_e4
      FROM lineitem l
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
      WHERE ((cn.n_name = 'NATION_1' AND sn.n_name = 'NATION_2')
          OR (cn.n_name = 'NATION_2' AND sn.n_name = 'NATION_1'))
        AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    )
    GROUP BY cust_nation, supp_nation, l_year
    """,
    tags=("analytics", "tpch"),
)
def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping): bilateral trade revenue between two
    nations per ship-year. Both nation legs broadcast; the disjunctive
    nation-pair predicate lands as a post-join filter on broadcast
    hash joins, so at 100 TB only the two-year l_shipdate slice of
    lineitem moves, and only into the final 4-group aggregation."""
    # ONE spark.sql() call (r10-opt): BROADCAST hints on both nation
    # legs + supplier; mirrors the oracle text.
    v = Tables(spark, sf_dir).sql_views()
    return spark.sql(f"""
    SELECT cust_nation, supp_nation, l_year,
           CAST(sum(volume_e4) AS DOUBLE) / 10000.0D AS revenue
    FROM (
      SELECT /*+ BROADCAST(cn, s, sn) */
             cn.n_name AS cust_nation, sn.n_name AS supp_nation,
             year(l.l_shipdate) AS l_year,
             {_E4_NET_SQL.format(p='l.')} AS volume_e4
      FROM {v}lineitem l
      JOIN {v}orders o   ON l.l_orderkey = o.o_orderkey
      JOIN {v}customer c ON o.o_custkey = c.c_custkey
      JOIN {v}nation cn  ON c.c_nationkey = cn.n_nationkey
      JOIN {v}supplier s ON l.l_suppkey = s.s_suppkey
      JOIN {v}nation sn  ON s.s_nationkey = sn.n_nationkey
      WHERE ((cn.n_name = 'NATION_1' AND sn.n_name = 'NATION_2')
          OR (cn.n_name = 'NATION_2' AND sn.n_name = 'NATION_1'))
        AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    )
    GROUP BY cust_nation, supp_nation, l_year
    """)


# ---------------------------------------------------------------- q9


@query(
    "tpch_q9",
    oracle="""
    SELECT nation, o_year,
           CAST(sum(amount_e4) AS DOUBLE) / 10000.0 AS sum_profit
    FROM (
      SELECT sn.n_name AS nation, year(o.o_orderdate) AS o_year,
             CAST(round(l.l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l.l_discount * 100) AS BIGINT))
               - 60 * CAST(round(p.p_retailprice * 100) AS BIGINT)
                    * CAST(l.l_quantity AS BIGINT) AS amount_e4
      FROM lineitem l
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
      JOIN part p     ON l.l_partkey = p.p_partkey
      WHERE p.p_type = 'STANDARD'
    )
    GROUP BY nation, o_year
    """,
    tags=("analytics", "tpch"),
)
def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (product type profit), adapted: the fixtures have no
    partsupp/ps_supplycost, so unit cost is stood in by
    0.6 * p_retailprice (same join/agg shape, different constant).
    part/supplier/nation all broadcast, and they run BEFORE the
    fact-fact orders join on purpose: the selective part filter (1/6 of
    types) rides the broadcast join, so the orders sort-merge sees ~1/6
    of lineitem. Measured at 16×: 6.3 s naive order → 2.9 s. (A
    shuffle_hash hint on orders was SLOWER — 5.9 s — the per-partition
    hash build of 2.4M rows costs more than sorting; SMJ is the right
    fact-fact plan here and at 100 TB.) The only large shuffles are the
    pruned fact-fact join and the final (nation, year) aggregation of
    map-side partials.

    Profit is accumulated in EXACT integer e4 units (2dp x 2dp
    factors -> 4-decimal amounts): round(sum(float_amount), 2) hit a
    genuine decimal tie at sf0.1 (a group total landing on x.xx5, the
    engines' accumulation noise resolving it differently) — the sum of
    exact integers is bit-identical, and one final division by 1e4 is
    deterministic on both engines."""
    # ONE spark.sql() call (r10-opt): the join ORDER is preserved (the
    # selective part broadcast prunes lineitem BEFORE the fact-fact
    # orders SMJ — measured 6.3 -> 2.9 s at 16x); BROADCAST hints on
    # part/supplier/nation.
    v = Tables(spark, sf_dir).sql_views()
    return spark.sql(f"""
    SELECT nation, o_year,
           CAST(sum(amount_e4) AS DOUBLE) / 10000.0D AS sum_profit
    FROM (
      SELECT /*+ BROADCAST(p, s, sn) */
             sn.n_name AS nation, year(o.o_orderdate) AS o_year,
             {_E4_NET_SQL.format(p='l.')}
               - 60 * CAST(round(p.p_retailprice * 100) AS BIGINT)
                    * CAST(l.l_quantity AS BIGINT) AS amount_e4
      FROM {v}lineitem l
      JOIN {v}part p     ON l.l_partkey = p.p_partkey
      JOIN {v}supplier s ON l.l_suppkey = s.s_suppkey
      JOIN {v}nation sn  ON s.s_nationkey = sn.n_nationkey
      JOIN {v}orders o   ON l.l_orderkey = o.o_orderkey
      WHERE p.p_type = 'STANDARD'
    )
    GROUP BY nation, o_year
    """)


# ---------------------------------------------------------------- q12


@query(
    "tpch_q12",
    oracle="""
    SELECT l.l_linestatus,
           count(*) FILTER (WHERE o.o_orderpriority IN ('1-URGENT', '2-HIGH'))
             AS high_line_count,
           count(*) FILTER (WHERE o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))
             AS low_line_count
    FROM orders o
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
    GROUP BY l.l_linestatus
    """,
    tags=("analytics", "tpch"),
)
def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (shipping mode / priority), adapted: no l_shipmode or
    l_receiptdate in the fixtures, so the bucket is l_linestatus and
    "late" = shipped >30 days after order date. Exercises the
    conditional-count pivot over a fact-fact join where one predicate
    (ship year) pushes into the scan and the other (lateness) is a
    cross-table residual evaluated post-join."""
    # ONE spark.sql() call (r10-opt): mirrors the oracle text (FILTER
    # counts == the sum(CASE) pair they replace on never-null inputs).
    v = Tables(spark, sf_dir).sql_views()
    return spark.sql(f"""
    SELECT l.l_linestatus,
           count(*) FILTER (WHERE o.o_orderpriority
                            IN ('1-URGENT', '2-HIGH')) AS high_line_count,
           count(*) FILTER (WHERE o.o_orderpriority
                            NOT IN ('1-URGENT', '2-HIGH')) AS low_line_count
    FROM {v}orders o
    JOIN {v}lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
    GROUP BY l.l_linestatus
    """)


# ---------------------------------------------------------------- q13


@query(
    "tpch_q13",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '5-LOW'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
    tags=("analytics", "tpch"),
)
def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer distribution): histogram of per-customer
    order counts, keeping zero-order customers via the outer join
    (the spec's comment-pattern exclusion becomes a priority
    exclusion — fixtures have no o_comment). Double aggregation:
    the first groupBy shuffles on custkey (same key as the join, so
    AQE coalesces into one exchange); the second is a ~10-group
    rollup of partials — negligible at any scale."""
    # ONE spark.sql() call (r10-opt): mirrors the oracle text.
    v = Tables(spark, sf_dir).sql_views()
    return spark.sql(f"""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM {v}customer c
      LEFT JOIN {v}orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '5-LOW'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """)


# ---------------------------------------------------------------- q15


@query(
    "tpch_q15",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey,
             sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                 * (100 - CAST(round(l_discount * 100) AS BIGINT)))
               AS rev_e4
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           CAST(r.rev_e4 AS DOUBLE) / 10000.0 AS total_revenue
    FROM supplier s
    JOIN rev r ON s.s_suppkey = r.l_suppkey
    WHERE r.rev_e4 = (SELECT max(rev_e4) FROM rev)
    """,
    tags=("analytics", "tpch"),
)
def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): quarter revenue per supplier, keep the
    max. The scalar-subquery max becomes a 1-row aggregate broadcast
    cross-joined into the filter — rev is computed once and reused for
    both legs (Spark reuses the exchange under AQE). The max-equality
    compares exact INTEGER e4 revenues (module helpers), so the float
    tie problem cannot arise at any scale; the double quotient is
    emitted only as output."""
    # ONE spark.sql() call (r10-opt): the scalar-subquery max plans as
    # the same 1-row broadcast over the reused rev exchange.
    v = Tables(spark, sf_dir).sql_views()
    return spark.sql(f"""
    WITH rev AS (
      SELECT l_suppkey, sum({_E4_NET_SQL.format(p='')}) AS rev_e4
      FROM {v}lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT /*+ BROADCAST(s) */ s.s_suppkey, s.s_name,
           CAST(r.rev_e4 AS DOUBLE) / 10000.0D AS total_revenue
    FROM {v}supplier s
    JOIN rev r ON s.s_suppkey = r.l_suppkey
    WHERE r.rev_e4 = (SELECT max(rev_e4) FROM rev)
    """)


# ---------------------------------------------------------------- q16


@query(
    "tpch_q16",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM part p
    JOIN lineitem l ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#3'
      AND p.p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
    tags=("analytics", "tpch"),
)
def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (parts/supplier relationship), adapted: partsupp is
    stood in by the lineitem part↔supplier pairs, and the spec's
    complaint-supplier exclusion becomes a negative-balance exclusion.
    The NOT IN is a left-anti broadcast join (tiny exclusion set); the
    distinct-count triggers Spark's two-phase distinct-aggregate
    expansion — partial distinct on (group, suppkey), then final
    count — the scalable plan for COUNT(DISTINCT) at 100 TB."""
    # ONE spark.sql() call (r10-opt): anti join first (tiny exclusion
    # broadcast), then the filtered part broadcast — same plan order.
    v = Tables(spark, sf_dir).sql_views()
    return spark.sql(f"""
    SELECT /*+ BROADCAST(bad, p) */
           p.p_brand, p.p_type, p.p_size,
           count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM {v}lineitem l
    LEFT ANTI JOIN (SELECT s_suppkey FROM {v}supplier
                    WHERE s_acctbal < 0) bad
      ON l.l_suppkey = bad.s_suppkey
    JOIN {v}part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#3'
      AND p.p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """)


# ---------------------------------------------------------------- q17


@query(
    "tpch_q17",
    oracle="""
    WITH li_b AS (
      SELECT l.l_partkey, l.l_quantity, l.l_extendedprice
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_brand = 'Brand#3'
    ),
    thr AS (
      SELECT l_partkey,
             0.2 * (round(sum(l_quantity), 2) / count(*)) AS qty_thr
      FROM li_b GROUP BY l_partkey
    )
    SELECT round(sum(li_b.l_extendedprice), 2) / 7.0 AS avg_yearly,
           count(*) AS n_rows
    FROM li_b
    JOIN thr ON li_b.l_partkey = thr.l_partkey
    WHERE li_b.l_quantity < thr.qty_thr
    """,
    tags=("analytics", "tpch"),
)
def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue): revenue from lineitems
    below 20% of their part's average quantity. The correlated scalar
    subquery is decorrelated by hand: one pass builds per-part
    thresholds, a second joins them back — both passes shuffle on
    l_partkey, so AQE reuses the exchange. Threshold compare is safe
    cross-engine: round(sum,2)/count then *0.2 are bit-identical IEEE
    ops per registry.py (quantities are integral 1..50)."""
    # ONE spark.sql() call (r10-opt): mirrors the oracle's decorrelated
    # two-pass shape; the li_b CTE inlines into both consumers with
    # canonically-equal subtrees, so AQE still reuses the exchange.
    v = Tables(spark, sf_dir).sql_views()
    return spark.sql(f"""
    WITH li_b AS (
      SELECT /*+ BROADCAST(p) */
             l.l_partkey, l.l_quantity, l.l_extendedprice
      FROM {v}lineitem l
      JOIN {v}part p ON p.p_partkey = l.l_partkey
      WHERE p.p_brand = 'Brand#3'
    ),
    thr AS (
      SELECT l_partkey,
             0.2D * (round(sum(l_quantity), 2) / count(*)) AS qty_thr
      FROM li_b GROUP BY l_partkey
    )
    SELECT round(sum(li_b.l_extendedprice), 2) / 7.0D AS avg_yearly,
           count(*) AS n_rows
    FROM li_b
    JOIN thr ON li_b.l_partkey = thr.l_partkey
    WHERE li_b.l_quantity < thr.qty_thr
    """)


# ---------------------------------------------------------------- q21


@query(
    "tpch_q21",
    oracle="""
    WITH os AS (
      SELECT l.l_suppkey, l.l_orderkey,
             max(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
                      THEN 1 ELSE 0 END) AS late
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderstatus = 'F'
      GROUP BY l.l_suppkey, l.l_orderkey
    ),
    flagged AS (
      SELECT l_suppkey, l_orderkey, late,
             count(*) OVER (PARTITION BY l_orderkey) AS n_supp,
             sum(late) OVER (PARTITION BY l_orderkey) AS n_late
      FROM os
    )
    SELECT s.s_name, count(*) AS numwait
    FROM flagged f
    JOIN supplier s ON s.s_suppkey = f.l_suppkey
    WHERE f.late = 1 AND f.n_supp > 1 AND f.n_late = 1
    GROUP BY s.s_name
    """,
    tags=("analytics", "tpch"),
)
def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting), adapted: no
    l_receiptdate/l_commitdate, so "late" = shipped >60 days after
    order date; the spec's EXISTS / NOT EXISTS pair ("another supplier
    on the order; no OTHER supplier late") collapses to per-order
    window counts over supplier-deduped rows: n_supp > 1 AND
    n_late = 1 AND this supplier late. One shuffle on l_orderkey
    serves the dedup groupBy AND both windows (same partitioning);
    no self-join of the fact table, which is the naive plan's killer
    at 100 TB."""
    # ONE spark.sql() call (r10-opt): REPARTITION hint carries the
    # explicit l_orderkey exchange that the dedup groupBy and both
    # windows share; supplier broadcast by hint.
    v = Tables(spark, sf_dir).sql_views()
    return spark.sql(f"""
    WITH j AS (
      SELECT /*+ REPARTITION(l_orderkey) */
             l.l_suppkey, l.l_orderkey, l.l_shipdate, o.o_orderdate
      FROM {v}lineitem l
      JOIN {v}orders o ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderstatus = 'F'
    ),
    os AS (
      SELECT l_suppkey, l_orderkey,
             max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                      THEN 1 ELSE 0 END) AS late
      FROM j
      GROUP BY l_suppkey, l_orderkey
    ),
    flagged AS (
      SELECT l_suppkey, l_orderkey, late,
             count(*) OVER (PARTITION BY l_orderkey) AS n_supp,
             sum(late) OVER (PARTITION BY l_orderkey) AS n_late
      FROM os
    )
    SELECT /*+ BROADCAST(s) */ s.s_name, count(*) AS numwait
    FROM flagged f
    JOIN {v}supplier s ON s.s_suppkey = f.l_suppkey
    WHERE f.late = 1 AND f.n_supp > 1 AND f.n_late = 1
    GROUP BY s.s_name
    """)


# ------------------------------------------------- derived partsupp
# The fixtures have no partsupp table; q2/q11/q20 stand it in with the
# distinct (l_partkey, l_suppkey) pairs of lineitem:
#   ps_availqty      := sum(l_quantity)            (integral -> exact long)
#   ps_supplycost_c  := min(price) in INTEGER CENTS (2-decimal -> exact)
# Both columns are exact integers, so every downstream comparison
# (min-cost equality in q2, share thresholds in q11, excess-stock in
# q20) is integer arithmetic — no float rounding doctrine needed.

_PS_SQL = """
      SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS ps_availqty,
             min(CAST(round(l_extendedprice * 100) AS BIGINT)) AS ps_supplycost_c
      FROM lineitem
      GROUP BY l_partkey, l_suppkey
"""


def _partsupp(t: Tables, li: DataFrame | None = None) -> DataFrame:
    """Derived partsupp over ``li`` (default: full lineitem).

    Callers that only need a dimension-restricted slice MUST pass a
    pre-filtered lineitem: the grouping keys ARE the filter columns
    (partkey/suppkey), so semi-joining the fact table against the
    filtered dimension keys BEFORE this aggregate is semantically
    identical to filtering after it, and shrinks the aggregate's input
    by the dimensions' selectivity — Catalyst will not push a join
    through an aggregation on its own (measured 4.6 s for the full
    38.4M-row aggregate at 64x vs ~0.5 s for a filtered slice)."""
    if li is None:
        li = t.lineitem
    return li.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(
        F.sum(F.col("l_quantity").cast("bigint")).alias("ps_availqty"),
        F.min(F.round(F.col("l_extendedprice") * 100).cast("bigint")).alias(
            "ps_supplycost_c"
        ),
    )


# ---------------------------------------------------------------- q2


@query(
    "tpch_q2",
    oracle=f"""
    WITH ps AS ({_PS_SQL}),
    best AS (
      SELECT p.p_partkey, p.p_name, s.s_name, n.n_name, s.s_acctbal,
             ps.ps_supplycost_c,
             min(ps.ps_supplycost_c) OVER (PARTITION BY p.p_partkey)
               AS min_cost_c
      FROM ps
      JOIN part p ON p.p_partkey = ps.ps_partkey
      JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE p.p_size IN (1, 3, 5, 7) AND p.p_type = 'ECONOMY' AND r.r_name = 'EUROPE'
    )
    SELECT p_partkey, p_name, s_name, n_name, s_acctbal, ps_supplycost_c
    FROM best
    WHERE ps_supplycost_c = min_cost_c
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
    tags=("analytics", "tpch"),
)
def tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (minimum-cost supplier), adapted to a derived partsupp
    (see _PS_SQL: lineitem's part-supplier pairs; supplycost = min price
    in integer cents, so the min-cost equality is exact). The spec's
    correlated min-subquery becomes a window min over p_partkey. All
    four dimensions broadcast, and BOTH dimension filters are pushed
    below the partsupp aggregation as broadcast semi-joins on the fact
    table (filters on grouping keys commute with the groupBy — see
    _partsupp), so the aggregate only ever sees the EUROPE x ECONOMY
    slice; at 100 TB the fact table is touched exactly once and
    aggregated at ~2% selectivity (9.7 -> 0.9 s at 64x)."""
    # ONE spark.sql() call (r10-opt): preserves the tuned structure —
    # both dimension filters push below the partsupp aggregate as
    # broadcast LEFT SEMI joins on the fact table (9.7 -> 0.9 s at
    # 64x), the window min runs over the already-joined slice.
    v = Tables(spark, sf_dir).sql_views()
    return spark.sql(f"""
    WITH dims AS (
      SELECT /*+ BROADCAST(n, r) */
             s_suppkey, s_name, s_acctbal, n_name
      FROM {v}supplier s
      JOIN {v}nation n ON n.n_nationkey = s.s_nationkey
      JOIN {v}region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE'
    ),
    p AS (
      SELECT p_partkey, p_name FROM {v}part
      WHERE p_size IN (1, 3, 5, 7) AND p_type = 'ECONOMY'
    ),
    li AS (
      SELECT /*+ BROADCAST(pk, sk) */
             l.l_partkey, l.l_suppkey, l.l_quantity, l.l_extendedprice
      FROM {v}lineitem l
      LEFT SEMI JOIN (SELECT p_partkey FROM p) pk
        ON l.l_partkey = pk.p_partkey
      LEFT SEMI JOIN (SELECT s_suppkey FROM dims) sk
        ON l.l_suppkey = sk.s_suppkey
    ),
    ps AS (
      SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
             sum(CAST(l_quantity AS BIGINT)) AS ps_availqty,
             min(CAST(round(l_extendedprice * 100) AS BIGINT))
               AS ps_supplycost_c
      FROM li GROUP BY l_partkey, l_suppkey
    ),
    best AS (
      SELECT /*+ BROADCAST(p, dims) */
             p.p_partkey, p.p_name, dims.s_name, dims.n_name,
             dims.s_acctbal, ps.ps_supplycost_c,
             min(ps.ps_supplycost_c) OVER (PARTITION BY p.p_partkey)
               AS min_cost_c
      FROM ps
      JOIN p ON p.p_partkey = ps.ps_partkey
      JOIN dims ON dims.s_suppkey = ps.ps_suppkey
    )
    SELECT p_partkey, p_name, s_name, n_name, s_acctbal, ps_supplycost_c
    FROM best
    WHERE ps_supplycost_c = min_cost_c
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """)


# ---------------------------------------------------------------- q11


@query(
    "tpch_q11",
    oracle=f"""
    WITH ps AS ({_PS_SQL}),
    byp AS (
      SELECT ps.ps_partkey,
             CAST(sum(ps.ps_supplycost_c * ps.ps_availqty) AS BIGINT) AS value_c
      FROM ps
      JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'ASIA'
      GROUP BY ps.ps_partkey
    ),
    tot AS (
      SELECT CAST(sum(value_c) AS BIGINT) AS total_c,
             CAST(count(*) AS BIGINT) AS n_parts
      FROM byp
    )
    SELECT b.ps_partkey, b.value_c,
           round(b.value_c * 1.0 / t.total_c, 9) AS share
    FROM byp b CROSS JOIN tot t
    WHERE b.value_c * t.n_parts > t.total_c
    ORDER BY b.value_c DESC, b.ps_partkey
    LIMIT 100
    """,
    tags=("analytics", "tpch"),
)
def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important stock identification), adapted: derived
    partsupp (_PS_SQL), region slice instead of a single nation (the
    fixture has 4 suppliers/nation), and the spec's fixed share
    threshold (0.0001/SF, not scale-free) replaced by "above-average
    share" — value_c * n_parts > total_c is EXACT integer arithmetic,
    so the threshold never wobbles across engines. The supplier-region
    filter pushes below the partsupp aggregation as a broadcast
    semi-join (grouping-key filter — see _partsupp). The scalar
    subquery is a 1-row aggregate cross-joined back (same pattern as
    q15) with NO explicit broadcast hint: hinting the computed branch
    re-executes its whole subtree per-broadcast, where AQE's runtime
    broadcast reuses byp's exchange for both legs (NOTES.md
    continuation-3 trap; 32 -> 1.5 s at 64x with the semi-join).
    Top-100 by value with a partkey tie-break keeps the LIMIT
    deterministic."""
    # ONE spark.sql() call (r10-opt): preserves the tuned structure —
    # region filter pushed below the partsupp aggregate as a broadcast
    # semi-join; the tot leg carries NO broadcast hint on purpose (the
    # NOTES.md continuation-3 trap: hinting a computed branch
    # re-executes its subtree; AQE's runtime broadcast reuses byp's
    # exchange for both legs).
    v = Tables(spark, sf_dir).sql_views()
    return spark.sql(f"""
    WITH dims AS (
      SELECT /*+ BROADCAST(n, r) */ s_suppkey
      FROM {v}supplier s
      JOIN {v}nation n ON n.n_nationkey = s.s_nationkey
      JOIN {v}region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'ASIA'
    ),
    li AS (
      SELECT /*+ BROADCAST(dims) */
             l.l_partkey, l.l_suppkey, l.l_quantity, l.l_extendedprice
      FROM {v}lineitem l
      LEFT SEMI JOIN dims ON l.l_suppkey = dims.s_suppkey
    ),
    ps AS (
      SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
             sum(CAST(l_quantity AS BIGINT)) AS ps_availqty,
             min(CAST(round(l_extendedprice * 100) AS BIGINT))
               AS ps_supplycost_c
      FROM li GROUP BY l_partkey, l_suppkey
    ),
    byp AS (
      SELECT ps_partkey,
             CAST(sum(ps_supplycost_c * ps_availqty) AS BIGINT) AS value_c
      FROM ps GROUP BY ps_partkey
    ),
    tot AS (
      SELECT CAST(sum(value_c) AS BIGINT) AS total_c,
             CAST(count(*) AS BIGINT) AS n_parts
      FROM byp
    )
    SELECT b.ps_partkey, b.value_c,
           round(b.value_c * 1.0D / t.total_c, 9) AS share
    FROM byp b CROSS JOIN tot t
    WHERE b.value_c * t.n_parts > t.total_c
    ORDER BY b.value_c DESC, b.ps_partkey
    LIMIT 100
    """)


# ---------------------------------------------------------------- q20


@query(
    "tpch_q20",
    oracle="""
    WITH ps AS (
      SELECT l_partkey, l_suppkey,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS availqty,
             CAST(coalesce(sum(CASE
               WHEN l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
                AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
               THEN CAST(l_quantity AS BIGINT) END), 0) AS BIGINT) AS qty96
      FROM lineitem
      GROUP BY l_partkey, l_suppkey
    ),
    excess AS (
      SELECT ps.l_suppkey
      FROM ps
      JOIN part p ON p.p_partkey = ps.l_partkey
      WHERE p.p_name LIKE 'red%'
        AND ps.qty96 > 0
        AND ps.availqty > 2 * ps.qty96
      GROUP BY ps.l_suppkey
    )
    SELECT s.s_name, n.n_name
    FROM supplier s
    JOIN excess e ON e.l_suppkey = s.s_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'EUROPE'
    ORDER BY s_name
    """,
    tags=("analytics", "tpch"),
)
def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (potential part promotion), adapted: derived partsupp,
    region slice, and "excess stock" = all-time quantity more than
    twice the 1996 shipments for that (part, supplier) — all exact
    integer compares. The spec's two nested subqueries (half-of-
    shipped threshold; red-part filter) FUSE into one lineitem pass:
    availqty and qty96 come from the same conditional aggregate, so
    the fact table is scanned once and shuffled once on
    (partkey, suppkey); the red-part filter pushes below that
    aggregate as a broadcast semi-join (grouping-key filter — see
    _partsupp), so only the red slice is ever aggregated; the final
    supplier restriction is a semi-join shape expressed as a
    grouped key set."""
    # ONE spark.sql() call (r10-opt): preserves the tuned structure —
    # red-part filter pushed below the fused conditional aggregate as
    # a broadcast semi-join; one lineitem scan, one (partkey, suppkey)
    # shuffle; excess keys broadcast into the dims join.
    v = Tables(spark, sf_dir).sql_views()
    return spark.sql(f"""
    WITH red AS (
      SELECT p_partkey FROM {v}part WHERE p_name LIKE 'red%'
    ),
    li AS (
      SELECT /*+ BROADCAST(red) */
             l.l_partkey, l.l_suppkey, l.l_quantity, l.l_shipdate
      FROM {v}lineitem l
      LEFT SEMI JOIN red ON l.l_partkey = red.p_partkey
    ),
    ps AS (
      SELECT l_partkey, l_suppkey,
             sum(CAST(l_quantity AS BIGINT)) AS availqty,
             CAST(coalesce(sum(CASE
               WHEN l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
                AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
               THEN CAST(l_quantity AS BIGINT) END), 0) AS BIGINT) AS qty96
      FROM li GROUP BY l_partkey, l_suppkey
    ),
    excess AS (
      SELECT l_suppkey FROM ps
      WHERE qty96 > 0 AND availqty > 2 * qty96
      GROUP BY l_suppkey
    ),
    dims AS (
      SELECT /*+ BROADCAST(n, r) */ s_suppkey, s_name, n_name
      FROM {v}supplier s
      JOIN {v}nation n ON n.n_nationkey = s.s_nationkey
      JOIN {v}region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE'
    )
    SELECT /*+ BROADCAST(e) */ s_name, n_name
    FROM dims JOIN excess e ON e.l_suppkey = dims.s_suppkey
    ORDER BY s_name
    """)
