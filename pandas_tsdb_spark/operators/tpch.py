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
from pandas_tsdb_spark.registry import query

# ---------------------------------------------------------------- q6


@query(
    "tpch_q6",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
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
    li = Tables(spark, sf_dir).lineitem
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            ),
            F.count("*").alias("n_rows"),
        )
    )


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
    t = Tables(spark, sf_dir)
    o = t.orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01 00:00:00").cast("timestamp"))
    )
    late = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.join(t.lineitem, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


# ---------------------------------------------------------------- q10


@query(
    "tpch_q10",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
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
    t = Tables(spark, sf_dir)
    return (
        t.customer.join(t.orders, F.col("c_custkey") == F.col("o_custkey"))
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-10-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        )
        .join(t.lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_returnflag") == "R")
        .join(t.nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------- q14


@query(
    "tpch_q14",
    oracle="""
    SELECT 100.0 * round(sum(CASE WHEN p.p_type = 'PROMO'
                     THEN l.l_extendedprice * (1 - l.l_discount)
                     ELSE 0 END), 2)
               / round(sum(l.l_extendedprice * (1 - l.l_discount)), 2)
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
    each round(sum, 2) — bit-identical across engines per registry.py —
    and the ratio/scale ops are then single IEEE ops, also
    bit-identical."""
    t = Tables(spark, sf_dir)
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        t.lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-09-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-10-01 00:00:00").cast("timestamp"))
        )
        .join(F.broadcast(t.part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.lit(100.0)
                * F.round(
                    F.sum(F.when(F.col("p_type") == "PROMO", net).otherwise(0.0)), 2
                )
                / F.round(F.sum(net), 2)
            ).alias("promo_revenue_pct"),
            F.count("*").alias("n_rows"),
        )
    )


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
    t = Tables(spark, sf_dir)
    big = (
        t.lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("raw_qty"))
        .filter(F.col("raw_qty") > 250.5)
    )
    return (
        big.join(t.orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t.customer, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.round("raw_qty", 2).alias("sum_qty"),
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


# ---------------------------------------------------------------- q19


@query(
    "tpch_q19",
    oracle="""
    SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
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
    t = Tables(spark, sf_dir)
    cond = (
        (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 15)
        )
        | (
            (F.col("p_brand") == "Brand#13")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 25)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 35)
        )
    )
    return (
        t.lineitem.join(
            F.broadcast(t.part), F.col("p_partkey") == F.col("l_partkey")
        )
        .filter(cond)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").alias("n_rows"),
        )
    )


# ---------------------------------------------------------------- q8


@query(
    "tpch_q8",
    oracle="""
    SELECT year(o.o_orderdate) AS o_year,
           100.0 * round(sum(CASE WHEN sn.n_name = 'NATION_3'
                       THEN l.l_extendedprice * (1 - l.l_discount)
                       ELSE 0 END), 2)
                 / round(sum(l.l_extendedprice * (1 - l.l_discount)), 2)
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
    both ratio legs are round(sum, 2) so the division is bit-identical
    cross-engine (registry.py float discipline)."""
    t = Tables(spark, sf_dir)
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    cn = t.nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_rkey")
    )
    sn = t.nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("sn_name")
    )
    return (
        t.lineitem.join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        )
        .join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(t.region), F.col("cn_rkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "EUROPE")
        .join(F.broadcast(t.supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                F.lit(100.0)
                * F.round(
                    F.sum(F.when(F.col("sn_name") == "NATION_3", net).otherwise(0.0)),
                    2,
                )
                / F.round(F.sum(net), 2)
            ).alias("mkt_share_pct"),
            F.count("*").alias("n_rows"),
        )
    )


# ---------------------------------------------------------------- q22


@query(
    "tpch_q22",
    oracle="""
    SELECT c.c_mktsegment, count(*) AS n_cust,
           round(sum(c.c_acctbal), 2) AS total_bal
    FROM customer c
    WHERE c.c_acctbal > (
        SELECT round(sum(c_acctbal), 2) / count(*)
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
    against the date-pruned orders slice. The threshold is
    round(sum, 2)/count — bit-identical in both engines — so the strict
    > comparison against exact 2-decimal balances can't straddle
    engine noise."""
    t = Tables(spark, sf_dir)
    thr = (
        t.customer.filter(F.col("c_acctbal") > 0)
        .agg(
            (F.round(F.sum("c_acctbal"), 2) / F.count("*")).alias("thr")
        )
    )
    return (
        t.customer.crossJoin(F.broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("thr"))
        .join(
            t.orders.filter(
                F.col("o_orderdate")
                >= F.lit("2001-01-01 00:00:00").cast("timestamp")
            ),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_cust"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
    )
