"""§2.6 sorts/limits/top-k + §2.7 set operations.

Determinism: every LIMIT carries a total order (unique-key tie-break,
FIXTURES.md pitfall 5). Scale: global sort-then-limit compiles to
TakeOrderedAndProject (per-partition top-N + driver merge of N rows,
never a full sort); topk_per_group is one window over a single shuffle
by the group key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from pandas_tsdb_spark.catalog import Tables
from pandas_tsdb_spark.registry import query


@query(
    "sort_multi",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice,
           nullif(o_orderstatus, 'P') AS maybe_status
    FROM orders
    ORDER BY nullif(o_orderstatus, 'P') NULLS FIRST,
             o_totalprice DESC, o_orderkey
    LIMIT 200
    """,
)
def sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sort_values([a,b], ascending=[...]) with explicit null placement;
    LIMIT makes the order observable through the order-insensitive hash."""
    o = Tables(spark, sf_dir).orders
    maybe = F.nullif(F.col("o_orderstatus"), F.lit("P"))
    return (
        o.select("o_orderkey", "o_orderstatus", "o_totalprice", maybe.alias("maybe_status"))
        .orderBy(
            F.col("maybe_status").asc_nulls_first(),
            F.col("o_totalprice").desc(),
            F.col("o_orderkey"),
        )
        .limit(200)
    )


@query(
    "limit_n",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 50
    """,
)
def limit_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """head(n) after sort — TakeOrderedAndProject, no global sort."""
    li = Tables(spark, sf_dir).lineitem
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber")
        .limit(50)
    )


@query(
    "topk_per_group",
    oracle="""
    SELECT c_custkey, o_orderkey, o_totalprice, rk FROM (
        SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rk
        FROM orders
    ) WHERE rk <= 3
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupby().nlargest(3): top 3 orders per customer, row_number with
    unique-key tie-break; single shuffle on the group key."""
    # ONE spark.sql() call (r9-opt, catalog.Tables.sql_views): 126 ms
    # of per-call plan construction -> ~50 ms; same single-exchange
    # WindowGroupLimit plan.
    v = Tables(spark, sf_dir).sql_views()
    return spark.sql(f"""
    SELECT c_custkey, o_orderkey, o_totalprice, rk FROM (
        SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey)
                 AS rk
        FROM {v}orders
    ) WHERE rk <= 3
    """)


_HI = "SELECT o_custkey AS k, o_totalprice AS v FROM orders WHERE o_totalprice > 350000"
_LO = "SELECT o_custkey AS k, o_totalprice AS v FROM orders WHERE o_totalprice < 50000"


def _hi_lo(t: Tables) -> tuple[DataFrame, DataFrame]:
    o = t.orders.select(F.col("o_custkey").alias("k"), F.col("o_totalprice").alias("v"))
    return o.filter(F.col("v") > 350000), o.filter(F.col("v") < 50000)


@query("set_union_all", oracle=f"{_HI} UNION ALL {_LO}")
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pd.concat: bag union, duplicates kept."""
    hi, lo = _hi_lo(Tables(spark, sf_dir))
    return hi.unionByName(lo)


@query(
    "set_union",
    oracle=f"SELECT k, v FROM ({_HI} UNION {_LO})",
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """concat + drop_duplicates: set union."""
    hi, lo = _hi_lo(Tables(spark, sf_dir))
    return hi.unionByName(lo).distinct()


@query(
    "set_intersect",
    oracle="""
    SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'
    INTERSECT
    SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers appearing in both status classes (set semantics)."""
    o = Tables(spark, sf_dir).orders
    a = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("k"))
    b = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("k"))
    return a.intersect(b)


@query(
    "set_except",
    oracle="""
    SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'
    EXCEPT
    SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set difference (distinct semantics, pandas index difference)."""
    o = Tables(spark, sf_dir).orders
    a = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("k"))
    b = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("k"))
    return a.subtract(b)


@query(
    "set_except_all",
    oracle="""
    SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'
    EXCEPT ALL
    SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
    """,
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag (multiset) difference — EXCEPT ALL: each occurrence on the
    right cancels ONE occurrence on the left, surviving duplicates
    kept. The semantics pandas users hand-roll with cumcount joins;
    Spark's exceptAll plans it as a counted anti-semantics join
    (generate replicated rows from count deltas), one shuffle on the
    key — contrast set_except's distinct semantics (the other §2.7
    row)."""
    o = Tables(spark, sf_dir).orders
    a = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("k"))
    b = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("k"))
    return a.exceptAll(b)


@query(
    "reshape_melt",
    oracle="""
    SELECT o_orderkey, 'o_totalprice' AS metric, o_totalprice AS val
    FROM orders
    UNION ALL
    SELECT o_orderkey, 'custkey_d' AS metric, CAST(o_custkey AS DOUBLE) AS val
    FROM orders
    """,
)
def reshape_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas melt / DataFrame.unpivot: wide -> long reshape (the
    inverse of agg_pivot). Narrow-schema emission keeps the shuffle-free
    plan: unpivot is a per-row flatMap, no exchange.

    Null semantics (round-6 core-table sweep): pandas melt KEEPS rows
    whose value is NaN, and Spark's unpivot keeps NULL values too — but
    SQL UNPIVOT drops them by definition, so the oracle is spelled as
    the explicit UNION ALL (one SELECT per measure), which preserves
    NULL val rows."""
    o = Tables(spark, sf_dir).orders
    return (
        o.select(
            "o_orderkey",
            "o_totalprice",
            F.col("o_custkey").cast("double").alias("custkey_d"),
        )
        .unpivot(
            ["o_orderkey"],
            ["o_totalprice", "custkey_d"],
            "metric",
            "val",
        )
    )
