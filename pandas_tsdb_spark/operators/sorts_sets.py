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
    v = Tables(spark, sf_dir).sql_views()
    return spark.sql(f"""
    SELECT o_orderkey, o_orderstatus, o_totalprice,
           nullif(o_orderstatus, 'P') AS maybe_status
    FROM {v}orders
    ORDER BY maybe_status ASC NULLS FIRST, o_totalprice DESC, o_orderkey
    LIMIT 200
    """)


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
    v = Tables(spark, sf_dir).sql_views()
    return spark.sql(f"""
    SELECT l_orderkey, l_linenumber, l_extendedprice FROM {v}lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 50
    """)


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


@query("set_union_all", oracle=f"{_HI} UNION ALL {_LO}")
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pd.concat: bag union, duplicates kept."""
    v = Tables(spark, sf_dir).sql_views()
    hi = _HI.replace("FROM orders", f"FROM {v}orders")
    lo = _LO.replace("FROM orders", f"FROM {v}orders")
    return spark.sql(f"{hi} UNION ALL {lo}")


@query(
    "set_union",
    oracle=f"SELECT k, v FROM ({_HI} UNION {_LO})",
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """concat + drop_duplicates: set union."""
    v = Tables(spark, sf_dir).sql_views()
    hi = _HI.replace("FROM orders", f"FROM {v}orders")
    lo = _LO.replace("FROM orders", f"FROM {v}orders")
    return spark.sql(f"SELECT k, v FROM ({hi} UNION {lo})")


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
    v = Tables(spark, sf_dir).sql_views()
    return spark.sql(f"""
    SELECT o_custkey AS k FROM {v}orders WHERE o_orderstatus = 'O'
    INTERSECT
    SELECT o_custkey AS k FROM {v}orders WHERE o_orderstatus = 'F'
    """)


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
    v = Tables(spark, sf_dir).sql_views()
    return spark.sql(f"""
    SELECT o_custkey AS k FROM {v}orders WHERE o_orderstatus = 'O'
    EXCEPT
    SELECT o_custkey AS k FROM {v}orders WHERE o_orderstatus = 'F'
    """)


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
    v = Tables(spark, sf_dir).sql_views()
    return spark.sql(f"""
    SELECT o_custkey AS k FROM {v}orders WHERE o_orderstatus = 'O'
    EXCEPT ALL
    SELECT o_custkey AS k FROM {v}orders WHERE o_orderstatus = 'F'
    """)


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
    # ONE spark.sql() call (r10-opt): SQL UNPIVOT INCLUDE NULLS is the
    # exact twin of DataFrame.unpivot (which keeps NULL values).
    v = Tables(spark, sf_dir).sql_views()
    return spark.sql(f"""
    SELECT o_orderkey, metric, val FROM (
      SELECT o_orderkey, o_totalprice,
             CAST(o_custkey AS DOUBLE) AS custkey_d
      FROM {v}orders
    )
    UNPIVOT INCLUDE NULLS (val FOR metric IN (o_totalprice, custkey_d))
    """)
