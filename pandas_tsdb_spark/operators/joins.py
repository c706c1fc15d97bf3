"""§2.3 joins — pandas merge/isin/merge_asof surface (asof lives in
timeseries.py).

Scale notes per shape:
- Equi-joins: declared as plain join conditions -> Catalyst/AQE pick
  broadcast vs sort-merge vs shuffled-hash; dims (region/nation/
  supplier) fit any broadcast threshold.
- join_broadcast pins the small side with an explicit broadcast() hint
  (at 100 TB the fact side never shuffles for dim joins).
- join_range keeps an equi component (l_orderkey = o_orderkey) so the
  plan stays a hash/SMJ join with the interval as a post-filter — never
  a nested-loop over the fact table.
- join_theta is the pure-interval case: the band dimension is O(1)
  rows, so BroadcastNestedLoop is the *correct* scalable plan.
- join_self_pairs restricts pairs with a < key ordering inside an
  equi-bucket (same region) — the bucketing pattern that keeps pairwise
  similarity from going O(n²) globally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pandas_tsdb_spark.catalog import Tables, _nn_key
from pandas_tsdb_spark.registry import oracle_sum2, query, sum2_col


@query(
    "join_inner",
    oracle="""
    SELECT o_orderkey, o_totalprice, c_custkey, c_name, c_mktsegment
    FROM orders JOIN customer ON o_custkey = c_custkey
    """,
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pd.merge(how='inner') equi-join orders⋈customer."""
    # ONE spark.sql() call (r9-opt, catalog.Tables.sql_views).
    v = Tables(spark, sf_dir).sql_views()
    return spark.sql(f"""
    SELECT o_orderkey, o_totalprice, c_custkey, c_name, c_mktsegment
    FROM {v}orders JOIN {v}customer ON o_custkey = c_custkey
    """)


@query(
    "join_left",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_totalprice
    FROM customer LEFT JOIN orders
      ON c_custkey = o_custkey AND o_totalprice > 400000
    """,
)
def join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left merge keeping unmatched customers (null right side)."""
    t = Tables(spark, sf_dir)
    cond = (F.col("c_custkey") == F.col("o_custkey")) & (F.col("o_totalprice") > 400000)
    return t.customer.join(t.orders, cond, "left").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


@query(
    "join_outer",
    oracle="""
    WITH o_open AS (
        SELECT o_custkey AS k, count(*) AS n_open
        FROM orders WHERE o_orderstatus = 'O' GROUP BY o_custkey
    ), o_done AS (
        SELECT o_custkey AS k, count(*) AS n_done
        FROM orders WHERE o_orderstatus = 'F' GROUP BY o_custkey
    )
    SELECT coalesce(o_open.k, o_done.k) AS custkey, n_open, n_done
    FROM o_open FULL JOIN o_done ON o_open.k = o_done.k
    """,
)
def join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer merge with nulls possible on both sides."""
    o = Tables(spark, sf_dir).orders
    left = (
        o.filter(F.col("o_orderstatus") == "O")
        .groupBy(F.col("o_custkey").alias("lk"))
        .agg(F.count("*").alias("n_open"))
    )
    right = (
        o.filter(F.col("o_orderstatus") == "F")
        .groupBy(F.col("o_custkey").alias("rk"))
        .agg(F.count("*").alias("n_done"))
    )
    return left.join(right, F.col("lk") == F.col("rk"), "full").select(
        F.coalesce("lk", "rk").alias("custkey"), "n_open", "n_done"
    )


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas isin-mask: customers having a big order (EXISTS)."""
    t = Tables(spark, sf_dir)
    big = t.orders.filter(F.col("o_totalprice") > 300000)
    return t.customer.join(
        big, F.col("c_custkey") == F.col("o_custkey"), "left_semi"
    ).select("c_custkey", "c_name", "c_acctbal")


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 300000)
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~isin mask (NOT EXISTS)."""
    t = Tables(spark, sf_dir)
    big = t.orders.filter(F.col("o_totalprice") > 300000)
    return t.customer.join(
        big, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_name", "c_acctbal")


@query(
    "join_broadcast",
    oracle="""
    SELECT n_name, r_name,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                AS DOUBLE) / 10000.0 AS revenue,
           count(*) AS n_items
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY n_name, r_name
    """,
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5-shaped star join: fact stays in place, every dim is an
    explicit broadcast — zero fact-side shuffle before the final agg."""
    # ONE spark.sql() call (r9-opt, catalog.Tables.sql_views): 145 ms
    # of per-call plan construction -> ~55 ms; same star shape, dims
    # broadcast by hint. Exact integer e4 revenue (tpch.py rationale).
    v = Tables(spark, sf_dir).sql_views()
    return spark.sql(f"""
    SELECT /*+ BROADCAST(s), BROADCAST(n), BROADCAST(r) */
           n_name, r_name,
           cast(sum(cast(round(l_extendedprice * 100) as bigint)
                    * (100 - cast(round(l_discount * 100) as bigint)))
                as double) / 10000.0D AS revenue,
           count(*) AS n_items
    FROM {v}lineitem l
    JOIN {v}supplier s ON l_suppkey = s_suppkey
    JOIN {v}nation n   ON s_nationkey = n_nationkey
    JOIN {v}region r   ON n_regionkey = r_regionkey
    GROUP BY n_name, r_name
    """)


@query(
    "join_range",
    oracle="""
    SELECT o_orderkey, count(*) AS n_quick,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS quick_rev
    FROM orders JOIN lineitem
      ON l_orderkey = o_orderkey
     AND l_shipdate >= o_orderdate
     AND l_shipdate < o_orderdate + INTERVAL 90 DAY
    GROUP BY o_orderkey
    """,
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join (lineitems shipped within 90 days of their order).

    Equi key + range predicate => hash/sort-merge join with the interval
    as a join filter; no nested loop at any scale."""
    t = Tables(spark, sf_dir)
    cond = (
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") >= F.col("o_orderdate"))
        & (F.col("l_shipdate") < F.col("o_orderdate") + F.expr("INTERVAL 90 DAY"))
    )
    return (
        t.orders.join(t.lineitem, cond)
        .groupBy("o_orderkey")
        .agg(
            F.count("*").alias("n_quick"),
            sum2_col("l_extendedprice").alias("quick_rev"),
        )
    )


@query(
    "join_theta",
    oracle="""
    SELECT band, count(*) AS n_events, (round(sum(value) * 100) / 100.0) AS total_value
    FROM events JOIN (VALUES ('low', 0.0, 50.0),
                             ('mid', 50.0, 200.0),
                             ('high', 200.0, 1e9)) AS bands(band, lo, hi)
      ON value >= lo AND value < hi
    GROUP BY band
    """,
)
def join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure theta (band lookup) join — tiny broadcast dim, so the
    nested-loop side is O(1) per event row."""
    t = Tables(spark, sf_dir)
    bands = spark.createDataFrame(
        [("low", 0.0, 50.0), ("mid", 50.0, 200.0), ("high", 200.0, 1e9)],
        "band string, lo double, hi double",
    )
    cond = (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi"))
    return (
        t.events.join(F.broadcast(bands), cond)
        .groupBy("band")
        .agg(
            F.count("*").alias("n_events"),
            (F.round(F.sum("value") * 100) / F.lit(100.0)).alias("total_value"),
        )
    )


@query(
    "join_cross",
    oracle="""
    SELECT r_name, n_name FROM region CROSS JOIN nation
    """,
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product (tiny dims only — guarded use)."""
    t = Tables(spark, sf_dir)
    return t.region.crossJoin(t.nation).select("r_name", "n_name")


@query(
    "join_self_pairs",
    oracle="""
    SELECT a.n_regionkey AS region_key, a.n_name AS name_a, b.n_name AS name_b
    FROM nation a JOIN nation b
      ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
    """,
)
def join_self_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-join pair generation bucketed by an equi key (same region) —
    the shape that keeps pairwise ops sub-quadratic at scale."""
    n = Tables(spark, sf_dir).nation
    a, b = n.alias("a"), n.alias("b")
    return a.join(
        b,
        (F.col("a.n_regionkey") == F.col("b.n_regionkey"))
        & (F.col("a.n_nationkey") < F.col("b.n_nationkey")),
    ).select(
        F.col("a.n_regionkey").alias("region_key"),
        F.col("a.n_name").alias("name_a"),
        F.col("b.n_name").alias("name_b"),
    )


_N_SALT = 8


@query(
    "join_skew_salted",
    oracle="""
    WITH f AS (SELECT event_id, value,
                      CASE WHEN user_id % 3 = 0 THEN 0 ELSE user_id END AS k
               FROM events),
    dim AS (SELECT CASE WHEN user_id % 3 = 0 THEN 0 ELSE user_id END AS k,
                   count(*) AS k_events, (round(sum(value) * 100) / 100.0) AS k_total
            FROM events GROUP BY 1)
    SELECT f.event_id, f.k, f.value, dim.k_events, dim.k_total
    FROM f JOIN dim USING (k)
    """,
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigated equi-join: a third of the fact rows share one hot
    key (synthesized), which would land on a single reducer in a plain
    shuffle join. Standard salting: the fact side appends a salt
    pmod(event_id, S) to the join key; the (small) dim side explodes to
    all S salt values — the hot key spreads over S tasks and the result
    is provably identical to the unsalted join (that's the oracle).
    AQE's skew-join split handles this adaptively at runtime; the salted
    plan is the explicit form that also works where AQE can't see the
    skew (e.g. a first-stage shuffle straight out of the scan)."""
    ev = Tables(spark, sf_dir).events
    hot = F.when(F.col("user_id") % 3 == 0, F.lit(0).cast("long")).otherwise(
        F.col("user_id")
    )
    fact = ev.select(
        "event_id",
        "value",
        hot.alias("k"),
        F.pmod(F.col("event_id"), F.lit(_N_SALT)).alias("salt"),
    )
    dim = (
        ev.select(hot.alias("k"), "value")
        .groupBy("k")
        .agg(
            F.count("*").alias("k_events"),
            (F.round(F.sum("value") * 100) / F.lit(100.0)).alias("k_total"),
        )
        .withColumn("salt", F.explode(F.array(*[F.lit(s) for s in range(_N_SALT)])))
    )
    return fact.join(dim, ["k", "salt"]).select(
        "event_id", "k", "value", "k_events", "k_total"
    )


# ---------------------------------------------------------------- bucketed


@query(
    "join_bucketed",
    oracle="""
    SELECT o_orderkey, o_totalprice, c_custkey, c_name
    FROM orders JOIN customer ON o_custkey = c_custkey
    """,
    tags=("join", "bucketed"),
)
def join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located (bucketed) join: both sides pre-bucketed on the join
    key so the join needs NO exchange — the shape that turns a repeated
    100 TB fact⋈fact join from two full shuffles into zero. The builder
    materializes bucketed copies once per (session, sf_dir) into /tmp
    as external tables (in-memory catalog, no Hive needed), then joins
    with a merge hint; tests/test_plans assert the plan is
    exchange-free. Result set is identical to join_inner's shape, so
    the plain-SQL oracle checks correctness end-to-end.

    At scale this is a write-once-join-many amortization: bucket the
    fact tables at ingest (bucketBy on the canonical join key), and
    every later join/aggregation on that key skips its shuffle.
    """
    tag = f"b{abs(hash(sf_dir)) % 10**8}"
    t = Tables(spark, sf_dir)
    names = {"orders": f"orders_{tag}", "customer": f"customer_{tag}"}
    if not spark.catalog.tableExists(names["orders"]):
        for tbl, key in (("orders", "o_custkey"), ("customer", "c_custkey")):
            (
                getattr(t, tbl)
                .write.format("parquet")
                .bucketBy(8, key)
                .sortBy(key)
                .option("path", f"/tmp/pandas_tsdb_spark_buckets/{names[tbl]}")
                .mode("overwrite")
                .saveAsTable(names[tbl])
            )
    o = spark.table(names["orders"]).hint("merge")
    c = spark.table(names["customer"]).hint("merge")
    return o.join(c, F.col("o_custkey") == F.col("c_custkey")).select(
        "o_orderkey", "o_totalprice", "c_custkey", "c_name"
    )


@query(
    "join_fuzzy_blocked",
    oracle="""
    WITH names AS (
      SELECT p_name, count(*) AS n_parts,
             substring(p_name, 1, 1) AS blk, length(p_name) AS len
      FROM part GROUP BY p_name
    )
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           levenshtein(a.p_name, b.p_name) AS dist,
           a.n_parts AS n_a, b.n_parts AS n_b
    FROM names a JOIN names b
      ON a.blk = b.blk AND a.p_name < b.p_name
    WHERE abs(a.len - b.len) <= 3
      AND levenshtein(a.p_name, b.p_name) <= 3
    """,
    tags=("joins", "dedup"),
)
def join_fuzzy_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy self-join: pairs of distinct part names within
    edit distance 3 (the entity-resolution / fuzzy-dedup primitive;
    the fixture vocabulary's nearest distinct names sit at distance 3,
    so the threshold keeps the result set non-trivial at every SF).

    The naive formulation is an O(n²) cross join with levenshtein as a
    theta predicate — a BroadcastNestedLoop that dies at scale. This
    plan BLOCKS first: names collapse to distinct (a hash-agg that also
    carries the per-name part count), the join is an EQUI-join on a
    blocking key (first character) so Catalyst plans a hash join over
    candidate buckets, and the length band |len(a)-len(b)| <= 3 (a
    necessary condition for edit distance <= 3) prunes before the
    quadratic levenshtein evaluates. At 100 TB the same shape holds:
    the distinct-name table is vocabulary-bounded, blocks shard the
    pair space, and per-block skew is AQE's skew-join case. A
    production matcher would union several blocking passes (prefix,
    suffix, length band) to recover recall lost to single-key blocking
    — each pass is this same plan.
    """
    t = Tables(spark, sf_dir)
    names = t.part.groupBy("p_name").agg(F.count("*").alias("n_parts"))
    a = names.select(
        F.col("p_name").alias("name_a"),
        F.col("n_parts").alias("n_a"),
        F.substring("p_name", 1, 1).alias("blk"),
        F.length("p_name").alias("len_a"),
    )
    b = names.select(
        F.col("p_name").alias("name_b"),
        F.col("n_parts").alias("n_b"),
        F.substring("p_name", 1, 1).alias("blk"),
        F.length("p_name").alias("len_b"),
    )
    return (
        a.join(b, "blk")
        .filter(
            (F.col("name_a") < F.col("name_b"))
            & (F.abs(F.col("len_a") - F.col("len_b")) <= 3)
            & (F.levenshtein("name_a", "name_b") <= 3)
        )
        .select(
            "name_a",
            "name_b",
            F.levenshtein("name_a", "name_b").alias("dist"),
            "n_a",
            "n_b",
        )
    )


@query(
    "join_lateral",
    oracle="""
    SELECT c_custkey, c_name, o.o_orderkey AS last_orderkey,
           o.o_totalprice AS last_totalprice
    FROM customer,
    LATERAL (SELECT o_orderkey, o_totalprice FROM orders
             WHERE o_custkey = c_custkey
             ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 1) o
    WHERE c_acctbal > 9000
    """,
    tags=("joins", "sql"),
)
def join_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery — the SQL-surface way to write
    'each customer's most recent order' (pandas: groupby().idxmax()
    then .loc). Declared as literal SQL through spark.sql() — the
    third entry path beside DataFrame and TsFrame — and Catalyst's
    subquery decorrelation rewrites the per-row LIMIT 1 into the SAME
    physical plan topk_per_group hand-builds: one Window (row_number
    over the correlation key) + a broadcast hash join. Nothing
    executes per-row; the lateral is a declaration, not a loop — the
    optimizer-does-it case for preferring declarative SQL at 100 TB.
    Deterministic: the LIMIT 1 carries a total order (orderdate DESC,
    orderkey DESC)."""
    t = Tables(spark, sf_dir)
    t.customer.createOrReplaceTempView("v_lat_customer")
    t.orders.createOrReplaceTempView("v_lat_orders")
    return spark.sql("""
        SELECT c_custkey, c_name, o.o_orderkey AS last_orderkey,
               o.o_totalprice AS last_totalprice
        FROM v_lat_customer,
        LATERAL (SELECT o_orderkey, o_totalprice FROM v_lat_orders
                 WHERE o_custkey = c_custkey
                 ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 1) o
        WHERE c_acctbal > 9000
    """)


_HOUR_US = 3_600 * 1_000_000
_DAY_US = 86_400 * 1_000_000
_SESSION_GAP_US = 30 * 60 * 1_000_000


@query(
    "join_interval_overlap",
    oracle=f"""
    WITH g AS (
      SELECT user_id, event_id, epoch_us(ts) AS us,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                    OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
                  IS NOT DISTINCT FROM NULL THEN 1
                  WHEN epoch_us(ts) - lag(epoch_us(ts))
                    OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
                  > {_SESSION_GAP_US} THEN 1 ELSE 0 END AS is_new
      FROM events
    ),
    sess AS (
      SELECT user_id,
             CAST(sum(is_new) OVER (PARTITION BY user_id
                                    ORDER BY us, event_id
                                    ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS session_seq,
             us
      FROM g
    ),
    a AS (
      SELECT user_id, session_seq,
             min(us) AS s_start, max(us) AS s_end
      FROM sess GROUP BY user_id, session_seq
    ),
    b AS (
      SELECT event_type, (epoch_us(ts) // {_DAY_US}) * {_DAY_US} AS day_us,
             min(epoch_us(ts)) AS w_start, max(epoch_us(ts)) AS w_end
      FROM events GROUP BY 1, 2
    )
    SELECT a.user_id, a.session_seq, b.event_type, b.day_us,
           least(a.s_end, b.w_end) - greatest(a.s_start, b.w_start)
             AS overlap_us
    FROM a JOIN b
      ON a.s_start <= b.w_end AND b.w_start <= a.s_end
    """,
    tags=("joins", "timeseries"),
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join — the operator Spark has no physical
    strategy for (a bare `a.start <= b.end AND b.start <= a.end` join
    degenerates to BroadcastNestedLoop/cartesian + filter, O(|A|x|B|)
    at scale). Implemented by UNIFORM BUCKET DECOMPOSITION, the
    standard distributed range-join recipe (Spark lacks it; DuckDB's
    IEJoin and KDB's `wj` solve the same problem single-node):

      1. explode each interval into the fixed-width time buckets it
         spans (1 h here; pick ~= median interval length so the fanout
         is O(1) per row);
      2. hash-partition BOTH sides on the bucket id — overlapping
         intervals share at least one bucket, so the candidate join is
         a plain shuffled EQUI-join, never a nested loop;
      3. re-check the exact predicate inside the bucket, and
         de-duplicate pairs that co-occur in several buckets
         (DISTINCT on the pair key BEFORE computing payloads).

    Cost is O(|A| + |B| + |true pairs|) x fanout — linear in data, not
    quadratic; the shuffle key (bucket id) is uniform by construction
    (time advances), so no salting needed. Both interval tables derive
    from events in one pass each: A = 30-min-gap user sessions (the
    sessionize window), B = per-(event_type, day) activity spans.
    All arithmetic in integer µs — exactly engine-stable."""
    ev = Tables(spark, sf_dir).events
    from pyspark.sql import Window as W

    sw = W.partitionBy("user_id").orderBy("us", "event_id")
    gap = F.col("us") - F.lag("us").over(sw)
    sess = (
        ev.select("user_id", "event_id", F.unix_micros("ts").alias("us"))
        .withColumn(
            "session_seq",
            F.sum(
                F.when(gap.isNull() | (gap > _SESSION_GAP_US), 1).otherwise(0)
            ).over(sw.rowsBetween(W.unboundedPreceding, W.currentRow)),
        )
        .groupBy("user_id", "session_seq")
        .agg(F.min("us").alias("s_start"), F.max("us").alias("s_end"))
    )
    spans = ev.select(
        "event_type",
        ((F.unix_micros("ts") / _DAY_US).cast("long") * _DAY_US).alias("day_us"),
        F.unix_micros("ts").alias("us"),
    ).groupBy("event_type", "day_us").agg(
        F.min("us").alias("w_start"), F.max("us").alias("w_end")
    )

    def bucketed(df, lo, hi):
        return df.withColumn(
            "bucket",
            F.explode(
                F.sequence(
                    (F.col(lo) / _HOUR_US).cast("long"),
                    (F.col(hi) / _HOUR_US).cast("long"),
                )
            ),
        )

    pairs = (
        bucketed(sess, "s_start", "s_end")
        .join(
            bucketed(spans, "w_start", "w_end"),
            "bucket",
        )
        .filter(
            (F.col("s_start") <= F.col("w_end"))
            & (F.col("w_start") <= F.col("s_end"))
        )
        .select(
            "user_id", "session_seq", "event_type", "day_us",
            "s_start", "s_end", "w_start", "w_end",
        )
        .distinct()
    )
    return pairs.select(
        "user_id", "session_seq", "event_type", "day_us",
        (
            F.least("s_end", "w_end") - F.greatest("s_start", "w_start")
        ).alias("overlap_us"),
    )


@query(
    "join_merge_ordered",
    oracle="""
    WITH a AS (
      SELECT user_id, ts, arg_max(value, event_id) AS click_v
      FROM events WHERE event_type = 'click' GROUP BY 1, 2
    ),
    b AS (
      SELECT user_id, ts, arg_max(value, event_id) AS purch_v
      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
    ),
    m AS (
      -- presence-marked structs, mirroring the engine: pandas
      -- merge_ordered ffill repeats each side's last ROW (a present
      -- row whose value is NULL fills NULL forward), not its last
      -- non-null VALUE — IGNORE NULLS on the raw value column would
      -- skip null rows and diverge on holey data (round-5 sweep)
      SELECT coalesce(a.user_id, b.user_id) AS user_id,
             coalesce(a.ts, b.ts) AS ts,
             CASE WHEN a.user_id IS NOT NULL THEN {'v': a.click_v} END AS lrow,
             CASE WHEN b.user_id IS NOT NULL THEN {'v': b.purch_v} END AS rrow
      FROM a FULL JOIN b ON a.user_id = b.user_id AND a.ts = b.ts
    ),
    f AS (
      SELECT user_id, ts,
             last_value(lrow IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts
                     ROWS UNBOUNDED PRECEDING) AS lf,
             last_value(rrow IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts
                     ROWS UNBOUNDED PRECEDING) AS rf
      FROM m
    )
    SELECT user_id, epoch_us(ts) AS ts_us, lf.v AS click_v, rf.v AS purch_v
    FROM f
    """,
    tags=("joins", "timeseries"),
)
def join_merge_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas ``pd.merge_ordered(..., fill_method='ffill')`` as a
    driver-checkable op, built ON the TsFrame.merge_ordered API surface
    (dogfooding — the oracle pins the API's semantics, not a parallel
    reimplementation): each user's click stream outer-merged with their
    purchase stream on the time axis, both value columns forward-filled
    across the other side's timestamps. Sides are pre-aggregated to
    unique (user, ts) with an event_id tie-break, so the outer join
    never fans out and the fill window's ordering is total. One
    exchange per side for the pre-agg + the co-partitioned full join +
    one shared fill window — all on the series key."""
    from pandas_tsdb_spark.api import TsFrame

    ev = Tables(spark, sf_dir).events

    def side(etype: str, out: str) -> DataFrame:
        return (
            ev.filter(F.col("event_type") == etype)
            .groupBy("user_id", "ts")
            .agg(  # null-aware last (catalog._nn_key): oracle arg_max
                F.max_by("value", _nn_key("value", "event_id")).alias(out)
            )
        )

    left = TsFrame(side("click", "click_v"), ts_col="ts", by="user_id")
    merged = left.merge_ordered(
        side("purchase", "purch_v"), ["click_v"], ["purch_v"]
    )
    return merged.df.select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "click_v",
        "purch_v",
    )
