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
    # ONE spark.sql() call (r10-opt, catalog.Tables.sql_views).
    v = Tables(spark, sf_dir).sql_views()
    return spark.sql(f"""
    SELECT c_custkey, c_name, o_orderkey, o_totalprice
    FROM {v}customer LEFT JOIN {v}orders
      ON c_custkey = o_custkey AND o_totalprice > 400000
    """)


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
    # ONE spark.sql() call (r10-opt): mirrors the oracle text.
    v = Tables(spark, sf_dir).sql_views()
    return spark.sql(f"""
    WITH o_open AS (
        SELECT o_custkey AS k, count(*) AS n_open
        FROM {v}orders WHERE o_orderstatus = 'O' GROUP BY o_custkey
    ), o_done AS (
        SELECT o_custkey AS k, count(*) AS n_done
        FROM {v}orders WHERE o_orderstatus = 'F' GROUP BY o_custkey
    )
    SELECT coalesce(o_open.k, o_done.k) AS custkey, n_open, n_done
    FROM o_open FULL JOIN o_done ON o_open.k = o_done.k
    """)


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
    v = Tables(spark, sf_dir).sql_views()
    return spark.sql(f"""
    SELECT c_custkey, c_name, c_acctbal FROM {v}customer
    WHERE EXISTS (SELECT 1 FROM {v}orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
    """)


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
    v = Tables(spark, sf_dir).sql_views()
    return spark.sql(f"""
    SELECT c_custkey, c_name, c_acctbal FROM {v}customer
    WHERE NOT EXISTS (SELECT 1 FROM {v}orders
                      WHERE o_custkey = c_custkey
                        AND o_totalprice > 300000)
    """)


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
    # ONE spark.sql() call (r10-opt): mirrors the oracle text.
    v = Tables(spark, sf_dir).sql_views()
    return spark.sql(f"""
    SELECT o_orderkey, count(*) AS n_quick,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
             / 100.0D AS quick_rev
    FROM {v}orders JOIN {v}lineitem
      ON l_orderkey = o_orderkey
     AND l_shipdate >= o_orderdate
     AND l_shipdate < o_orderdate + INTERVAL 90 DAY
    GROUP BY o_orderkey
    """)


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
    # ONE spark.sql() call (r10-opt): inline VALUES dim + BROADCAST
    # hint replace the createDataFrame round trip entirely.
    v = Tables(spark, sf_dir).sql_views()
    return spark.sql(f"""
    SELECT /*+ BROADCAST(bands) */
           band, count(*) AS n_events,
           round(sum(value) * 100) / 100.0D AS total_value
    FROM {v}events
    JOIN (VALUES ('low', 0.0D, 50.0D),
                 ('mid', 50.0D, 200.0D),
                 ('high', 200.0D, 1.0E9)) AS bands(band, lo, hi)
      ON value >= lo AND value < hi
    GROUP BY band
    """)


@query(
    "join_cross",
    oracle="""
    SELECT r_name, n_name FROM region CROSS JOIN nation
    """,
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product (tiny dims only — guarded use)."""
    v = Tables(spark, sf_dir).sql_views()
    return spark.sql(
        f"SELECT r_name, n_name FROM {v}region CROSS JOIN {v}nation"
    )


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
    v = Tables(spark, sf_dir).sql_views()
    return spark.sql(f"""
    SELECT a.n_regionkey AS region_key, a.n_name AS name_a,
           b.n_name AS name_b
    FROM {v}nation a JOIN {v}nation b
      ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
    """)


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
    # ONE spark.sql() call (r10-opt): same salted shape — fact side
    # salts by pmod(event_id, S), dim side explodes S ways.
    v = Tables(spark, sf_dir).sql_views()
    salts = ", ".join(str(s) for s in range(_N_SALT))
    return spark.sql(f"""
    WITH fact AS (
      SELECT event_id, value,
             CASE WHEN user_id % 3 = 0 THEN CAST(0 AS BIGINT)
                  ELSE user_id END AS k,
             pmod(event_id, {_N_SALT}) AS salt
      FROM {v}events
    ),
    dim AS (
      SELECT k, k_events, k_total, explode(array({salts})) AS salt
      FROM (
        SELECT CASE WHEN user_id % 3 = 0 THEN CAST(0 AS BIGINT)
                    ELSE user_id END AS k,
               count(*) AS k_events,
               round(sum(value) * 100) / 100.0D AS k_total
        FROM {v}events GROUP BY 1
      )
    )
    SELECT event_id, k, value, k_events, k_total
    FROM fact JOIN dim USING (k, salt)
    """)


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
    # ONE spark.sql() call (r10-opt): same blocked equi-join shape.
    v = Tables(spark, sf_dir).sql_views()
    return spark.sql(f"""
    WITH names AS (
      SELECT p_name, count(*) AS n_parts FROM {v}part GROUP BY p_name
    ),
    a AS (SELECT p_name AS name_a, n_parts AS n_a,
                 substring(p_name, 1, 1) AS blk,
                 length(p_name) AS len_a FROM names),
    b AS (SELECT p_name AS name_b, n_parts AS n_b,
                 substring(p_name, 1, 1) AS blk,
                 length(p_name) AS len_b FROM names)
    SELECT name_a, name_b, levenshtein(name_a, name_b) AS dist, n_a, n_b
    FROM a JOIN b USING (blk)
    WHERE name_a < name_b
      AND abs(len_a - len_b) <= 3
      AND levenshtein(name_a, name_b) <= 3
    """)


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
    # r10-opt: the memoized ptsdb_* views replace the two per-call
    # createOrReplaceTempView registrations; still literal SQL.
    v = Tables(spark, sf_dir).sql_views()
    return spark.sql(f"""
        SELECT c_custkey, c_name, o.o_orderkey AS last_orderkey,
               o.o_totalprice AS last_totalprice
        FROM {v}customer,
        LATERAL (SELECT o_orderkey, o_totalprice FROM {v}orders
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
    # ONE spark.sql() call (r10-opt): identical bucket-decomposition
    # plan assembled as SQL text.
    v = Tables(spark, sf_dir).sql_views()
    sw = "OVER (PARTITION BY user_id ORDER BY us, event_id)"
    return spark.sql(f"""
    WITH g AS (
      SELECT user_id, event_id, unix_micros(ts) AS us FROM {v}events
    ),
    n AS (
      SELECT user_id, event_id, us,
             CASE WHEN us - lag(us) {sw} IS NULL
                   OR us - lag(us) {sw} > {_SESSION_GAP_US}
                  THEN 1 ELSE 0 END AS is_new
      FROM g
    ),
    sess AS (
      SELECT user_id, session_seq,
             min(us) AS s_start, max(us) AS s_end
      FROM (SELECT user_id, us,
                   sum(is_new) OVER (PARTITION BY user_id
                       ORDER BY us, event_id
                       ROWS UNBOUNDED PRECEDING) AS session_seq
            FROM n)
      GROUP BY user_id, session_seq
    ),
    spans AS (
      SELECT event_type, day_us, min(us) AS w_start, max(us) AS w_end
      FROM (SELECT event_type,
                   CAST(unix_micros(ts) / {_DAY_US} AS BIGINT) * {_DAY_US}
                     AS day_us,
                   unix_micros(ts) AS us
            FROM {v}events)
      GROUP BY event_type, day_us
    ),
    sb AS (
      SELECT *, explode(sequence(CAST(s_start / {_HOUR_US} AS BIGINT),
                                 CAST(s_end / {_HOUR_US} AS BIGINT)))
                  AS bucket
      FROM sess
    ),
    wb AS (
      SELECT *, explode(sequence(CAST(w_start / {_HOUR_US} AS BIGINT),
                                 CAST(w_end / {_HOUR_US} AS BIGINT)))
                  AS bucket
      FROM spans
    ),
    pairs AS (
      SELECT DISTINCT user_id, session_seq, event_type, day_us,
             s_start, s_end, w_start, w_end
      FROM sb JOIN wb USING (bucket)
      WHERE s_start <= w_end AND w_start <= s_end
    )
    SELECT user_id, session_seq, event_type, day_us,
           least(s_end, w_end) - greatest(s_start, w_start) AS overlap_us
    FROM pairs
    """)


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
