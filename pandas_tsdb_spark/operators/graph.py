"""Iterative graph ops on Spark DataFrames: near-dup cluster assignment.

A real LLM-data dedup pipeline does not stop at pairwise similarity --
it clusters the similarity graph (transitively!) and keeps one canonical
doc per cluster. The pairwise ops (dedup_near_pairs, dedup_minhash) find
edges; this module finds the connected components.

Algorithm: min-label propagation with pointer jumping --
  label(v) <- min(label(v), min_{(v,u) in E} label(u))   [neighbor min]
  label(v) <- label(label(v))                            [pointer jump]
iterated to fixpoint. Pointer jumping halves the distance to the
component minimum each round, so convergence is O(log(diameter)) Spark
jobs, not O(diameter) -- the sf0.01 fixture has a 29-doc dup chain that
naive propagation would take 29 joins to resolve; this takes 5. At
100 TB the same loop holds (each iteration = two co-partitioned joins
on doc_id + a hash agg; lineage cut with localCheckpoint each round);
the published refinement for trillion-edge graphs is the large-star/
small-star variant of exactly this update rule.

Edges are built deliberately as CHAINS (each doc linked only to its
predecessor in doc_id order within a duplicate group), so recovering the
full cluster genuinely exercises transitive closure rather than falling
out of a single groupBy.

Oracle: DuckDB WITH RECURSIVE transitive closure, min reachable id per
node -- a full value-level check of an iterative distributed algorithm.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from pandas_tsdb_spark.catalog import Tables
from pandas_tsdb_spark.registry import query

_MAX_ITERS = 20

_CLUSTER_ORACLE = """
WITH RECURSIVE
tok AS (
  SELECT doc_id,
         array_to_string(list_sort(list_distinct(string_split(text, ' '))),
                         ' ') AS k
  FROM documents
),
chain AS (
  SELECT lag(doc_id) OVER (PARTITION BY k ORDER BY doc_id) AS a,
         doc_id AS b
  FROM tok
),
edges AS (
  SELECT a, b FROM chain WHERE a IS NOT NULL
  UNION ALL
  SELECT b AS a, a AS b FROM chain WHERE a IS NOT NULL
),
reach(id, r) AS (
  SELECT doc_id, doc_id FROM tok
  UNION
  SELECT reach.id, edges.b
  FROM reach JOIN edges ON edges.a = reach.r
)
SELECT id AS doc_id, min(r) AS component,
       CASE WHEN id = min(r) THEN 1 ELSE 0 END AS is_canonical
FROM reach GROUP BY id
"""


@query("dedup_cluster", oracle=_CLUSTER_ORACLE, tags=("llm-pipeline", "graph"))
def dedup_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the near-duplicate graph (docs sharing
    an identical token SET, chained pairwise): every doc labeled with
    the min doc_id of its transitive duplicate cluster; the min itself
    flagged canonical (the row a dedup keep-first would retain)."""
    docs = Tables(spark, sf_dir).documents
    tok = docs.select(
        "doc_id",
        F.array_join(
            F.array_sort(F.array_distinct(F.split("text", " "))), " "
        ).alias("k"),
    )
    w = W.partitionBy("k").orderBy("doc_id")
    half = (
        tok.select(F.lag("doc_id").over(w).alias("a"), F.col("doc_id").alias("b"))
        .filter(F.col("a").isNotNull())
    )
    edges = half.unionByName(
        half.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).localCheckpoint(eager=True)

    labels = tok.select("doc_id", F.col("doc_id").alias("component"))
    for _ in range(_MAX_ITERS):
        nbr = edges.join(
            labels, edges["a"] == labels["doc_id"]
        ).select(edges["b"].alias("doc_id"), "component")
        merged = (
            labels.unionByName(nbr)
            .groupBy("doc_id")
            .agg(F.min("component").alias("component"))
        )
        jumped = (
            merged.alias("x")
            .join(
                merged.alias("y"),
                F.col("x.component") == F.col("y.doc_id"),
                "left",
            )
            .select(
                F.col("x.doc_id").alias("doc_id"),
                F.coalesce(F.col("y.component"), F.col("x.component")).alias(
                    "component"
                ),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            jumped.alias("n")
            .join(labels.alias("o"), F.col("n.doc_id") == F.col("o.doc_id"))
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = jumped
        if changed == 0:
            break
    else:  # pragma: no cover - fixture graphs converge in <= ~6 rounds
        raise RuntimeError(f"dedup_cluster: no fixpoint in {_MAX_ITERS} iters")

    return labels.select(
        "doc_id",
        "component",
        F.when(F.col("doc_id") == F.col("component"), 1).otherwise(0).alias(
            "is_canonical"
        ),
    )


_PR_ITERS = 10
_PR_DAMP = 0.85

_PAGERANK_ORACLE = f"""
WITH RECURSIVE
edges AS (
  SELECT c_nationkey AS src, s_nationkey AS dst,
         CAST(count(*) AS DOUBLE) AS w
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey  = c_custkey
  JOIN supplier ON l_suppkey  = s_suppkey
  GROUP BY 1, 2
),
outw AS (SELECT src, sum(w) AS tw FROM edges GROUP BY src),
norm AS (
  SELECT e.src, e.dst, e.w / o.tw AS p
  FROM edges e JOIN outw o ON e.src = o.src
  UNION ALL
  SELECT CAST(n_nationkey AS INTEGER), CAST(n_nationkey AS INTEGER), 0.0
  FROM nation
),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nation),
pr(iter, id, r) AS (
  SELECT 0, CAST(n_nationkey AS INTEGER), 1.0 / (SELECT n FROM nn)
  FROM nation
  UNION ALL
  SELECT p.iter + 1, e.dst,
         {1.0 - _PR_DAMP} / (SELECT n FROM nn)
           + {_PR_DAMP} * sum(p.r * e.p)
  FROM pr p JOIN norm e ON p.id = e.src
  WHERE p.iter < {_PR_ITERS}
  GROUP BY p.iter, e.dst
)
SELECT pr.id AS nationkey, n_name, round(r, 6) AS pagerank
FROM pr JOIN nation ON pr.id = CAST(n_nationkey AS INTEGER)
WHERE iter = {_PR_ITERS}
"""


@query("graph_pagerank", oracle=_PAGERANK_ORACLE, tags=("graph", "analytics"))
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank over the nation-level trade graph (customer
    nation -> supplier nation, edge weight = lineitem count): fixed
    10-round power iteration, damping 0.85 — the iterative-algorithm
    representative with a FULL value-level oracle (DuckDB recursive CTE
    running the identical recurrence).

    The 100 TB shape: the expensive part is building the graph — a
    fact-scale join chain aggregated down to a nation x nation edge
    list (bounded: |N|^2 rows). Lineitem pre-aggregates per
    (orderkey, suppkey) riding an explicit orderkey repartition, so ONE
    exchange serves both the aggregate (hash on a subset of grouping
    keys clusters the superset — the tpch_q21 trick) and the orders
    join, and the join carries ~5x fewer rows; customer/supplier joins
    are left to Catalyst/AQE (broadcast when they fit, shuffle when
    they don't). The iteration then runs on the AGGREGATED graph, so
    its cost is independent of data scale — and because the iteration
    count is FIXED (no data-dependent convergence check), all 10
    rounds chain LAZILY into a single job over the one checkpointed
    edge table: no per-round action, no per-round lineage cut
    (dedup_cluster needs eager rounds only because its loop tests
    convergence). Self-loops with weight 0 keep every node present as
    both src and dst, so dangling nodes survive inner joins without a
    special case (their rank simply leaks — the simplified-PageRank
    convention, mirrored in the oracle). Determinism: edge weights are
    exact counts; probabilities and ranks are doubles whose
    accumulation order differs across engines at ~1e-14/iteration, far
    below the final round(6)."""
    t = Tables(spark, sf_dir)
    per_order = (
        t.lineitem.select("l_orderkey", "l_suppkey")
        .repartition("l_orderkey")
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.count("*").alias("cnt"))
    )
    edges = (
        per_order
        .join(t.orders.select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t.customer.select("c_custkey", "c_nationkey"),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(t.supplier.select("s_suppkey", "s_nationkey"),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.col("c_nationkey").alias("src"),
                 F.col("s_nationkey").alias("dst"))
        .agg(F.sum("cnt").cast("double").alias("w"))
    )
    nations = t.nation.select(
        F.col("n_nationkey").cast("int").alias("id"), "n_name"
    )
    outw = edges.groupBy("src").agg(F.sum("w").alias("tw"))
    norm = (
        edges.join(outw, "src")
        .select("src", "dst", (F.col("w") / F.col("tw")).alias("p"))
        .unionByName(
            nations.select(
                F.col("id").alias("src"),
                F.col("id").alias("dst"),
                F.lit(0.0).alias("p"),
            )
        )
        .localCheckpoint(eager=True)
    )
    n_nodes = nations.count()
    # zero nodes: the plan below is empty-on-empty anyway; the literals
    # just must not divide by zero driver-side (round-6 zero-row sweep)
    base = (1.0 - _PR_DAMP) / n_nodes if n_nodes else 0.0
    init = 1.0 / n_nodes if n_nodes else 0.0
    ranks = nations.select("id", F.lit(init).alias("r"))
    for _ in range(_PR_ITERS):
        ranks = (
            norm.join(ranks, norm["src"] == ranks["id"])
            .groupBy(F.col("dst").alias("id"))
            .agg(
                (F.lit(base) + F.lit(_PR_DAMP) * F.sum(F.col("r") * F.col("p")))
                .alias("r")
            )
        )
    return (
        ranks.join(F.broadcast(nations), "id")
        .select(F.col("id").alias("nationkey"), "n_name",
                F.round("r", 6).alias("pagerank"))
    )


_TRIANGLES_ORACLE = """
WITH os AS (
  SELECT DISTINCT l_orderkey AS o, l_suppkey AS s FROM lineitem
),
e AS (
  SELECT DISTINCT a.s AS a, b.s AS b
  FROM os a JOIN os b ON a.o = b.o AND a.s < b.s
),
tri AS (
  SELECT count(*) AS n_triangles
  FROM e e1
  JOIN e e2 ON e2.a = e1.b
  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
)
SELECT (SELECT count(*) FROM e) AS n_edges,
       (SELECT count(*) FROM (SELECT DISTINCT a FROM e
                              UNION SELECT DISTINCT b FROM e)) AS n_vertices,
       n_triangles
FROM tri
"""


@query("graph_triangles", oracle=_TRIANGLES_ORACLE, tags=("graph",))
def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting over the supplier co-occurrence graph (two
    suppliers are adjacent iff they ship lines of the same order).

    The scale-correct formulation, not the naive one:

    - Edge generation is GROUP-COLLECT + in-group expansion (the
      dedup_minhash pair pattern): suppliers per order are collected
      once and pairs stream out of a generator — no order-keyed
      self-join that re-executes the scan per side.
    - Edges are ORIENTED BY DEGREE (lower (deg, id) -> higher): every
      triangle is counted exactly once (acyclic orientation by a total
      order), and wedge generation from the low-degree endpoint bounds
      per-vertex fan-out by O(sqrt(|E|)) on skewed graphs — the
      classical bound; orienting by raw id instead lets one hub vertex
      produce O(d^2) wedges. The DuckDB oracle counts canonically by
      id (orientation-invariant quantity, trivially checkable SQL).
    - The closing-edge check is a LEFT SEMI join (no payload, no
      fan-out). Wedges join oriented edges on one key; with u<v<w in
      the degree order the closing edge is guaranteed oriented u->w.

    At 100 TB: two shuffles (order-group collect, wedge join) plus a
    degree aggregation; no step is quadratic in any per-vertex degree
    beyond the oriented wedge bound."""
    li = (
        Tables(spark, sf_dir)
        .lineitem.select("l_orderkey", "l_suppkey")
        .distinct()
    )
    grouped = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_suppkey")).alias("ss")
    )
    pairs = (
        grouped.select(
            F.explode(
                F.expr(
                    "flatten(transform(ss, (x, i) -> "
                    "transform(slice(ss, i + 2, size(ss)), "
                    "y -> struct(x AS a, y AS b))))"
                )
            ).alias("p")
        )
        .select("p.a", "p.b")
        .distinct()
        # The edge list feeds FIVE consumers (degree counts twice, the
        # orientation join, the edge count, and — via `oriented` — the
        # wedge join's two sides plus the closing-edge probe). Without
        # a cut, each consumer re-plans the whole collect+expand+
        # distinct pipeline (46 static Exchange nodes measured);
        # materializing the edges once is the dedup_cluster discipline
        # for multi-pass graph algorithms, and |E| << |lineitem| makes
        # it cheap at any scale.
        .localCheckpoint(eager=False)
    )
    deg = (
        pairs.select(F.col("a").alias("v"))
        .unionAll(pairs.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("d"))
    )
    da = deg.select(
        F.col("v").alias("a"), F.col("d").alias("da")
    )
    db = deg.select(
        F.col("v").alias("b"), F.col("d").alias("db")
    )
    withd = pairs.join(da, "a").join(db, "b")
    fwd = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = withd.select(
        F.when(fwd, F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(fwd, F.col("b")).otherwise(F.col("a")).alias("dst"),
    ).localCheckpoint(eager=False)  # 3 consumers: wedge L/R + closing probe
    L = oriented.alias("L")
    R = oriented.alias("R")
    wedges = L.join(R, F.col("L.dst") == F.col("R.src")).select(
        F.col("L.src").alias("src"), F.col("R.dst").alias("dst")
    )
    tri = wedges.join(oriented, ["src", "dst"], "left_semi").agg(
        F.count("*").alias("n_triangles")
    )
    edges_cnt = pairs.agg(F.count("*").alias("n_edges"))
    verts_cnt = deg.agg(F.count("*").alias("n_vertices"))
    return edges_cnt.crossJoin(verts_cnt).crossJoin(tri)
