"""Round-9 verdict item #7: compositional fuzzing for the VECTOR
pipeline family.

The doc fuzzer (test_compose_docs_fuzz.py) covers text granularity
switches; real embedding pipelines compose VECTOR kernels — clean ->
norm/quantize -> query-dot -> sign-bucket -> dedup-window -> topk ->
aggregate — and composition is again where per-op differentials go
blind (a cosine computed against a quantized column, a dedup window
keyed on a derived bucket, a top-k after a filter that emptied a
label). This generator builds seeded random vector pipelines over
`embeddings` and renders each AST twice: a Spark DataFrame chain and
nested DuckDB SQL, compared exactly.

Determinism doctrine (all twins PROVEN by the registry's full oracles):
- dot products: the `_dot` sequential HOF fold <-> DuckDB
  `list_dot_product` on `embedding::DOUBLE[]` — bit-identical IEEE
  accumulation (sim_topk's full oracle is the proof); every derived
  float is rounded to 6 dp AT DERIVATION and thereafter only compared,
  min/max'd, or grouped — never summed;
- int8 quantization: scale = max|x|/127, q = floor(x/scale + 0.5) —
  tie-free on both engines (vec_quantize_int8's full oracle);
- sign buckets: CASE on >= 0 over fixed dims — exact integers;
- dedup/topk windows: row_number with full tiebreaks — deterministic;
- LIMIT always preceded by ORDER BY over all output columns.

Seeds 0..5 run in the fast tier; 6..71 under -m sweep (66 more, >=60
per the verdict's done-bar).
"""

from __future__ import annotations

import random

import pytest

SF = "/root/testdata/sf0.01"

# 1-indexed probe dims for sign buckets / per-dim derivations
DIMS = (1, 7, 13, 21, 33, 47, 55, 64)


class VecRel:
    """Pipeline state: Spark DataFrame, equivalent SQL, live (name,
    kind) schema. kind: int | cat | f6 (6-dp-rounded double) | vec.
    ``granularity`` flips to 'agg' after a groupBy."""

    def __init__(self, df, sql, cols, granularity="vec"):
        self.df, self.sql = df, sql
        self.cols = list(cols)
        self.granularity = granularity

    def kinds(self, *wanted):
        return [c for c, k in self.cols if k in wanted]

    def names(self):
        return [c for c, _ in self.cols]


def _emb_glob(sf: str) -> str:
    """Scaled fixtures are directory-backed parquet; DuckDB needs the
    recursive glob there (same binding rule as bench._duck_connect)."""
    import os

    p = f"{sf}/embeddings.parquet"
    return f"{p}/**/*.parquet" if os.path.isdir(p) else p


def _base_sql(sf: str) -> str:
    return (
        "SELECT vec_id, label, embedding::DOUBLE[] AS v "
        f"FROM read_parquet('{_emb_glob(sf)}') "
        "WHERE embedding IS NOT NULL AND len(embedding) = 64 "
        "AND coalesce(list_aggregate(list_transform(embedding, "
        "x -> x <> 0), 'bool_or'), false)"
    )


def _base(spark, sf: str) -> VecRel:
    from pandas_tsdb_spark.operators.llm_vectors import _clean_embeddings

    df = _clean_embeddings(
        spark.read.parquet(f"{sf}/embeddings.parquet")
    ).select("vec_id", "label", "embedding")
    cols = [("vec_id", "int"), ("label", "cat"), ("embedding", "vec")]
    return VecRel(df, _base_sql(sf), cols)


def _op_norm(rel: VecRel, rng: random.Random) -> VecRel | None:
    """Derive the 6-dp L2 norm via the proven dot twin."""
    from pyspark.sql import functions as F

    from pandas_tsdb_spark.operators.llm_vectors import _dot

    if "embedding" not in rel.names() or "norm" in rel.names():
        return None
    df = rel.df.withColumn(
        "norm", F.round(F.sqrt(_dot(F.col("embedding"), F.col("embedding"))), 6)
    )
    sql = (
        f"SELECT *, round(sqrt(list_dot_product(v, v)), 6) AS norm "
        f"FROM ({rel.sql}) t"
    )
    return VecRel(df, sql, rel.cols + [("norm", "f6")], rel.granularity)


def _op_query_dot(rel: VecRel, rng: random.Random, sf: str) -> VecRel | None:
    """Cosine against a fixed query vector (vec_id chosen from the
    first 5) via broadcast 1-row cross join — the sim_topk shape
    composed mid-pipeline."""
    from pyspark.sql import functions as F

    from pandas_tsdb_spark.operators.llm_vectors import _dot

    if "embedding" not in rel.names() or "qcos" in rel.names():
        return None
    qid = rng.randint(0, 4)
    qdf = (
        rel.df.sparkSession.read.parquet(f"{sf}/embeddings.parquet")
        .filter(F.col("vec_id") == qid)
        .select(F.col("embedding").alias("qemb"))
    )
    dot = _dot(F.col("embedding"), F.col("qemb"))
    qn = F.sqrt(_dot(F.col("qemb"), F.col("qemb")))
    vn = F.sqrt(_dot(F.col("embedding"), F.col("embedding")))
    df = (
        rel.df.crossJoin(F.broadcast(qdf))
        .withColumn("qcos", F.round(dot / (vn * qn), 6))
        .drop("qemb")
    )
    sql = (
        "SELECT t.*, round(list_dot_product(t.v, q.qv) / "
        "(sqrt(list_dot_product(t.v, t.v)) * "
        "sqrt(list_dot_product(q.qv, q.qv))), 6) AS qcos "
        f"FROM ({rel.sql}) t CROSS JOIN "
        f"(SELECT embedding::DOUBLE[] AS qv FROM "
        f"read_parquet('{_emb_glob(sf)}') WHERE vec_id = {qid}) q"
    )
    return VecRel(df, sql, rel.cols + [("qcos", "f6")], rel.granularity)


def _op_quantize_dims(rel: VecRel, rng: random.Random) -> VecRel | None:
    """int8-quantize 2 fixed dims: scale = max|x|/127 per row,
    q = floor(x/scale + 0.5) — exact integers (vec_quantize_int8's
    tie-free law, composed per-dimension)."""
    from pyspark.sql import functions as F

    if "embedding" not in rel.names() or "q_a" in rel.names():
        return None
    d1, d2 = rng.sample(DIMS, 2)
    scale = (
        F.aggregate(
            F.col("embedding"),
            F.lit(0.0),
            lambda acc, x: F.greatest(acc, F.abs(x.cast("double"))),
        )
        / 127.0
    )
    df = rel.df.withColumn("scale", scale)
    cols = rel.cols
    out_cols = []
    for tag, d in (("q_a", d1), ("q_b", d2)):
        df = df.withColumn(
            tag,
            F.floor(
                F.element_at("embedding", d).cast("double") / F.col("scale")
                + F.lit(0.5)
            ).cast("long"),
        )
        out_cols.append((tag, "int"))
    df = df.drop("scale")
    sql = (
        "SELECT *, "
        f"CAST(floor(v[{d1}] / (list_aggregate(list_transform(v, "
        f"x -> abs(x)), 'max') / 127.0) + 0.5) AS BIGINT) AS q_a, "
        f"CAST(floor(v[{d2}] / (list_aggregate(list_transform(v, "
        f"x -> abs(x)), 'max') / 127.0) + 0.5) AS BIGINT) AS q_b "
        f"FROM ({rel.sql}) t"
    )
    return VecRel(df, sql, cols + out_cols, rel.granularity)


def _op_sign_bucket(rel: VecRel, rng: random.Random) -> VecRel | None:
    """Sign-pattern bucket over k fixed dims — exact integer (the
    dedup_embedding bucket law, composed)."""
    from pyspark.sql import functions as F

    if "embedding" not in rel.names() or "sbucket" in rel.names():
        return None
    k = rng.randint(3, 6)
    dims = rng.sample(DIMS, k)
    sb = sum(
        F.when(F.element_at("embedding", d) >= 0, 1 << j).otherwise(0)
        for j, d in enumerate(dims)
    )
    sb_sql = " + ".join(
        f"(CASE WHEN v[{d}] >= 0 THEN {1 << j} ELSE 0 END)"
        for j, d in enumerate(dims)
    )
    return VecRel(
        rel.df.withColumn("sbucket", sb.cast("long")),
        f"SELECT *, CAST({sb_sql} AS BIGINT) AS sbucket FROM ({rel.sql}) t",
        rel.cols + [("sbucket", "int")],
        rel.granularity,
    )


def _op_filter(rel: VecRel, rng: random.Random) -> VecRel | None:
    from pyspark.sql import functions as F

    cands = []
    if "vec_id" in rel.names():
        hi = rng.choice([100, 250, 400])
        cands.append((F.col("vec_id") < hi, f"vec_id < {hi}"))
    if "label" in rel.names():
        labs = rng.sample(range(10), rng.randint(2, 5))
        in_sql = ", ".join(str(x) for x in labs)
        cands.append((F.col("label").isin(labs), f"label IN ({in_sql})"))
    for c in ("norm", "qcos"):
        if c in rel.names():
            thr = round(rng.uniform(-0.2, 0.9), 2)
            op = rng.choice([">=", "<"])
            col = F.col(c) >= thr if op == ">=" else F.col(c) < thr
            cands.append((col, f"{c} {op} {thr}"))
    if "sbucket" in rel.names():
        m = rng.randint(1, 7)
        cands.append((F.col("sbucket") % 8 < m, f"sbucket % 8 < {m}"))
    if not cands or rel.granularity == "agg":
        return None
    pred_df, pred_sql = cands[rng.randrange(len(cands))]
    return VecRel(
        rel.df.filter(pred_df),
        f"SELECT * FROM ({rel.sql}) t WHERE {pred_sql}",
        rel.cols,
        rel.granularity,
    )


def _op_dedup_window(rel: VecRel, rng: random.Random) -> VecRel | None:
    """Keep min-vec_id per bucket key — the dedup_embedding keep law as
    a composable stage (row_number with a full tiebreak)."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    keys = [c for c in ("label", "sbucket", "cbucket") if c in rel.names()]
    if not keys or "vec_id" not in rel.names() or rel.granularity == "agg":
        return None
    keys = keys[: rng.randint(1, len(keys))]
    w = W.partitionBy(*keys).orderBy(F.col("vec_id").asc())
    df = (
        rel.df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    # the vector column is `embedding` on the Spark side, `v` in SQL
    names = ", ".join("v" if k == "vec" else c for c, k in rel.cols)
    sql = (
        f"SELECT {names} FROM (SELECT t.*, row_number() OVER "
        f"(PARTITION BY {', '.join(keys)} ORDER BY vec_id ASC) AS rn "
        f"FROM ({rel.sql}) t) WHERE rn = 1"
    )
    return VecRel(df, sql, rel.cols, rel.granularity)


def _op_topk_window(rel: VecRel, rng: random.Random) -> VecRel | None:
    """Top-k per label by a derived 6-dp score (qcos/norm) — the
    sim_topk rank law composed over pipeline-derived scores."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    scores = [c for c in ("qcos", "norm") if c in rel.names()]
    if (
        not scores
        or "label" not in rel.names()
        or "vec_id" not in rel.names()
        or "rk" in rel.names()  # a second topk would duplicate the column
        or rel.granularity == "agg"
    ):
        return None
    score = scores[rng.randrange(len(scores))]
    k = rng.choice([3, 5, 10])
    w = W.partitionBy("label").orderBy(
        F.col(score).desc(), F.col("vec_id").asc()
    )
    df = rel.df.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= k
    )
    sql = (
        f"SELECT * FROM (SELECT t.*, row_number() OVER (PARTITION BY label "
        f"ORDER BY {score} DESC, vec_id ASC) AS rk FROM ({rel.sql}) t) "
        f"WHERE rk <= {k}"
    )
    return VecRel(df, sql, rel.cols + [("rk", "int")], rel.granularity)


_SEED_CACHE: dict[str, list] = {}


def _op_cluster_assign(rel: VecRel, rng: random.Random, sf: str) -> VecRel | None:
    """Nearest-seed-centroid bucket (vec_kmeans' assignment kernel,
    generation-2 stage): adds `cbucket` via the pinned distance algebra
    (three sequential folds, argmin tie-broken on cid) against the k=8
    lowest GLOBAL vec_ids — so the bucket is stable under upstream
    filters, like a production cluster id computed at ingest."""
    from pyspark.sql import functions as F

    from pandas_tsdb_spark.operators.llm_vectors import (
        _clean_embeddings,
        _dot,
        _km_seq_sqnorm,
        _KM_K,
    )

    if (
        "embedding" not in rel.names()
        or "vec_id" not in rel.names()
        or "cbucket" in rel.names()
        or rel.granularity == "agg"
    ):
        return None
    if sf not in _SEED_CACHE:
        _SEED_CACHE[sf] = sorted(
            (int(r.vec_id), [float(v) for v in r.embedding])
            for r in _clean_embeddings(
                rel.df.sparkSession.read.parquet(f"{sf}/embeddings.parquet")
            )
            .filter(F.col("vec_id") < _KM_K)
            .select("vec_id", "embedding")
            .collect()
        )
    x = F.col("embedding")
    dxx = _dot(x, x)
    structs = [
        F.struct(
            (
                dxx
                - 2.0 * _dot(x, F.array(*[F.lit(v) for v in c]))
                + F.lit(_km_seq_sqnorm(c))
            ).alias("d2"),
            F.lit(int(cid)).alias("cid"),
        )
        for cid, c in _SEED_CACHE[sf]
    ]
    df = rel.df.withColumn(
        "cbucket",
        F.coalesce(F.array_min(F.array(*structs)).getField("cid"), F.lit(-1)),
    )
    sql = (
        f"SELECT * EXCLUDE (_rk, c) FROM ("
        f"SELECT t.*, c0.cid AS cbucket, c0.c, row_number() OVER ("
        f"PARTITION BY t.vec_id ORDER BY "
        f"list_dot_product(t.v, t.v) - 2*list_dot_product(t.v, c0.c) "
        f"+ list_dot_product(c0.c, c0.c), c0.cid) AS _rk "
        f"FROM ({rel.sql}) t CROSS JOIN ("
        f"SELECT vec_id AS cid, v AS c FROM ({_base_sql(sf)}) e "
        f"WHERE vec_id < {_KM_K}) c0) WHERE _rk = 1"
    )
    return VecRel(df, sql, rel.cols + [("cbucket", "cat")], rel.granularity)


def _op_groupby(rel: VecRel, rng: random.Random) -> VecRel | None:
    """Aggregate: exact counts and int sums; floats only via min/max
    of already-6dp-rounded values."""
    from pyspark.sql import functions as F

    keyable = [c for c in ("label", "sbucket", "cbucket") if c in rel.names()]
    if not keyable or rel.granularity == "agg":
        return None
    keys = rng.sample(keyable, rng.randint(1, len(keyable)))
    kinds = dict(rel.cols)
    aggs_df = [F.count(F.lit(1)).alias("cnt")]
    aggs_sql = ["count(*) AS cnt"]
    cols = [(k, kinds[k]) for k in keys] + [("cnt", "int")]
    ints = [c for c in rel.kinds("int") if c not in keys]
    for c in rng.sample(ints, min(len(ints), 2)):
        fn = rng.choice(["sum", "min", "max"])
        if fn == "sum":
            aggs_df.append(F.sum(F.col(c)).alias(f"sum_{c}"))
            aggs_sql.append(f"CAST(sum({c}) AS BIGINT) AS sum_{c}")
        else:
            aggs_df.append(getattr(F, fn)(F.col(c)).alias(f"{fn}_{c}"))
            aggs_sql.append(f"{fn}({c}) AS {fn}_{c}")
        cols.append((f"{fn}_{c}", "int"))
    for c in rel.kinds("f6"):
        fn = rng.choice(["min", "max"])
        aggs_df.append(getattr(F, fn)(F.col(c)).alias(f"{fn}_{c}"))
        aggs_sql.append(f"{fn}({c}) AS {fn}_{c}")
        cols.append((f"{fn}_{c}", "f6"))
    return VecRel(
        rel.df.groupBy(*keys).agg(*aggs_df),
        f"SELECT {', '.join(list(keys) + aggs_sql)} FROM ({rel.sql}) t "
        f"GROUP BY {', '.join(keys)}",
        cols,
        "agg",
    )


def _op_sort_limit(rel: VecRel, rng: random.Random) -> VecRel:
    from pyspark.sql import functions as F

    n = rng.choice([7, 40, 200])
    sortable = [c for c, k in rel.cols if k != "vec"]
    order_df, order_sql = [], []
    for c in sortable:
        if rng.random() < 0.5:
            order_df.append(F.col(c).asc_nulls_first())
            order_sql.append(f"{c} ASC NULLS FIRST")
        else:
            order_df.append(F.col(c).desc_nulls_last())
            order_sql.append(f"{c} DESC NULLS LAST")
    cols = [(c, k) for c, k in rel.cols if k != "vec"]
    names = ", ".join(c for c, _ in cols)
    return VecRel(
        rel.df.orderBy(*order_df).limit(n).select(*[c for c, _ in cols]),
        f"SELECT {names} FROM ({rel.sql}) t "
        f"ORDER BY {', '.join(order_sql)} LIMIT {n}",
        cols,
        rel.granularity,
    )


def build_vec_pipeline(spark, seed: int, sf: str = SF) -> VecRel:
    rng = random.Random(10_000 + seed)
    rel = _base(spark, sf)
    # generation-2 pipelines (seeds >= 100) may draw the cluster-assign
    # stage; seeds < 100 keep their exact original op mapping (the
    # at-scale records replay those pipelines verbatim).
    gen2 = seed >= 100
    n_steps = rng.randint(2, 6)
    for _step in range(n_steps):
        roll = rng.random()
        nxt = None
        if gen2 and roll < 0.10:
            nxt = _op_cluster_assign(rel, rng, sf)
        elif roll < 0.14:
            nxt = _op_norm(rel, rng)
        elif roll < 0.30:
            nxt = _op_query_dot(rel, rng, sf)
        elif roll < 0.42:
            nxt = _op_quantize_dims(rel, rng)
        elif roll < 0.56:
            nxt = _op_sign_bucket(rel, rng)
        elif roll < 0.72:
            nxt = _op_filter(rel, rng)
        elif roll < 0.82:
            nxt = _op_dedup_window(rel, rng)
        elif roll < 0.90:
            nxt = _op_topk_window(rel, rng)
        else:
            nxt = _op_groupby(rel, rng)
        if nxt is not None:
            rel = nxt
    # vectors never reach the comparator (pandas list-of-float compare
    # is ambiguous); project them away via the final sort+limit, or an
    # explicit projection when no limit rolled
    if rng.random() < 0.6 or "embedding" in rel.names():
        rel = _op_sort_limit(rel, rng)
    return rel


def _run(spark, seed: int, sf: str = SF) -> None:
    import duckdb

    from tests.harness import compare

    rel = build_vec_pipeline(spark, seed, sf)
    sp = rel.df.toPandas()
    du = duckdb.connect().execute(rel.sql).fetchdf()
    errs = compare(sp, du, f"vec_compose_seed{seed}")
    assert not errs, (errs[:5], rel.sql)


@pytest.mark.parametrize("seed", range(6))
def test_vec_compose_smoke(spark, seed):
    """Fast-tier subset: 6 seeded vector pipelines."""
    _run(spark, seed)


@pytest.mark.sweep
@pytest.mark.parametrize("seed", range(6, 72))
def test_vec_compose_sweep(spark, seed):
    """Sweep tier: 66 more seeded vector pipelines (>=60 per the
    round-9 done-bar)."""
    _run(spark, seed)


@pytest.mark.sweep
@pytest.mark.parametrize("seed", range(8))
def test_vec_compose_sf01(spark, seed):
    """The same generator at sf0.1 (50k vectors) — 10x the vectors
    through every generated plan."""
    _run(spark, seed, "/root/testdata/sf0.1")

@pytest.mark.parametrize("seed", range(100, 104))
def test_vec_compose_gen2_smoke(spark, seed):
    """Fast tier: generation-2 pipelines (cluster-assign stage live)."""
    _run(spark, seed)


@pytest.mark.sweep
@pytest.mark.parametrize("seed", range(104, 140))
def test_vec_compose_gen2_sweep(spark, seed):
    """Sweep tier: 36 more generation-2 vector pipelines."""
    _run(spark, seed)
