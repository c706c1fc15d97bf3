"""§2.9 vector operators: cosine top-k, threshold pairs, kNN labeling,
LSH-bucketed ANN, multimodal columns (text+vector+binary through one
plan).

Numeric discipline: embeddings are float32 arrays; both engines cast to
double FIRST, then multiply-accumulate sequentially (Spark
zip_with+aggregate generates a left-to-right loop; DuckDB
list_dot_product likewise), so dot products are bit-identical and only
the final cosine is rounded (6) before ranking — making top-k ranks
deterministic across engines with the vec_id tie-break.

Scale designs:
- sim_topk: the query set is the SMALL side -> broadcast it against the
  full collection; per-query top-k via window. At 100 TB the collection
  stays partitioned, queries replicate, no all-pairs shuffle.
- sim_pairs_threshold: label-bucketed self-join keeps the pair space
  sub-quadratic (the general technique: any coarse bucket — LSH bucket,
  cluster id, shard key — bounds the quadratic term per bucket).
- ann_lsh: random-hyperplane signatures via a seeded numpy kernel in
  mapInPandas (Arrow-batched); exact re-scoring only within a bucket.
  Recall vs brute force is asserted in tests, not assumed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from pandas_tsdb_spark.catalog import Tables, artifact_memo
from pandas_tsdb_spark.registry import query

_N_QUERIES = 20  # vec_id < 20 are the demo query vectors
_TOP_K = 5


def _dot(a, b):  # bit-stable double dot product
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _seq_sqnorm(X: np.ndarray) -> np.ndarray:
    """Per-row sum of squares accumulated dimension-by-dimension — the
    exact IEEE order of the `_dot(x, x)` sequential fold (acc starts at
    0.0, adds x_d*x_d left to right), vectorized across rows. Bit-
    identical to the Spark HOF fold and DuckDB list_dot_product."""
    acc = np.zeros(X.shape[0])
    for d in range(X.shape[1]):
        acc += X[:, d] * X[:, d]
    return acc


def _seq_dots(E: np.ndarray, Q: np.ndarray) -> np.ndarray:
    """(n,dim) x (m,dim) -> (n,m) dot products in the sequential fold
    order: each acc[i,j] accumulates E[i,d]*Q[j,d] for d = 0..dim-1,
    one float64 multiply + one add per step — the same single-rounding
    sequence as `_dot`, so results are bit-identical to the expression
    path (unlike BLAS matmul, which reassociates the sum)."""
    acc = np.zeros((E.shape[0], Q.shape[0]))
    for d in range(E.shape[1]):
        acc += E[:, d, None] * Q[None, :, d]
    return acc



# A scraped corpus's embedding column contains NULLs (failed encoder
# calls), empty arrays, zero vectors (padding artifacts), and RAGGED
# rows whose length is not the encoder's declared dimension (a model
# swap mid-ingest, a truncated write). None carries a usable direction,
# numpy kernels np.stack() straight into a hard job failure on
# NULL/ragged rows, and zero vectors poison cosine math with 0/0 NaNs —
# so the vector surface's contract is: such rows are EXCLUDED,
# uniformly, in every op and its oracle (round-6 dirty-embeddings +
# ragged-dims sweeps; the latter measured 13 of 16 vector ops crashing
# on a 32-dim row slipped into a 64-dim collection). The oracle-side
# twin of this predicate is
#   embedding IS NOT NULL AND len(embedding) = 64 AND coalesce(
#       list_aggregate(list_transform(embedding, x -> x <> 0),
#                      'bool_or'), false)
_EMB_DIM = 64  # the fixture encoder's declared output dimension
_VALID_EMB = (
    f"embedding IS NOT NULL AND size(embedding) = {_EMB_DIM}"
    " AND exists(embedding, x -> x <> CAST(0.0 AS DOUBLE))"
)


def _qblock(spark: SparkSession, sf_dir: str, e: DataFrame, *cols: str):
    """Collected query block (vec_id < _N_QUERIES), memoized per fixture
    file via catalog.artifact_memo: bounded by contract, deterministic
    given the file, so a session re-running a vector op pays the collect
    job once per fixture instead of once per call."""
    return artifact_memo(
        spark,
        sf_dir,
        "embeddings",
        "qblock:" + ",".join(cols),
        lambda: (
            e.filter(F.col("vec_id") < _N_QUERIES).select(*cols).collect()
        ),
    )


def _valid_count(spark: SparkSession, sf_dir: str, e: DataFrame) -> int:
    """count() of valid embeddings, memoized per fixture file — the ANN
    geometry scalers (_ivf_geometry, _pq_cand) all need it and a session
    shouldn't pay a count job per ANN call on an unchanged file."""
    return artifact_memo(
        spark, sf_dir, "embeddings", "valid_count", lambda: e.count()
    )


def _codebook_sample(spark: SparkSession, sf_dir: str, e: DataFrame):
    """The 4096-row md5-ordered training sample shared by every
    codebook-trained ANN family (bit-reproducible: md5 order is a pure
    function of vec_id), memoized per fixture file via artifact_memo —
    ann_ivf / ann_pq / ann_ivf_pq / ann_recall in one session train from
    ONE collected sample instead of four identical sample jobs."""
    return artifact_memo(
        spark,
        sf_dir,
        "embeddings",
        "codebook_sample_4096",
        lambda: (
            e.withColumn("r", F.md5(F.col("vec_id").cast("string")))
            .orderBy("r", "vec_id")
            .limit(4096)
            .select("embedding")
            .collect()
        ),
    )


def _clean_embeddings(df: DataFrame) -> DataFrame:
    """Drop rows whose embedding is NULL, empty, or zero-norm (no
    direction). Pure codegen predicate — evaluated during the scan,
    no Python, no shuffle."""
    return df.filter(F.expr(_VALID_EMB))


def _with_norm(df: DataFrame, out: str = "norm") -> DataFrame:
    return df.withColumn(out, F.sqrt(_dot(F.col("embedding"), F.col("embedding"))))


_DUCK_COS = (
    "round(list_dot_product(a.v, b.v) / "
    "(sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6)"
)


@query(
    "sim_topk",
    oracle=f"""
    WITH e AS MATERIALIZED (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
               WHERE embedding IS NOT NULL AND len(embedding) = 64 AND coalesce(list_aggregate(list_transform(embedding, x -> x <> 0), 'bool_or'), false))
    SELECT query_id, neighbor_id, cos, rk FROM (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               {_DUCK_COS} AS cos,
               row_number() OVER (PARTITION BY a.vec_id
                   ORDER BY {_DUCK_COS} DESC, b.vec_id) AS rk
        FROM e a JOIN e b ON b.vec_id != a.vec_id
        WHERE a.vec_id < {_N_QUERIES}
    ) WHERE rk <= {_TOP_K}
    """,
)
def sim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k per query vector (the exactness baseline;
    ann_lsh is the scale path).

    Round-2 rewrite: the dot products run as a sequential-order numpy
    kernel per Arrow batch (`_seq_dots`/`_seq_sqnorm`) instead of the
    interpreted per-element HOF fold — every raw cosine is BIT-identical
    to the expression path (same casts, same left-to-right IEEE
    accumulation, same qnorm*norm denominator), so the full DuckDB
    oracle is unchanged while throughput matches the BLAS twin's shape
    (the r1-measured 37x gap; sim_topk_blas keeps the reassociated
    matmul variant). Rounding stays ON THE SPARK SIDE (F.round of the
    raw double) — the same operator r1 hash-matched against DuckDB.

    Scale design: the query block rides in the closure (bounded by
    contract), the collection streams through executors batch by batch,
    each batch emits only ~|queries| x k candidate rows, and the global
    window merges that tiny candidate stream. Nothing quadratic shuffles
    at any collection size. The local cut is PROVABLY lossless against
    the global (rounded-cosine desc, id) ranking without reproducing
    Spark's decimal rounding locally: two raws that round to the same
    6-dp value differ by < 1e-6, so keeping every row within 1e-6 of
    the batch's k-th largest raw cosine retains every candidate that
    could still tie into the global top-k (a dropped row has >= k batch
    rows more than 1e-6 above it -> strictly greater rounded cosine ->
    it can never rank <= k). Round-3 fix of the round-2 ADVICE nonzero
    divergence window (the old k+32 raw cut)."""
    e = _clean_embeddings(Tables(spark, sf_dir).embeddings)
    q_rows = _qblock(spark, sf_dir, e, "vec_id", "embedding")
    q_ids = np.array([r.vec_id for r in q_rows], dtype="int64")
    # empty query block (empty or fully-invalid collection): the
    # numpy prep below is axis-1 math over a 0-d array — skip it and
    # make the kernel a no-op, so the op returns a typed empty frame
    # through its NORMAL plan (round-6 zero-row sweep).
    Q = np.array([r.embedding for r in q_rows], dtype=np.float64) if q_rows else None
    qn = np.sqrt(_seq_sqnorm(Q)) if q_rows else None

    def local_topm(batches):
        if Q is None:
            return
        for pdf in batches:
            if not len(pdf):
                continue
            E = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            ids = pdf["vec_id"].to_numpy()
            norms = np.sqrt(_seq_sqnorm(E))
            # qnorm * norm first, then one division — operand-for-operand
            # the expression path's `dot / (qnorm * norm)`.
            cos = _seq_dots(E, Q) / (norms[:, None] * qn[None, :])
            out_q, out_n, out_c = [], [], []
            for j, qid in enumerate(q_ids):
                col = cos[:, j].copy()
                col[ids == qid] = -np.inf  # exclude self
                take = min(_TOP_K, len(col))
                kth = col[np.argpartition(-col, take - 1)[:take]].min()
                # lossless tie window: double(1e-6) > decimal 1e-6, so
                # every same-rounded-value row clears the threshold
                keep = np.flatnonzero(col >= kth - 1e-6)
                keep = keep[col[keep] > -np.inf]
                out_q.extend([qid] * len(keep))
                out_n.extend(ids[keep])
                out_c.extend(col[keep])
            yield pd.DataFrame(
                {
                    "query_id": np.array(out_q, dtype="int64"),
                    "neighbor_id": np.array(out_n, dtype="int64"),
                    "cos_raw": np.array(out_c, dtype="float64"),
                }
            )

    cand = e.select("vec_id", "embedding").mapInPandas(
        local_topm, "query_id long, neighbor_id long, cos_raw double"
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), "neighbor_id")
    return (
        cand.select("query_id", "neighbor_id", F.round("cos_raw", 6).alias("cos"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _TOP_K)
    )


@query("sim_topk_blas", oracle=None)  # BLAS sum order != sequential; rows-only
def sim_topk_blas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sim_topk's high-throughput twin: numpy matmul per Arrow batch +
    two-phase top-k (local per-batch top-k, then a tiny global merge
    window). This is the exact-search pattern that holds at 100 TB: the
    collection streams through executors in batches, the query block
    rides in a closure broadcast, nothing quadratic ever shuffles —
    only |queries| x k rows per batch reach the merge. No oracle: BLAS
    accumulates dot products in a different order than the sequential
    spec, so cosines differ in the last ulps (ranks are asserted equal
    to sim_topk in tests, away from ties)."""
    e = _clean_embeddings(Tables(spark, sf_dir).embeddings)
    q_rows = _qblock(spark, sf_dir, e, "vec_id", "embedding")
    q_ids = np.array([r.vec_id for r in q_rows], dtype="int64")
    # empty query block: no-op kernel, typed empty result (zero-row sweep)
    Q = np.array([r.embedding for r in q_rows], dtype=np.float64) if q_rows else None
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True) if q_rows else None
    k = _TOP_K

    def local_topk(batches):
        if Qn is None:
            return
        for pdf in batches:
            E = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            En = E / np.linalg.norm(E, axis=1, keepdims=True)
            sim = En @ Qn.T  # (batch, n_queries)
            ids = pdf["vec_id"].to_numpy()
            out_q, out_n, out_c = [], [], []
            for j, qid in enumerate(q_ids):
                col = sim[:, j].copy()
                col[ids == qid] = -np.inf  # exclude self
                take = min(k, len(col))
                top = np.argpartition(-col, take - 1)[:take]
                out_q.extend([qid] * take)
                out_n.extend(ids[top])
                out_c.extend(col[top])
            yield pd.DataFrame(
                {
                    "query_id": np.array(out_q, dtype="int64"),
                    "neighbor_id": np.array(out_n, dtype="int64"),
                    "cos": np.round(out_c, 6),
                }
            )

    cand = e.select("vec_id", "embedding").mapInPandas(
        local_topk, "query_id long, neighbor_id long, cos double"
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), "neighbor_id")
    return (
        cand.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .filter(F.col("cos") > float("-inf"))
    )


@query(
    "sim_pairs_threshold",
    oracle=f"""
    WITH e AS MATERIALIZED (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
               WHERE embedding IS NOT NULL AND len(embedding) = 64 AND coalesce(list_aggregate(list_transform(embedding, x -> x <> 0), 'bool_or'), false))
    SELECT a.vec_id AS id_a, b.vec_id AS id_b, {_DUCK_COS} AS cos
    FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE {_DUCK_COS} >= 0.75
    """,
)
def sim_pairs_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All pairs with cosine >= 0.75 within a label bucket — the bucketed
    self-join shape that bounds the quadratic pair space per bucket."""
    e = _with_norm(_clean_embeddings(Tables(spark, sf_dir).embeddings))
    a = e.select("vec_id", "label", "embedding", "norm")
    b = (
        e.select(
            F.col("vec_id").alias("vec_id_b"),
            F.col("label").alias("label_b"),
            F.col("embedding").alias("embedding_b"),
            F.col("norm").alias("norm_b"),
        )
    )
    cos = F.round(
        _dot(F.col("embedding"), F.col("embedding_b")) / (F.col("norm") * F.col("norm_b")),
        6,
    )
    return (
        a.join(
            b,
            (F.col("label") == F.col("label_b"))
            & (F.col("vec_id") < F.col("vec_id_b")),
        )
        .withColumn("cos", cos)
        .filter(F.col("cos") >= 0.75)
        .select(
            F.col("vec_id").alias("id_a"), F.col("vec_id_b").alias("id_b"), "cos"
        )
    )


@query(
    "knn_label",
    oracle=f"""
    WITH e AS MATERIALIZED (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
               WHERE embedding IS NOT NULL AND len(embedding) = 64 AND coalesce(list_aggregate(list_transform(embedding, x -> x <> 0), 'bool_or'), false)),
    ranked AS (
        SELECT a.vec_id AS query_id, a.label AS true_label,
               b.label AS cand_label,
               row_number() OVER (PARTITION BY a.vec_id
                   ORDER BY {_DUCK_COS} DESC, b.vec_id) AS rk
        FROM e a JOIN e b ON b.vec_id >= {_N_QUERIES}
        WHERE a.vec_id < {_N_QUERIES}
    ), votes AS (
        SELECT query_id, true_label, cand_label, count(*) AS n_votes
        FROM ranked WHERE rk <= {_TOP_K}
        GROUP BY 1, 2, 3
    )
    SELECT query_id, true_label, cand_label AS pred_label, n_votes FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                   ORDER BY n_votes DESC, cand_label) AS vrk
        FROM votes
    ) WHERE vrk = 1
    """,
)
def knn_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN majority-label: 5 nearest (cosine) among the non-query set,
    majority vote with deterministic tie-break.

    Same round-2 rewrite as sim_topk: the per-pair cosine runs in a
    sequential-order numpy kernel (bit-identical to the HOF fold, so the
    full DuckDB oracle is unchanged); each Arrow batch emits only
    ~|queries| x k ranked candidates, Spark rounds + windows the
    tiny candidate stream and tallies the vote. r1's expression path
    cost 9.3 s at 16x on the irreducible per-pair fold; this kernel
    matches knn_label_blas's two-phase shape while keeping the oracle.
    The local cut uses sim_topk's provably-lossless 1e-6 tie window
    against the global (rounded cosine, id) ranking (round-3 ADVICE
    fix; see sim_topk's docstring for the argument)."""
    e = _clean_embeddings(Tables(spark, sf_dir).embeddings)
    q_rows = _qblock(spark, sf_dir, e, "vec_id", "label", "embedding")
    q_ids = np.array([r.vec_id for r in q_rows], dtype="int64")
    q_labels = np.array([r.label for r in q_rows], dtype="int32")
    # empty query block: no-op kernel, typed empty result (zero-row sweep)
    Q = np.array([r.embedding for r in q_rows], dtype=np.float64) if q_rows else None
    qn = np.sqrt(_seq_sqnorm(Q)) if q_rows else None

    def local_topm(batches):
        if Q is None:
            return
        for pdf in batches:
            if not len(pdf):
                continue
            E = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            ids = pdf["vec_id"].to_numpy()
            labels = pdf["label"].to_numpy()
            norms = np.sqrt(_seq_sqnorm(E))
            cos = _seq_dots(E, Q) / (norms[:, None] * qn[None, :])
            out = {k: [] for k in ("query_id", "true_label", "cand_id", "cand_label", "cos_raw")}
            take = min(_TOP_K, E.shape[0])
            for j, qid in enumerate(q_ids):
                col = cos[:, j]
                kth = col[np.argpartition(-col, take - 1)[:take]].min()
                top = np.flatnonzero(col >= kth - 1e-6)
                out["query_id"].extend([qid] * len(top))
                out["true_label"].extend([q_labels[j]] * len(top))
                out["cand_id"].extend(ids[top])
                out["cand_label"].extend(labels[top])
                out["cos_raw"].extend(col[top])
            yield pd.DataFrame(
                {
                    "query_id": np.array(out["query_id"], dtype="int64"),
                    "true_label": np.array(out["true_label"], dtype="int32"),
                    "cand_id": np.array(out["cand_id"], dtype="int64"),
                    "cand_label": np.array(out["cand_label"], dtype="int32"),
                    "cos_raw": np.array(out["cos_raw"], dtype="float64"),
                }
            )

    cand = (
        e.filter(F.col("vec_id") >= _N_QUERIES)
        .select("vec_id", "label", "embedding")
        .mapInPandas(
            local_topm,
            "query_id long, true_label int, cand_id long, cand_label int, cos_raw double",
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), "cand_id")
    ranked = (
        cand.withColumn("cos", F.round("cos_raw", 6))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _TOP_K)
    )
    votes = ranked.groupBy("query_id", "true_label", "cand_label").agg(
        F.count("*").alias("n_votes")
    )
    w2 = W.partitionBy("query_id").orderBy(F.col("n_votes").desc(), "cand_label")
    return (
        votes.withColumn("vrk", F.row_number().over(w2))
        .filter(F.col("vrk") == 1)
        .select("query_id", "true_label", F.col("cand_label").alias("pred_label"), "n_votes")
    )


_N_TABLES = 16  # L independent hash tables (r9: 8 -> 16; lab-measured
# the L/P/probe surface at 512k — at equal candidate budget more
# tables beat more probes: L16/P12/8-mask 0.85 recall @4.4% vs
# L8/P12/11-probe 0.50 @2.9%)
_LSH_SEED = 42


def _lsh_geometry(n: int) -> int:
    """Planes per table, adapted to the corpus so the expected bucket
    size stays ~128 vectors at ANY scale: P = round(log2(n/128)),
    clamped to [4, 20]. Round-9 lab finding (tools/lsh_probe_lab.py):
    the old FIXED 4-plane geometry left only 16 buckets per table, so
    at 512k vectors a query's candidate set was 41.6% OF THE CORPUS —
    recall@1 0.90, but by near-brute-force scanning. With P adapted
    (P=12 at 512k) buckets hold ~125 vectors and the 8-mask multi-probe
    below restores recall to 0.85 at 4.35% candidates — ~10x less
    re-scoring work, and the per-query candidate budget (L x 8 probes x
    ~128/bucket ≈ 16k) is CONSTANT in n, so total work for the
    all-vectors top-1 contract is O(n), not O(n^2 x 0.42)."""
    import math

    return max(4, min(20, round(math.log2(max(n, 128) / 128))))


_LSH_PROBE_BITS = 3  # masks from the 3 lowest-|projection| planes


@query("ann_lsh", oracle=None)  # bucketing is engine-internal; recall tested
def ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate NN: multi-table random-hyperplane LSH with
    query-directed MULTI-PROBE (Lv et al., VLDB'07, adapted to sign
    LSH), seeded numpy in mapInPandas, Arrow-batched.

    Two membership streams from one plane set: STORED (each vector's
    exact bucket per table, L rows/vector) and PROBE (the exact bucket
    plus the 7 buckets reached by flipping subsets of the 3
    lowest-|projection| bits — a near neighbor that lands one bucket
    over is usually separated by the hyperplane its projection sits
    closest to zero on, so those are the flips that matter). A true
    neighbor is a candidate if any PROBE bucket of the query equals any
    STORED bucket of the neighbor; exact cosine re-scoring runs only on
    candidates. The probe side fans out x8 while the stored side stays
    x1, so the index itself doesn't grow.

    Geometry adapts to the corpus (_lsh_geometry): ~128 vectors per
    bucket at any n, measured at 512k as recall@1 0.85 with 4.35%
    candidates vs the old fixed geometry's 0.90 at 41.6% — the floor
    rises 0.5 -> 0.65 on a 10x cheaper plan (lab:
    tools/lsh_probe_lab.py; floors: _ANN_RECALL_FLOORS)."""
    e = _clean_embeddings(Tables(spark, sf_dir).embeddings)
    n_planes = _lsh_geometry(_valid_count(spark, sf_dir, e))

    def bucketize(probe: bool):
        def gen(batches):
            rng = np.random.RandomState(_LSH_SEED)
            planes = rng.standard_normal((_N_TABLES, n_planes, 64))
            weights = (1 << np.arange(n_planes)).astype(np.int64)
            toffs = np.arange(_N_TABLES, dtype=np.int64) << 32
            for pdf in batches:
                if not len(pdf):
                    continue
                emb = np.stack(pdf["embedding"].to_numpy()).astype(
                    np.float64
                )
                proj = np.einsum("nd,tpd->ntp", emb, planes)
                codes = (proj > 0).astype(np.int64) @ weights  # (b, L)
                if not probe:
                    yield pd.DataFrame(
                        {
                            "vec_id": pdf["vec_id"].to_numpy().repeat(
                                _N_TABLES
                            ),
                            "bucket": (codes + toffs[None, :]).ravel(),
                        }
                    )
                    continue
                o = np.argsort(np.abs(proj), axis=2, kind="stable")[
                    :, :, :_LSH_PROBE_BITS
                ]
                m = np.take(weights, o)  # (b, L, 3) flip masks
                m1, m2, m3 = m[:, :, 0], m[:, :, 1], m[:, :, 2]
                masks = np.stack(
                    [
                        np.zeros_like(m1), m1, m2, m1 ^ m2,
                        m3, m1 ^ m3, m2 ^ m3, m1 ^ m2 ^ m3,
                    ],
                    axis=2,
                )  # (b, L, 8): the multi-probe sequence, exact first
                yield pd.DataFrame(
                    {
                        "vec_id": pdf["vec_id"].to_numpy().repeat(
                            _N_TABLES * 8
                        ),
                        "bucket": (
                            (codes[:, :, None] ^ masks)
                            + toffs[None, :, None]
                        ).ravel(),
                    }
                )

        return gen

    stored = e.mapInPandas(bucketize(False), "vec_id long, bucket long")
    probes = e.mapInPandas(bucketize(True), "vec_id long, bucket long")
    cand = (
        probes.alias("a")
        .join(
            stored.alias("b"),
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") != F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_id"), F.col("b.vec_id").alias("vec_id_b")
        )
        .distinct()
    )
    ev = _with_norm(e)
    a = ev.select("vec_id", "embedding", "norm")
    b = ev.select(
        F.col("vec_id").alias("vec_id_b"),
        F.col("embedding").alias("embedding_b"),
        F.col("norm").alias("norm_b"),
    )
    cos = F.round(
        _dot(F.col("embedding"), F.col("embedding_b")) / (F.col("norm") * F.col("norm_b")),
        6,
    )
    w = W.partitionBy("vec_id").orderBy(F.col("cos").desc(), "vec_id_b")
    return (
        cand.join(a, "vec_id")
        .join(b, "vec_id_b")
        .withColumn("cos", cos)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("vec_id", F.col("vec_id_b").alias("nn_id"), "cos")
    )


_DEDUP_TAU = 0.98
# sign-bucket dims: 6 well-spread components of the 64-dim vector; the
# sign pattern refines the label bucket 64-fold.
_SIGN_DIMS = (1, 11, 21, 31, 41, 51)  # 1-indexed (element_at / DuckDB list)

_SIGN_SQL = " + ".join(
    f"(CASE WHEN v[{d}] >= 0 THEN {1 << j} ELSE 0 END)"
    for j, d in enumerate(_SIGN_DIMS)
)


@query(
    "dedup_embedding",
    oracle=f"""
    WITH e AS MATERIALIZED (
      SELECT vec_id, label, embedding::DOUBLE[] AS v,
             {_SIGN_SQL} AS sbucket
      FROM embeddings
      WHERE embedding IS NOT NULL AND len(embedding) = 64 AND coalesce(list_aggregate(list_transform(embedding, x -> x <> 0), 'bool_or'), false)
    )
    SELECT vec_id FROM e a
    WHERE NOT EXISTS (
        SELECT 1 FROM e b
        WHERE b.label = a.label AND b.sbucket = a.sbucket
          AND b.vec_id < a.vec_id
          AND {_DUCK_COS} >= {_DEDUP_TAU}
    )
    """,
)
def dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dedup: greedy keep-lowest-id — drop any
    vector with cosine >= τ against a lower-id vector in its bucket.

    Bucket = (label, 6-dim sign pattern). The sign bits refine the
    coarse label bucket 64-fold, which is what makes this hold at
    scale: the self-join pair space is quadratic WITHIN a bucket, and
    the label alone stops bounding bucket size as the collection grows
    (measured: 2k vectors = 0.9 s, 32k vectors = >600 s label-only;
    with sign refinement 32k = ~10 s). Near-dup pairs (cos >= 0.98)
    share every sign bit unless a probed component sits near zero —
    the standard LSH recall trade-off, here deterministic and mirrored
    bit-for-bit in the oracle (raw parquet floats compare identically
    in both engines). Anti-join keeps survivors."""
    return _embedding_survivors(spark, sf_dir).select("vec_id")


def _embedding_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dedup_embedding's interior, shared with the linear curation
    recipe (pipeline_curate_embedding): (vec_id, label, sbucket) of
    every vector that survives the greedy within-bucket cosine drop."""
    e = _with_norm(_clean_embeddings(Tables(spark, sf_dir).embeddings))
    sbucket = sum(
        (F.when(F.element_at("embedding", d) >= 0, 1 << j).otherwise(0))
        for j, d in enumerate(_SIGN_DIMS)
    )
    e = e.withColumn("sbucket", sbucket)
    a = e.select("vec_id", "label", "sbucket", "embedding", "norm")
    b = e.select(
        F.col("vec_id").alias("vec_id_b"),
        F.col("label").alias("label_b"),
        F.col("sbucket").alias("sbucket_b"),
        F.col("embedding").alias("embedding_b"),
        F.col("norm").alias("norm_b"),
    )
    cos = F.round(
        _dot(F.col("embedding"), F.col("embedding_b"))
        / (F.col("norm") * F.col("norm_b")),
        6,
    )
    dropped = (
        a.join(
            b,
            (F.col("label") == F.col("label_b"))
            & (F.col("sbucket") == F.col("sbucket_b"))
            & (F.col("vec_id_b") < F.col("vec_id")),
        )
        .filter(cos >= _DEDUP_TAU)
        .select("vec_id")
        .distinct()
    )
    return a.join(dropped, "vec_id", "left_anti").select(
        "vec_id", "label", "sbucket"
    )


def _ivf_geometry(n_vectors: int) -> tuple[int, int]:
    """Coarse-quantizer size as a FUNCTION of the collection (round-6
    verdict item — the fixed 8-of-32 router capped ivf/ivf_pq recall at
    0.58–0.70 at 512k vectors while their exact/PQ stages could do
    0.98): cells ≈ √N rounded to a power of two, clamped to [16, 128]
    (the 4096-row training sample starves Lloyd past ~sample/32 cells),
    nprobe = cells/2.

    Measured at 512k vectors (/tmp/sf256full, this round):
    8/32 → ivf 0.70 / ivf_pq 0.58; 32/64 → 0.89 / 0.66;
    64/128 → 0.98 / 0.74; 128/256 → 1.00 / 0.71 (residual codebooks
    starve). The half-probe fraction is honest about the fixture: the
    synthetic embeddings are near-isotropic, so the router needs a high
    probe fraction to rank the true cell; production corpora with real
    cluster structure run the same geometry at nprobe/cells ≈ 1/8-1/16.
    Cost stays bounded either way: the ADC/exact scan touches
    N·(nprobe/cells) codes per query batch, and candidate generation
    remains an equi-join on cell_id — never n²."""
    import math

    cells = 2 ** int(math.log2(max(16.0, math.sqrt(n_vectors))))
    cells = max(16, min(128, cells))
    return cells, max(8, cells // 2)


@query("ann_ivf", oracle=None)  # quantizer is engine-internal; recall tested
def ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate NN, IVF-style: a coarse quantizer partitions the
    collection into cells; each query probes only its nprobe nearest
    cells and re-scores exactly inside them. The second ANN family
    beside ann_lsh (random hyperplanes): IVF adapts to the data
    distribution where LSH is data-oblivious.

    The codebook is TRAINED: spherical k-means (10 Lloyd iterations,
    cosine assignment, mean + renormalize update) on a deterministic
    sample of the collection — rows ordered by md5(vec_id), capped at
    4096 — run driver-side in numpy. That is the production recipe at
    100 TB too: codebooks train on a bounded sample, never the full
    collection, and a fixed sample order + fixed iteration count makes
    the index bit-reproducible (no pyspark.ml nondeterminism in the
    gate). Everything downstream is the real IVF plan: centroid block
    broadcast in a closure, one mapInPandas assignment pass over the
    collection (numpy argmax), an equi-join on cell_id for candidate
    generation (bounded by cell population, never n²), exact cosine
    re-scoring on candidates only. Cells/nprobe scale with the
    collection via _ivf_geometry (round-6: recall 0.70 → 0.98 at 512k
    vectors)."""
    e = _clean_embeddings(Tables(spark, sf_dir).embeddings)
    n_cells, nprobe = _ivf_geometry(_valid_count(spark, sf_dir, e))
    samp_rows = _codebook_sample(spark, sf_dir, e)
    # empty collection: nothing to train a coarse quantizer on — make
    # both kernels no-ops so the op returns a typed empty frame through
    # its normal plan (round-6 zero-row sweep).
    if samp_rows:
        X = np.array([r.embedding for r in samp_rows], dtype=np.float64)
        Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
        Cn = Xn[:n_cells].copy()  # deterministic seeding from the sample
        for _ in range(10):
            assign_ = np.argmax(Xn @ Cn.T, axis=1)
            for c in range(len(Cn)):
                members = Xn[assign_ == c]
                if len(members):
                    m = members.mean(axis=0)
                    n = np.linalg.norm(m)
                    if n > 0:
                        Cn[c] = m / n
        # tiny-collection boundary (1..n_cells-1 valid vectors): the
        # seeded codebook is only len(samp_rows) rows, so probing more
        # cells than exist would make probe() emit fewer cell columns
        # than vec_id.repeat(nprobe) rows (pandas length mismatch).
        nprobe = min(nprobe, len(Cn))
    else:
        Cn = None

    def assign(batches):
        if Cn is None:
            return
        for pdf in batches:
            E = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            En = E / np.linalg.norm(E, axis=1, keepdims=True)
            sim = En @ Cn.T
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "cell": np.argmax(sim, axis=1).astype("int64"),
                }
            )

    def probe(batches):
        if Cn is None:
            return
        for pdf in batches:
            E = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            En = E / np.linalg.norm(E, axis=1, keepdims=True)
            sim = En @ Cn.T
            cells = np.argsort(-sim, axis=1, kind="stable")[:, :nprobe]
            yield pd.DataFrame(
                {
                    "query_id": pdf["vec_id"].repeat(nprobe).to_numpy(),
                    "cell": cells.reshape(-1).astype("int64"),
                }
            )

    cells = e.select("vec_id", "embedding").mapInPandas(assign, "vec_id long, cell long")
    q = e.filter(F.col("vec_id") < _N_QUERIES)
    probes = q.select("vec_id", "embedding").mapInPandas(
        probe, "query_id long, cell long"
    )
    cand = probes.join(cells, "cell").filter(
        F.col("vec_id") != F.col("query_id")
    ).select("query_id", "vec_id")
    ev = _with_norm(_clean_embeddings(Tables(spark, sf_dir).embeddings))
    qe = ev.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.col("norm").alias("qnorm"),
    )
    ce = ev.select("vec_id", "embedding", "norm")
    cos = F.round(
        _dot(F.col("qv"), F.col("embedding")) / (F.col("qnorm") * F.col("norm")), 6
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), "vec_id")
    return (
        cand.join(F.broadcast(qe), "query_id")
        .join(ce, "vec_id")
        .withColumn("cos", cos)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _TOP_K)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "cos", "rk")
    )


@query(
    "multimodal_cols",
    oracle="""
    SELECT d.doc_id, d.lang, d.n_chars, e.label,
           len(e.embedding) AS dim,
           round(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]), 6)
               AS self_dot
    FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    WHERE embedding IS NOT NULL AND len(embedding) = 64 AND coalesce(list_aggregate(list_transform(embedding, x -> x <> 0), 'bool_or'), false)
    """,
)
def multimodal_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One plan carrying text + vector + scalar columns: documents ⋈
    embeddings on doc_id = vec_id with per-modality derivations.
    Invalid embeddings (NULL/empty/zero-norm) are excluded — see
    _clean_embeddings."""
    t = Tables(spark, sf_dir)
    return (
        t.documents.join(
            _clean_embeddings(t.embeddings), F.col("doc_id") == F.col("vec_id")
        )
        .select(
            "doc_id",
            "lang",
            "n_chars",
            "label",
            F.size("embedding").cast("bigint").alias("dim"),
            F.round(_dot(F.col("embedding"), F.col("embedding")), 6).alias("self_dot"),
        )
    )


@query(
    "multimodal_frames",
    # head byte from the blob's hex (byte semantics; see
    # multimodal_binary — round-6 Unicode sweep)
    oracle="""
    WITH b AS (SELECT doc_id, octet_length(encode(text)) AS byte_len,
                      CAST(('0x' || substr(hex(encode(text)), 1, 2))
                           AS BIGINT) AS head_byte
               FROM documents)
    SELECT doc_id, CAST(i AS BIGINT) AS frame_idx,
           (head_byte + i * 31) % 256 AS frame_feature
    FROM b, LATERAL (SELECT unnest(generate_series(0, byte_len % 7)) AS i)
    """,
)
def multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling modality plumbing: a 1->N row-expanding Arrow
    kernel (mapInPandas), the batch shape of video frame-sample /
    audio chunking. The 'decoder' is a deterministic stub (real codecs
    aren't in this container) but SQL-mirrorable, so the expanding
    wire format itself is oracle-checked; swap the frame loop for a
    real decoder on a cluster with media libs."""
    d = Tables(spark, sf_dir).documents.select(
        "doc_id", F.encode("text", "utf-8").alias("blob")
    )

    def sample_frames(batches):
        for pdf in batches:
            # a missing blob yields no frames (the oracle's
            # generate_series over a NULL bound emits no rows)
            pdf = pdf[pdf["blob"].notna()]
            if not len(pdf):
                continue
            n = pdf["blob"].map(len) % 7 + 1
            doc = pdf["doc_id"].repeat(n.to_numpy())
            idx = np.concatenate([np.arange(k) for k in n]).astype("int64")
            head = pdf["blob"].map(lambda b: b[0]).repeat(n.to_numpy()).to_numpy()
            yield pd.DataFrame(
                {
                    "doc_id": doc.to_numpy(),
                    "frame_idx": idx,
                    "frame_feature": (head + idx * 31) % 256,
                }
            )

    return d.mapInPandas(
        sample_frames, "doc_id long, frame_idx long, frame_feature long"
    )


@query(
    "multimodal_binary",
    # head byte extracted from the UTF-8 BLOB's hex (byte semantics),
    # not ascii(first char) (codepoint semantics) — identical on ASCII,
    # divergent on multibyte text (round-6 Unicode sweep: 模 is
    # codepoint 27169 but first byte 0xE6 = 230).
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS byte_len,
           octet_length(encode(text)) % 7 + 1 AS n_frames,
           CAST(('0x' || substr(hex(encode(text)), 1, 2)) AS BIGINT)
             AS head_byte
    FROM documents
    """,
)
def multimodal_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary modality plumbing: text encoded to a binary column,
    pushed through an Arrow mapInPandas 'decoder'.

    The real decode (image/audio libs) is STUBBED with a deterministic
    fake — byte length, a fake frame count, the lead byte — but the
    Spark-side schema/batching/binary transport is real and the fake is
    SQL-mirrorable, so even the stub is oracle-checked. Swap `fake_decode`
    for a real codec on a cluster with media libs installed.
    """
    d = Tables(spark, sf_dir).documents.select(
        "doc_id", F.encode("text", "utf-8").alias("blob")
    )

    def fake_decode(batches):
        for pdf in batches:
            blobs = pdf["blob"]
            # a missing blob decodes to NULL features, row kept (the
            # oracle's octet_length/ascii of NULL) — nullable Int64 so
            # Arrow ships true nulls
            ln = blobs.map(lambda b: len(b) if b is not None else None).astype(
                "Int64"
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": ln,
                    "n_frames": ln % 7 + 1,
                    "head_byte": blobs.map(
                        lambda b: b[0] if b is not None else None
                    ).astype("Int64"),
                }
            )

    return d.mapInPandas(
        fake_decode, "doc_id long, byte_len long, n_frames long, head_byte long"
    )


@query(
    "multimodal_resize",
    # positional BYTES from the blob's hex (2 hex chars per byte), not
    # per-CHARACTER codepoints — identical on ASCII, divergent on
    # multibyte text (round-6 Unicode sweep); n is octet_length, the
    # kernel's len(blob)
    oracle="""
    WITH h AS (
      SELECT doc_id, hex(encode(text)) AS hx,
             octet_length(encode(text)) AS n
      FROM documents
    ), chars AS (
      SELECT doc_id, n,
             CAST(('0x' || substr(hx, 2 * i - 1, 2)) AS BIGINT) AS b,
             least(3, CAST((4 * (i - 1)) // n AS INTEGER)) AS q
      FROM h, LATERAL (SELECT unnest(generate_series(1, n)) AS i)
    )
    SELECT doc_id, any_value(n) AS n_bytes,
           CAST(sum(b) FILTER (WHERE q = 0) AS DOUBLE)
             / count(*) FILTER (WHERE q = 0) AS t0,
           CAST(sum(b) FILTER (WHERE q = 1) AS DOUBLE)
             / count(*) FILTER (WHERE q = 1) AS t1,
           CAST(sum(b) FILTER (WHERE q = 2) AS DOUBLE)
             / count(*) FILTER (WHERE q = 2) AS t2,
           CAST(sum(b) FILTER (WHERE q = 3) AS DOUBLE)
             / count(*) FILTER (WHERE q = 3) AS t3
    FROM chars GROUP BY doc_id
    """,
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-resize-shaped modality op: the opaque binary column rides
    through an Arrow mapInPandas kernel that downsamples each blob to a
    fixed 4-bucket mean vector — the batch shape, schema, and binary
    transport of a real thumbnail/resize stage. The 'pixel decode' is a
    deterministic stub (no image libs in this container): bytes ARE the
    pixels. Bucket means are exact-integer sums divided in float64, so
    the DuckDB mirror is bit-identical. Map-only: zero shuffle at any
    scale; swap the byte loop for a real codec on a cluster."""
    d = Tables(spark, sf_dir).documents.select(
        "doc_id", F.encode("text", "utf-8").alias("blob")
    )

    def resize(batches):
        for pdf in batches:
            # missing blobs resize to nothing (the oracle's LATERAL
            # over a NULL length emits no rows for the doc)
            pdf = pdf[pdf["blob"].notna()]
            if not len(pdf):
                continue
            out = {"doc_id": pdf["doc_id"], "n_bytes": [], "t0": [], "t1": [], "t2": [], "t3": []}
            for blob in pdf["blob"]:
                a = np.frombuffer(blob, dtype=np.uint8).astype(np.int64)
                n = len(a)
                q = np.minimum(3, (4 * np.arange(n)) // n)
                out["n_bytes"].append(n)
                for j in range(4):
                    seg = a[q == j]
                    out[f"t{j}"].append(float(seg.sum()) / len(seg))
            yield pd.DataFrame(out)

    return d.mapInPandas(
        resize, "doc_id long, n_bytes long, t0 double, t1 double, t2 double, t3 double"
    )


@query("dedup_embedding_blas", oracle=None)  # BLAS fold order: rows-only
def dedup_embedding_blas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dedup_embedding's high-throughput twin: the same
    (label, 6-bit sign pattern) bucketing, but each bucket's pairwise
    cosine block is ONE numpy matmul inside a per-bucket Arrow kernel
    instead of |pairs| interpreted aggregate-lambda folds — measured
    12.6 s -> ~1 s on the 16x-scaled embeddings. Survivor semantics are
    identical (greedy keep-lowest-id at cos >= τ, asserted equal to the
    oracled dedup_embedding in tests): within a bucket, a vector
    survives iff no lower-id vector in the SAME bucket matches it at
    >= τ — computed per bucket via an O(n²) triangular check on the
    (sorted-by-id) similarity matrix, which at scale is bounded by the
    bucket refinement exactly like the SQL twin. One exchange
    (repartition by bucket)."""
    e = _with_norm(_clean_embeddings(Tables(spark, sf_dir).embeddings))
    sbucket = sum(
        (F.when(F.element_at("embedding", d) >= 0, 1 << j).otherwise(0))
        for j, d in enumerate(_SIGN_DIMS)
    )
    tau = _DEDUP_TAU
    b = e.select(
        "vec_id",
        "embedding",
        F.concat_ws("_", F.col("label"), sbucket).alias("bkt"),
    )

    def survivors(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        E = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        En = E / np.linalg.norm(E, axis=1, keepdims=True)
        sim = En @ En.T
        # SQL-twin semantics: drop a vector iff ANY lower-id vector in
        # the bucket (survivor or not) matches it at >= tau.
        drop = (np.triu(sim >= tau, k=1)).any(axis=0)
        return pdf.loc[~drop, ["vec_id"]]

    return (
        b.repartition("bkt")
        .groupBy("bkt")
        .applyInPandas(survivors, "vec_id long")
    )


@query("knn_label_blas", oracle=None)  # BLAS fold order: rows-only
def knn_label_blas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """knn_label's high-throughput twin (same two-phase shape as
    sim_topk_blas): candidates stream through a per-batch matmul that
    emits each batch's local top-k per query WITH the candidate label,
    then a tiny global merge window re-ranks |queries| x k x n_batches
    rows and the majority vote runs on the exact top-k. Predictions are
    asserted equal to the oracled knn_label in tests (cos rounded at 6
    on both paths; vec_id tie-breaks make rank and vote deterministic).
    Measured 6.2 s -> 1.5 s on the 16x-scaled embeddings."""
    e = _clean_embeddings(Tables(spark, sf_dir).embeddings)
    q_rows = _qblock(spark, sf_dir, e, "vec_id", "label", "embedding")
    q_ids = np.array([r.vec_id for r in q_rows], dtype="int64")
    q_labels = {int(r.vec_id): int(r.label) for r in q_rows}
    # empty query block: no-op kernel, typed empty result (zero-row sweep)
    Q = np.array([r.embedding for r in q_rows], dtype=np.float64) if q_rows else None
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True) if q_rows else None
    k = _TOP_K

    def local_topk(batches):
        if Qn is None:
            return
        for pdf in batches:
            pdf = pdf[pdf["vec_id"] >= _N_QUERIES]
            if not len(pdf):
                continue
            E = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            En = E / np.linalg.norm(E, axis=1, keepdims=True)
            sim = np.round(En @ Qn.T, 6)  # (batch, n_queries)
            ids = pdf["vec_id"].to_numpy()
            labels = pdf["label"].to_numpy()
            out = {"query_id": [], "neighbor_id": [], "cand_label": [], "cos": []}
            for j, qid in enumerate(q_ids):
                col = sim[:, j]
                take = min(k, len(col))
                top = np.argpartition(-col, take - 1)[:take]
                out["query_id"].extend([qid] * take)
                out["neighbor_id"].extend(ids[top])
                out["cand_label"].extend(labels[top])
                out["cos"].extend(col[top])
            yield pd.DataFrame(
                {
                    "query_id": np.array(out["query_id"], dtype="int64"),
                    "neighbor_id": np.array(out["neighbor_id"], dtype="int64"),
                    "cand_label": np.array(out["cand_label"], dtype="int32"),
                    "cos": np.array(out["cos"], dtype="float64"),
                }
            )

    cand = e.select("vec_id", "label", "embedding").mapInPandas(
        local_topk, "query_id long, neighbor_id long, cand_label int, cos double"
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), "neighbor_id")
    topk = cand.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)
    votes = topk.groupBy("query_id", "cand_label").agg(
        F.count("*").alias("n_votes")
    )
    w2 = W.partitionBy("query_id").orderBy(F.col("n_votes").desc(), "cand_label")
    # query_id -> true_label as a map LITERAL (bounded by the query
    # block): stays in codegen, no Python round trip per row. Empty
    # query block: create_map() infers map<void,void> and map[bigint]
    # fails analysis (zero-row sweep) — the zero-entry lookup is just
    # NULL, typed directly.
    tl = (
        F.create_map(
            *[F.lit(v) for qid in sorted(q_labels) for v in (qid, q_labels[qid])]
        )[F.col("query_id")].cast("int")
        if q_labels
        else F.lit(None).cast("int")
    )
    return (
        votes.withColumn("vrk", F.row_number().over(w2))
        .filter(F.col("vrk") == 1)
        .select(
            "query_id",
            tl.alias("true_label"),
            F.col("cand_label").alias("pred_label"),
            "n_votes",
        )
    )


_QUANTIZE_ORACLE = """
    WITH s AS (
      SELECT vec_id, label, embedding,
             CASE WHEN list_max(list_transform(embedding, x -> abs(x))) > 0
                  THEN CAST(list_max(list_transform(embedding, x -> abs(x)))
                            AS DOUBLE) / 127.0
                  ELSE 1.0 END AS scale
      FROM embeddings
      WHERE embedding IS NOT NULL AND len(embedding) = 64 AND coalesce(list_aggregate(list_transform(embedding, x -> x <> 0), 'bool_or'), false)
    ),
    q AS (
      SELECT vec_id, label, scale,
             list_transform(embedding, x ->
               CAST(floor(CAST(x AS DOUBLE) / scale + 0.5) AS BIGINT)) AS qv
      FROM s
    )
    SELECT vec_id, label, scale,
           len(qv) AS dim,
           CAST(list_aggregate(qv, 'sum') AS BIGINT) AS sum_q,
           CAST(list_aggregate(list_transform(qv, v -> v * v), 'sum')
                AS BIGINT) AS sum_q2,
           CAST(list_aggregate(list_transform(qv, v ->
             CASE WHEN abs(v) > 127 THEN 1 ELSE 0 END), 'sum')
                AS BIGINT) AS n_clipped
    FROM q
    """


@query("vec_quantize_int8", oracle=_QUANTIZE_ORACLE, tags=("vectors", "llm"))
def vec_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of the embedding column — the
    compression step a 100 TB vector pipeline runs before ANN indexing
    (4x smaller, SIMD-friendly int dot products). Per vector:
    scale = max|x|/127, q_i = floor(x_i/scale + 0.5).

    Round 2: the numpy-kernel formulation (r1's `vec_quantize_blas`) is
    now THE builder — Spark's array higher-order functions are
    interpreted per element (no codegen inside the lambda), measured 3x
    slower at 128k x 64 (2.3 s vs 0.8 s). The float64 division / floor
    / row-wise integer sums here are single-assignment IEEE ops in the
    same order as the HOF spec, so every output is bit-identical and
    the full oracle carries over; `vec_quantize_hof` below keeps the
    codegen-spec formulation as an unregistered test differential
    (bit-equality asserted in tests/test_llm.py). Map-only — batches
    stream through executors, nothing shuffles at any scale. n_clipped
    asserts the scale choice makes clipping impossible (always 0 — the
    self-check a real pipeline would log)."""
    emb = _clean_embeddings(Tables(spark, sf_dir).embeddings)

    def kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            absmax = np.abs(mat).max(axis=1)
            scale = np.where(absmax > 0, absmax / 127.0, 1.0)
            q = np.floor(mat / scale[:, None] + 0.5).astype(np.int64)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "label": pdf["label"],
                    "scale": scale,
                    "dim": mat.shape[1],
                    "sum_q": q.sum(axis=1),
                    "sum_q2": (q * q).sum(axis=1),
                    "n_clipped": (np.abs(q) > 127).sum(axis=1),
                }
            )

    return emb.mapInPandas(
        kernel,
        "vec_id long, label int, scale double, dim int, "
        "sum_q long, sum_q2 long, n_clipped long",
    )


def vec_quantize_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The JVM higher-order-function formulation of vec_quantize_int8 —
    UNREGISTERED since round 2 (it is the same op as the primary kernel
    builder, bit for bit, just ~3x slower because transform/aggregate
    lambdas are interpreted per element). Kept as the codegen-side spec
    the tests differentially assert the kernel against.

    Determinism notes (why the two formulations are bit-identical):
    floor(x+0.5) instead of round() because Spark rounds half-up and
    DuckDB half-even — floor is tie-free on both; the float->double
    casts and sequential left-to-right fold order match numpy's
    single-assignment ops, so every output column is exact."""
    emb = _clean_embeddings(Tables(spark, sf_dir).embeddings)
    absmax = F.array_max(F.transform("embedding", lambda x: F.abs(x)))
    # total function: zero vectors quantize with scale 1 (all-zero codes)
    # instead of filtering, keeping the plan a pure Project with no
    # higher-order expression inside a Filter node.
    scale = F.when(absmax > 0, absmax.cast("double") / F.lit(127.0)).otherwise(
        F.lit(1.0)
    )
    zero = F.lit(0).cast("long")
    # scale materializes in its OWN projection: a transform() lambda
    # that captured the absmax expression would re-evaluate it per
    # element — the O(d^2) capture trap (NOTES round 1).
    staged = emb.select("vec_id", "label", "embedding", scale.alias("scale"))
    qv = F.transform(
        "embedding",
        lambda x: F.floor(x.cast("double") / F.col("scale") + F.lit(0.5)).cast(
            "long"
        ),
    )
    return (
        staged.select("vec_id", "label", "scale", qv.alias("qv"))
        .select(
            "vec_id",
            "label",
            "scale",
            F.size("qv").alias("dim"),
            F.aggregate("qv", zero, lambda s, v: s + v).alias("sum_q"),
            F.aggregate("qv", zero, lambda s, v: s + v * v).alias("sum_q2"),
            F.aggregate(
                "qv",
                zero,
                lambda s, v: s + F.when(F.abs(v) > 127, 1).otherwise(0),
            ).alias("n_clipped"),
        )
    )


_PQ_M = 8          # subspaces
_PQ_K = 256        # centroids per subspace (8-bit codes, FAISS default)
# Round-5 scale finding (caught IN-BAND by ann_recall's raise_error at
# 512k vectors): 4-bit codebooks (K=16) + a FIXED 64-candidate ADC cut
# collapse recall@5 from 0.85 at 2k vectors to 0.07 at 512k — the
# quantized distances can't separate the true neighbor from half a
# million near-isotropic competitors inside a fixed-size shortlist.
# Measured at 512k: K=16/CAND=1024 → 0.39, K=256/CAND=64 → 0.51,
# K=256/CAND=scaled → 0.91. Both knobs matter: 8-bit codes shrink the
# quantization error, and the candidate budget must grow ~linearly
# with the collection (a constant FRACTION re-ranked, the standard PQ
# operating point) rather than staying constant.


def _pq_cand(n_vectors: int) -> int:
    """ADC shortlist size: re-rank ~0.2% of the collection, floor 64.
    Keeps the exact re-rank linear in N with a tiny constant while the
    shortlist stays large enough that quantization noise cannot push
    the true neighbors out (0.91 recall@5 at 512k vectors)."""
    return max(64, n_vectors // 500)


def _train_pq_books(
    R: "np.ndarray", sub: int, iters: int = 10, kmpp: bool = False
) -> "np.ndarray":
    """Per-subspace PQ codebooks. ``kmpp=True`` (the round-8 RESIDUAL
    refinement, verdict #5) seeds Lloyd with DETERMINISTIC k-means++
    (fixed RandomState per subspace) and runs 16 iterations; the
    default keeps the original first-K seeding at 10 iterations.

    Why the split (all engine-measured at 512k vectors on driver-shape
    infra): residual books are the ivf_pq bottleneck — kmpp+16 lifted
    ivf_pq recall@5 0.74 -> 0.85 (lab replica: 0.82 -> 0.87 at equal
    shortlist) — but the SAME refinement dropped plain pq 0.91 -> 0.85:
    raw normalized vectors sit near-uniformly on the sphere, where
    first-K-of-sample seeds already cover the density and kmpp's
    outlier-chasing spread wastes centroids; residuals are zero-
    centered and anisotropic per cell, where the spread wins. An
    OPQ-style learned rotation measured +0.00 on these near-isotropic
    embeddings (variance already balanced across subspaces — nothing
    to equalize; tools/ann_recall_lab.py records both numbers).
    Training stays driver-side on the bounded 4096-row sample."""
    books = []
    for m in range(_PQ_M):
        S = R[:, m * sub : (m + 1) * sub]
        k_eff = min(_PQ_K, len(S))
        if kmpp:
            rng = np.random.RandomState(7 + m)
            idx = [int(rng.randint(len(S)))]
            d2min = ((S - S[idx[0]]) ** 2).sum(axis=1)
            while len(idx) < k_eff:
                tot = d2min.sum()
                if tot <= 0:  # degenerate sample (all points identical)
                    idx.append(idx[-1])
                    continue
                idx.append(int(rng.choice(len(S), p=d2min / tot)))
                d2min = np.minimum(
                    d2min, ((S - S[idx[-1]]) ** 2).sum(axis=1)
                )
            C = S[idx].copy()
            n_iters = 16
        else:
            C = S[:k_eff].copy()
            n_iters = iters
        for _ in range(n_iters):
            d2 = ((S[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            a = np.argmin(d2, axis=1)
            for c in range(len(C)):
                members = S[a == c]
                if len(members):
                    C[c] = members.mean(axis=0)
        books.append(C)
    return np.stack(books)


@query("ann_pq", oracle=None)  # codebook engine-internal; recall tested
def ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate NN, product-quantization style — the third ANN
    family beside ann_lsh (data-oblivious) and ann_ivf (coarse cells):
    each vector compresses to M=8 sub-codes (one byte-ish each), and
    queries scan the CODES, not the vectors, via asymmetric distance
    computation (per-subspace lookup tables), then re-rank the short
    candidate list exactly.

    The 100 TB rationale: the encoded table is dims/M * 4x smaller
    than the raw embeddings (here 64 floats -> 8 codes), so the
    candidate scan is memory-bandwidth-cheap and the raw vectors are
    touched only for ~CAND rows per query. Codebooks train per
    subspace (Lloyd, fixed 10 iterations, L2) on the same bounded
    md5-ordered sample as ann_ivf — bit-reproducible, driver-side,
    closure-broadcast. Three passes, all Arrow kernels or joins:
    encode (map-only over the collection), ADC scan (map-only over
    codes, local top-C per batch, tiny global merge), exact re-score
    (broadcast queries ⋈ candidate rows only). Recall vs brute-force
    sim_topk is asserted in tests, not assumed."""
    e = _clean_embeddings(Tables(spark, sf_dir).embeddings)
    samp_rows = _codebook_sample(spark, sf_dir, e)
    # empty collection: no sample to train codebooks on — every kernel
    # below no-ops and the op returns a typed empty frame through its
    # normal plan (round-6 zero-row sweep).
    if samp_rows:
        X = np.array([r.embedding for r in samp_rows], dtype=np.float64)
        Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
        dim = Xn.shape[1]
        sub = dim // _PQ_M
        # (M, K, sub) — first-K seeding (raw spherical vectors: the
        # kmpp refinement HURTS here, 0.91 -> 0.85; see _train_pq_books)
        B = _train_pq_books(Xn, sub)
    else:
        sub, B = 0, None

    def encode(batches):
        if B is None:
            return
        for pdf in batches:
            E = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            En = E / np.linalg.norm(E, axis=1, keepdims=True)
            codes = np.empty((len(En), _PQ_M), dtype=np.int32)
            for m in range(_PQ_M):
                S = En[:, m * sub : (m + 1) * sub]
                d2 = ((S[:, None, :] - B[m][None, :, :]) ** 2).sum(axis=2)
                codes[:, m] = np.argmin(d2, axis=1)
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "codes": list(codes)}
            )

    codes = e.select("vec_id", "embedding").mapInPandas(
        encode, "vec_id long, codes array<int>"
    )

    q_rows = _qblock(spark, sf_dir, e, "vec_id", "embedding")
    q_ids = np.array([r.vec_id for r in q_rows], dtype="int64")
    if q_rows:
        Q = np.array([r.embedding for r in q_rows], dtype=np.float64)
        Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
        # per-query ADC tables: T[q, m, k] = ||q_sub - centroid||^2
        # (sized by the REAL codebook, which is shorter than _PQ_K on
        # tiny collections — the Lloyd seed is capped by sample size)
        T = np.empty((len(Qn), _PQ_M, B.shape[1]))
        for m in range(_PQ_M):
            Sq = Qn[:, m * sub : (m + 1) * sub]
            T[:, m, :] = ((Sq[:, None, :] - B[m][None, :, :]) ** 2).sum(axis=2)
    else:
        T = None  # empty query block: ADC kernel no-ops (zero-row sweep)

    # shortlist ∝ collection (round-5 fix)
    cand_k = _pq_cand(_valid_count(spark, sf_dir, e))

    def adc(batches):
        if T is None:
            return
        for pdf in batches:
            C = np.stack(pdf["codes"].to_numpy())  # (batch, M)
            ids = pdf["vec_id"].to_numpy()
            # approx distance: sum of table lookups per subspace
            out_q, out_n, out_d = [], [], []
            for j, qid in enumerate(q_ids):
                d = T[j][np.arange(_PQ_M)[None, :], C].sum(axis=1)
                d[ids == qid] = np.inf
                take = min(cand_k, len(d))
                top = np.argpartition(d, take - 1)[:take]
                out_q.extend([qid] * take)
                out_n.extend(ids[top])
                out_d.extend(d[top])
            yield pd.DataFrame(
                {
                    "query_id": np.array(out_q, dtype="int64"),
                    "vec_id": np.array(out_n, dtype="int64"),
                    "approx_d": np.array(out_d),
                }
            )

    wmerge = W.partitionBy("query_id").orderBy("approx_d", "vec_id")
    cand = (
        codes.mapInPandas(adc, "query_id long, vec_id long, approx_d double")
        .filter(F.col("approx_d") < float("inf"))
        .withColumn("crk", F.row_number().over(wmerge))
        .filter(F.col("crk") <= cand_k)
        .select("query_id", "vec_id")
    )
    ev = _with_norm(_clean_embeddings(Tables(spark, sf_dir).embeddings))
    qe = ev.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.col("norm").alias("qnorm"),
    )
    ce = ev.select("vec_id", "embedding", "norm")
    cos = F.round(
        _dot(F.col("qv"), F.col("embedding")) / (F.col("qnorm") * F.col("norm")), 6
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), "vec_id")
    return (
        cand.join(F.broadcast(qe), "query_id")
        .join(ce, "vec_id")
        .withColumn("cos", cos)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _TOP_K)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "cos", "rk")
    )


@query("vec_pca", oracle=None)  # eigendecomposition: no SQL twin
def vec_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed PCA over the embedding column — 2-component
    projection for visualization/whitening in a curation pipeline.

    The classic two-phase distributed linear algebra recipe (the same
    shape MLlib's RowMatrix.computePrincipalComponents uses):

      phase 1 — one Arrow-batched pass emits per-batch PARTIALS
        (count, column sum, X'X Gram), each a fixed 1 + d + d^2
        doubles regardless of batch rows: the driver receives
        O(partitions) rows, never the data. Partials fold in a
        canonical order (sorted by each batch's min vec_id) so the
        accumulated moments — and therefore the eigenbasis — are
        bit-reproducible run to run.
      phase 2 — the d x d covariance eigensolve happens driver-side
        (d = 64: microseconds — NEVER distribute a d x d solve), the
        top-2 eigenvectors broadcast back in the kernel closure, and a
        second map-only pass projects every row. No shuffle anywhere;
        both passes are scan-bounded.

    Sign convention (eigenvectors are sign-ambiguous): each component
    is flipped so its largest-|loading| coordinate is positive.
    Rows-only for the driver; tests/test_llm.py asserts the projection
    against an exact numpy PCA of the same data."""
    e = _clean_embeddings(Tables(spark, sf_dir).embeddings)
    d = 64

    def partials(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            yield pd.DataFrame(
                {
                    "first_id": [int(pdf["vec_id"].min())],
                    "n": [len(X)],
                    "colsum": [X.sum(axis=0).tolist()],
                    "gram": [(X.T @ X).ravel().tolist()],
                }
            )

    parts = (
        e.select("vec_id", "embedding")
        .mapInPandas(
            partials,
            "first_id long, n long, colsum array<double>, gram array<double>",
        )
        .collect()
    )  # bounded: one fixed-width row per input partition
    parts.sort(key=lambda r: r.first_id)
    n = sum(r.n for r in parts)
    colsum = np.zeros(d)
    gram = np.zeros((d, d))
    for r in parts:
        colsum += np.array(r.colsum)
        gram += np.array(r.gram).reshape(d, d)
    # n < 2: no covariance to decompose (empty collection is a normal
    # input per the zero-row sweep) — project no-ops, typed empty result.
    if n >= 2:
        mean = colsum / n
        cov = (gram - n * np.outer(mean, mean)) / (n - 1)
        evals, evecs = np.linalg.eigh(cov)
        comps = evecs[:, ::-1][:, :2].T.copy()  # (2, d), top first
        for i in range(2):
            j = int(np.abs(comps[i]).argmax())
            if comps[i, j] < 0:
                comps[i] = -comps[i]
    else:
        mean = comps = None

    def project(batches):
        if comps is None:
            return
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            P = (X - mean) @ comps.T
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "pc1": np.round(P[:, 0], 6),
                    "pc2": np.round(P[:, 1], 6),
                }
            )

    return e.select("vec_id", "embedding").mapInPandas(
        project, "vec_id long, pc1 double, pc2 double"
    )


@query(
    "multimodal_phash_dedup",
    # positional BYTES via hex, byte-true like multimodal_resize
    # (round-6 Unicode sweep)
    oracle="""
    WITH h AS (
      SELECT doc_id, hex(encode(text)) AS hx,
             octet_length(encode(text)) AS n
      FROM documents
    ), chars AS (
      SELECT doc_id, n,
             CAST(('0x' || substr(hx, 2 * i - 1, 2)) AS BIGINT) AS b,
             least(15, CAST((16 * (i - 1)) // n AS INTEGER)) AS q
      FROM h, LATERAL (SELECT unnest(generate_series(1, n)) AS i)
    ), agg AS (
      SELECT doc_id, any_value(n) AS n, q, sum(b) AS sj, count(*) AS cj
      FROM chars GROUP BY doc_id, q
    ), tot AS (
      SELECT doc_id, sum(sj) AS st FROM agg GROUP BY doc_id
    ), hashed AS (
      SELECT a.doc_id,
             CAST(sum(CASE WHEN a.sj * a.n >= t.st * a.cj
                           THEN 1 << a.q ELSE 0 END) AS BIGINT) AS phash
      FROM agg a JOIN tot t ON a.doc_id = t.doc_id
      GROUP BY a.doc_id
    )
    SELECT phash, count(*) AS n_docs, min(doc_id) AS keeper_doc_id
    FROM hashed GROUP BY phash HAVING count(*) >= 2
    """,
    tags=("llm", "multimodal", "dedup"),
)
def multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-duplicate detection for the binary/image
    modality: aHash-style 16-bit fingerprint (bucket mean >= global
    mean per 16 positional buckets) over the opaque blob, then
    dedup classes = docs sharing a fingerprint (keeper = lowest id).
    The 'pixel decode' is the same deterministic stub as
    multimodal_resize (bytes ARE pixels; swap in a real codec + DCT
    for production pHash — the Spark plumbing is what's real here).

    Exactness: every bucket decision is the cross-multiplied integer
    comparison sj*n >= st*cj — no division, no float — so the Arrow
    kernel and the DuckDB positional-SQL mirror agree bit for bit and
    the op carries a FULL oracle (rare for a multimodal op). One
    mirror precondition remains (a verified fixture property, shared
    with multimodal_resize): blobs >= 16 bytes so all 16 buckets are
    populated (min fixture length 44). The old ASCII-only precondition
    is GONE (round-6 Unicode sweep): the SQL mirror now walks the
    blob's hex two chars at a time — true BYTE semantics, byte-equal
    to the kernel's np.frombuffer on any text.

    Scale: map-only hashing (zero shuffle) + one groupBy on the
    16-bit hash — constant-width shuffle rows, collision classes
    bounded by the hash space. Hamming-distance <= r matching extends
    this with multi-probe (explode each hash into its r-bit-flip
    neighborhood, 17 rows/doc at r=1) — same join shape, documented
    extension rather than default because exact-class grouping is the
    oracle-checkable core."""
    d = Tables(spark, sf_dir).documents.select(
        "doc_id", F.encode("text", "utf-8").alias("blob")
    )

    def kern(batches):
        # Fully vectorized across the batch: one concatenated byte
        # array + np.add.reduceat over per-doc bucket boundaries
        # (bucket j of an n-byte doc covers positions
        # [ceil(j*n/16), ceil((j+1)*n/16)) — the closed form of
        # 16*i//n == j). A per-blob Python loop measured 5.4 s at 320k
        # docs; reduceat does the same exact integer sums in C. Blobs
        # under 16 bytes would create empty reduceat segments; the
        # fixtures guarantee >= 16 (asserted) and shorter blobs belong
        # to the documented SQL-mirror precondition anyway.
        for pdf in batches:
            # missing blobs hash to nothing (oracle: LATERAL over NULL)
            pdf = pdf[pdf["blob"].notna()]
            if not len(pdf):
                continue
            blobs = pdf["blob"].tolist()
            lens = np.fromiter((len(b) for b in blobs), dtype=np.int64)
            assert (lens >= 16).all(), "phash requires blobs >= 16 bytes"
            cat = np.frombuffer(b"".join(blobs), dtype=np.uint8)
            offs = np.concatenate(([0], np.cumsum(lens)[:-1]))
            j = np.arange(16, dtype=np.int64)
            # (docs, 16) start positions, flattened for one reduceat
            starts = offs[:, None] + (j[None, :] * lens[:, None] + 15) // 16
            sj = np.add.reduceat(cat.astype(np.int64), starts.ravel()).reshape(
                -1, 16
            )
            ends = np.concatenate(
                (starts[:, 1:], (offs + lens)[:, None]), axis=1
            )
            cj = ends - starts
            st = sj.sum(axis=1, keepdims=True)
            bits = (sj * lens[:, None] >= st * cj).astype(np.int64)
            hashes = (bits << j[None, :]).sum(axis=1)
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "phash": hashes.astype("int64")}
            )

    h = d.mapInPandas(kern, "doc_id long, phash long")
    return (
        h.groupBy("phash")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("keeper_doc_id"))
        .filter(F.col("n_docs") >= 2)
    )


@query("ann_ivf_pq", oracle=None)  # composite index engine-internal; recall tested
def ann_ivf_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate NN, IVF-PQ — the composite billion-scale recipe
    (FAISS IVFADC shape) combining the two existing families: a coarse
    spherical-k-means quantizer routes each vector to a cell (ann_ivf's
    index), and the RESIDUAL x − centroid(cell) compresses to M=8
    sub-codes (ann_pq's encoding, but trained on residuals — residuals
    are smaller and better centered than raw vectors, so the same
    codebook budget quantizes finer). Queries probe nprobe cells and
    scan only those cells' CODES via per-(query, cell) ADC tables, then
    re-rank the short candidate list exactly.

    100 TB anatomy: train on the bounded md5-ordered sample
    (driver-side numpy, bit-reproducible); ONE map-only encode pass
    stores (cell, codes) — dims/M*4x smaller than raw; the query scan
    is map-only over codes with closure-broadcast tables (each batch
    touches only rows whose cell is probed — no join, no shuffle);
    a tiny global merge window picks CAND per query; exact re-scoring
    touches ~CAND raw rows per query. Recall vs brute-force sim_topk
    asserted in tests like the other ANN families."""
    e = _clean_embeddings(Tables(spark, sf_dir).embeddings)
    n_vec = _valid_count(spark, sf_dir, e)
    # shortlist ∝ collection (round-5 fix), DOUBLED for the residual
    # family (round-8): quantizing residuals adds the coarse-assignment
    # error on top of PQ noise, so ivf_pq needs a wider exact re-rank
    # than plain pq to hold the same recall — measured at 512k: 0.2%
    # shortlist 0.87, 0.4% 0.90+ (with the refined books). Still a
    # constant fraction: the exact re-rank touches 0.4% of N rows.
    cand_k = 2 * _pq_cand(n_vec)
    n_cells, nprobe = _ivf_geometry(n_vec)  # router ∝ collection (round-6)
    samp_rows = _codebook_sample(spark, sf_dir, e)
    # empty collection: no sample to train on — all kernels below
    # no-op and the op returns a typed empty frame (zero-row sweep).
    if samp_rows:
        X = np.array([r.embedding for r in samp_rows], dtype=np.float64)
        Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
        dim = Xn.shape[1]
        sub = dim // _PQ_M
        # coarse quantizer: same spherical k-means recipe as ann_ivf
        Cn = Xn[:n_cells].copy()
        for _ in range(10):
            assign_ = np.argmax(Xn @ Cn.T, axis=1)
            for c in range(len(Cn)):
                members = Xn[assign_ == c]
                if len(members):
                    m = members.mean(axis=0)
                    nrm = np.linalg.norm(m)
                    if nrm > 0:
                        Cn[c] = m / nrm
        # residual PQ codebooks — k-means++-seeded refined Lloyd
        # (round-8 verdict #5: ivf_pq 0.74 -> 0.85 recall@5 at 512k;
        # see _train_pq_books for the split vs plain pq)
        a0 = np.argmax(Xn @ Cn.T, axis=1)
        R = Xn - Cn[a0]
        B = _train_pq_books(R, sub, kmpp=True)  # (M, k_eff, sub)
        # tiny-collection boundary: with fewer valid vectors than
        # n_cells (or _PQ_K) the seeded codebooks are short — the ADC
        # table and the probe fan-out must be sized by the REAL
        # codebook shapes, not the requested geometry.
        n_cells = len(Cn)
        nprobe = min(nprobe, n_cells)
    else:
        sub, Cn, B = 0, None, None

    def encode(batches):
        if B is None:
            return
        for pdf in batches:
            E = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            En = E / np.linalg.norm(E, axis=1, keepdims=True)
            cells = np.argmax(En @ Cn.T, axis=1)
            res = En - Cn[cells]
            codes = np.empty((len(En), _PQ_M), dtype=np.int32)
            for m in range(_PQ_M):
                S = res[:, m * sub : (m + 1) * sub]
                d2 = ((S[:, None, :] - B[m][None, :, :]) ** 2).sum(axis=2)
                codes[:, m] = np.argmin(d2, axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "cell": cells.astype("int64"),
                    "codes": list(codes),
                }
            )

    codes = e.select("vec_id", "embedding").mapInPandas(
        encode, "vec_id long, cell long, codes array<int>"
    )

    q_rows = _qblock(spark, sf_dir, e, "vec_id", "embedding")
    q_ids = np.array([r.vec_id for r in q_rows], dtype="int64")
    if q_rows:
        Q = np.array([r.embedding for r in q_rows], dtype=np.float64)
        Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
        qcells = np.argsort(-(Qn @ Cn.T), axis=1, kind="stable")[:, :nprobe]
        # ADC tables for EVERY (query, cell): residual of q w.r.t. the cell
        # centroid per subspace vs that subspace's codebook — 20x32x8x16
        # doubles, trivially closure-broadcastable; only probed cells read.
        Rq = Qn[:, None, :] - Cn[None, :, :]  # (nq, cells, dim)
        T = np.empty((len(Qn), n_cells, _PQ_M, B.shape[1]))
        for m in range(_PQ_M):
            Sq = Rq[:, :, m * sub : (m + 1) * sub]
            T[:, :, m, :] = (
                (Sq[:, :, None, :] - B[m][None, None, :, :]) ** 2
            ).sum(axis=3)
        probe_mask = np.zeros((len(Qn), n_cells), dtype=bool)
        for j in range(len(Qn)):
            probe_mask[j, qcells[j]] = True
    else:
        T, probe_mask = None, None  # empty query block (zero-row sweep)
    marange = np.arange(_PQ_M)

    def adc(batches):
        if T is None:
            return
        for pdf in batches:
            C = np.stack(pdf["codes"].to_numpy())  # (batch, M)
            cells = pdf["cell"].to_numpy()
            ids = pdf["vec_id"].to_numpy()
            out_q, out_n, out_d = [], [], []
            for j, qid in enumerate(q_ids):
                sel = np.flatnonzero(probe_mask[j, cells] & (ids != qid))
                if not len(sel):
                    continue
                d = T[j, cells[sel][:, None], marange[None, :], C[sel]].sum(
                    axis=1
                )
                take = min(cand_k, len(d))
                top = np.argpartition(d, take - 1)[:take]
                out_q.extend([qid] * take)
                out_n.extend(ids[sel][top])
                out_d.extend(d[top])
            yield pd.DataFrame(
                {
                    "query_id": np.array(out_q, dtype="int64"),
                    "vec_id": np.array(out_n, dtype="int64"),
                    "approx_d": np.array(out_d, dtype="float64"),
                }
            )

    wmerge = W.partitionBy("query_id").orderBy("approx_d", "vec_id")
    cand = (
        codes.mapInPandas(adc, "query_id long, vec_id long, approx_d double")
        .withColumn("crk", F.row_number().over(wmerge))
        .filter(F.col("crk") <= cand_k)
        .select("query_id", "vec_id")
    )
    ev = _with_norm(_clean_embeddings(Tables(spark, sf_dir).embeddings))
    qe = ev.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.col("norm").alias("qnorm"),
    )
    ce = ev.select("vec_id", "embedding", "norm")
    cos = F.round(
        _dot(F.col("qv"), F.col("embedding")) / (F.col("qnorm") * F.col("norm")), 6
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), "vec_id")
    return (
        cand.join(F.broadcast(qe), "query_id")
        .join(ce, "vec_id")
        .withColumn("cos", cos)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _TOP_K)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "cos", "rk")
    )


# Per-family recall floors, shared with tests/test_llm.py's laws. Round 6
# raised ivf/pq/ivf_pq from the shared 0.5 after the router fix
# (_ivf_geometry): measured 0.98/0.91/0.74 at 512k vectors. Round 8
# raised ivf_pq to 0.80 (verdict #5) on the back of two measured
# improvements: k-means++-seeded 16-iteration RESIDUAL codebooks
# (_train_pq_books kmpp=True) and a 0.4% shortlist for the residual
# family — engine-measured 0.85 at 512k post-change (was 0.74). pq
# keeps its original training (the kmpp refinement measurably HURTS
# raw spherical vectors: 0.91 -> 0.85) and rises to the margin its
# record supports, 0.75 (engine-measured 0.91 at 512k). Round 9 raised
# lsh 0.5 -> 0.65 (verdict #6): adaptive planes (~128 vectors/bucket at
# any n) + 16 tables + 8-mask query-directed multi-probe measured
# recall@1 0.85 at 512k with 4.35% candidates — vs the old fixed
# geometry's 0.90 at a near-brute-force 41.6% (tools/lsh_probe_lab.py).
_ANN_RECALL_FLOORS = {"lsh": 0.65, "ivf": 0.65, "pq": 0.75, "ivf_pq": 0.80}


@query("ann_recall", oracle=None)  # recall of approximations: no SQL twin
def ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of every ANN family, IN-BAND (round-5 verdict item): one
    row per index — (index_kind, k, hits, truth, recall, recall_floor) —
    where recall = |approx_topk ∩ exact_topk| / |exact_topk| over the
    query block, with exact_topk from the fully-oracled brute-force
    sim_topk. This is the number a user tunes nprobe/bands/codebooks
    against; until round 5 it lived only in test assertions.

    The floor is ASSERTED INSIDE THE QUERY: the recall column is
    F.when(recall >= floor, recall).otherwise(F.raise_error(...)), so a
    regression below the documented floor fails the driver's rows-only
    run loudly instead of shipping a silently-degraded index.

    Scale shape: each family's plan is its registry plan unchanged
    (bounded codebook samples, bucketed candidates); the recall join is
    |queries|·k rows a side — broadcast-sized at any collection size.
    ann_lsh reports strict recall@1 (its contract returns only the top
    neighbor); the other three report recall@{_TOP_K}."""
    exact = sim_topk(spark, sf_dir).select("query_id", "neighbor_id", "rk")
    fams = [
        (
            "lsh",
            ann_lsh(spark, sf_dir)
            .filter(F.col("vec_id") < _N_QUERIES)
            .select(
                F.col("vec_id").alias("query_id"),
                F.col("nn_id").alias("neighbor_id"),
            ),
            1,
        ),
        ("ivf", ann_ivf(spark, sf_dir).select("query_id", "neighbor_id"), _TOP_K),
        ("pq", ann_pq(spark, sf_dir).select("query_id", "neighbor_id"), _TOP_K),
        (
            "ivf_pq",
            ann_ivf_pq(spark, sf_dir).select("query_id", "neighbor_id"),
            _TOP_K,
        ),
    ]
    parts = []
    for kind, approx, k in fams:
        truth = exact.filter(F.col("rk") <= k)
        hits = approx.join(truth, ["query_id", "neighbor_id"], "inner")
        parts.append(
            hits.agg(F.count("*").alias("hits"))
            .crossJoin(truth.agg(F.count("*").alias("truth")))
            .select(
                F.lit(kind).alias("index_kind"),
                F.lit(k).cast("int").alias("k"),
                F.col("hits").cast("long").alias("hits"),
                F.col("truth").cast("long").alias("truth"),
            )
        )
    res = parts[0]
    for p in parts[1:]:
        res = res.unionByName(p)
    floor = F.element_at(
        F.create_map(
            *[F.lit(x) for kv in _ANN_RECALL_FLOORS.items() for x in kv]
        ),
        F.col("index_kind"),
    )
    recall = F.round(F.col("hits") / F.col("truth"), 4)
    # truth = 0 (empty corpus / empty query block): recall is undefined,
    # not failed — NULL recall, floor vacuously satisfied (zero-row
    # sweep: 0/0 is NULL, NULL >= floor is NULL, and the old otherwise()
    # branch fired raise_error on a corpus with nothing to recall).
    guarded = F.when(F.col("truth") == 0, F.lit(None).cast("double")).when(
        recall >= floor, recall
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit("ANN recall below documented floor "),
                floor.cast("string"),
                F.lit(": index="),
                F.col("index_kind"),
                F.lit(" recall="),
                recall.cast("string"),
            )
        ).cast("double")
    )
    return res.select(
        "index_kind",
        "k",
        "hits",
        "truth",
        guarded.alias("recall"),
        floor.alias("recall_floor"),
    )


# --------------------------------------------------------------- k-means

_KM_K = 8            # clusters; seeds = the K lowest vec_ids (deterministic)
_KM_ITERS = 2        # Lloyd iterations, unrolled identically in the oracle
_KM_Q = 1_000_000    # micro-unit quantizer for exact cross-engine sums

_KM_VALID_DUCK = (
    "embedding IS NOT NULL AND len(embedding) = 64 AND "
    "coalesce(list_aggregate(list_transform(embedding, x -> x <> 0), "
    "'bool_or'), false)"
)


def _km_duck_assign(src: str) -> str:
    """One assignment pass in the oracle: squared distance expanded as
    dot(x,x) - 2*dot(x,c) + dot(c,c) — three sequential folds that are
    bit-identical to the Spark HOF twin — argmin via row_number with the
    cid tie-break (same lexicographic order as Spark's struct min)."""
    return f"""
    SELECT e.vec_id, {src}.cid,
           list_dot_product(e.v, e.v) - 2*list_dot_product(e.v, {src}.c)
             + list_dot_product({src}.c, {src}.c) AS d2
    FROM e CROSS JOIN {src}
    QUALIFY row_number() OVER (PARTITION BY e.vec_id
                               ORDER BY d2, {src}.cid) = 1
    """


def _km_duck_update(a: str) -> str:
    """One centroid update in the oracle: per-dimension EXACT integer
    accumulation (oracle_sum2 doctrine at 1e-6 grain) — sum of
    round(coord*1e6) bigints, divided once by (1e6 * n) as doubles. Both
    engines land on the identical IEEE quotient, so iteration i+1 sees
    bit-identical centroids regardless of each engine's sum order."""
    return f"""
    SELECT {a}.cid, r.d AS d,
           CAST(sum(CAST(round(e.v[CAST(r.d AS INT) + 1] * {_KM_Q}) AS BIGINT))
                AS DOUBLE) / ({_KM_Q}.0 * count(*)) AS cv
    FROM {a} JOIN e USING (vec_id) CROSS JOIN range(64) AS r(d)
    GROUP BY {a}.cid, r.d
    """


_KMEANS_ORACLE = f"""
WITH e AS MATERIALIZED (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
  WHERE {_KM_VALID_DUCK}
),
c0 AS (SELECT vec_id AS cid, v AS c FROM e WHERE vec_id < {_KM_K}),
a1 AS ({_km_duck_assign('c0')}),
u1 AS ({_km_duck_update('a1')}),
c1 AS (SELECT cid, list(cv ORDER BY d) AS c FROM u1 GROUP BY cid),
a2 AS ({_km_duck_assign('c1')}),
u2 AS ({_km_duck_update('a2')}),
c2 AS (SELECT cid, list(cv ORDER BY d) AS c FROM u2 GROUP BY cid),
a3 AS ({_km_duck_assign('c2')})
SELECT cid AS cluster, count(*) AS n,
       CAST(sum(CAST(round(d2 * {_KM_Q}) AS BIGINT)) AS BIGINT) AS inertia_u
FROM a3 GROUP BY cid ORDER BY cluster
"""


def _km_seq_sqnorm(c) -> float:
    """Driver-side twin of the sequential dot(c,c) fold: acc starts at
    0.0 and adds c[d]*c[d] left to right — the exact IEEE order of both
    list_dot_product and the Spark HOF fold."""
    acc = 0.0
    for v in c:
        acc += v * v
    return acc


def _km_assign(df: DataFrame, cents) -> DataFrame:
    """Zero-shuffle assignment: centroids are a driver-side list (k is
    tiny by construction), so argmin is a pure codegen expression —
    array_min over k (d2, cid) structs (lexicographic struct order = the
    oracle's ORDER BY d2, cid) with dot(x,x) hoisted to one column so
    the fold runs once per row, not once per centroid."""
    x = F.col("embedding")
    if not cents:
        # zero-row training table (empty-fixture sweep): there are no
        # rows to assign, but the plan must still ANALYZE — an empty
        # F.array() is VOID-typed and `best.cid` extraction fails.
        # Emit the same schema over the (empty) input.
        return df.withColumn("dxx", _dot(x, x)).select(
            "vec_id",
            "embedding",
            F.lit(-1).alias("cid"),
            F.lit(None).cast("double").alias("d2"),
        )
    structs = []
    for cid, c in cents:
        clit = F.array(*[F.lit(float(v)) for v in c])
        d2 = F.col("dxx") - 2.0 * _dot(x, clit) + F.lit(_km_seq_sqnorm(c))
        structs.append(F.struct(d2.alias("d2"), F.lit(int(cid)).alias("cid")))
    best = F.array_min(F.array(*structs))
    # cid emitted NON-NULLABLE (coalesce with a sentinel that can never
    # fire — the struct array is a non-empty literal): a nullable cid
    # used as a join key makes InferFiltersFromConstraints add
    # isnotnull(cid), and pushdown re-substitutes the WHOLE k-centroid
    # assignment expression into a Filter below the project — the exact
    # re-evaluation trap tools/plan_audit.py exists to catch (it did).
    return (
        df.withColumn("dxx", _dot(x, x))
        .withColumn("best", best)
        .select(
            "vec_id",
            "embedding",
            F.coalesce(F.col("best.cid"), F.lit(-1)).alias("cid"),
            F.col("best.d2").alias("d2"),
        )
    )


def _km_centroids(spark: SparkSession, sf_dir: str, e: DataFrame):
    """Train the k=_KM_K, _KM_ITERS-iteration Lloyd centroids; memoized
    per fixture file (artifact_memo) so a session re-running the cluster
    family pays the two update jobs once. Each update is posexplode ->
    groupBy(cid, d): the shuffle carries only k*64 partial sums per map
    task (partial aggregation), and the collect is k*64 rows — metadata
    scale at any corpus size."""

    def train():
        seeds = (
            e.filter(F.col("vec_id") < _KM_K)
            .select("vec_id", "embedding")
            .collect()
        )
        cents = sorted(
            (int(r.vec_id), [float(v) for v in r.embedding]) for r in seeds
        )
        for _ in range(_KM_ITERS):
            rows = (
                _km_assign(e, cents)
                .select("cid", F.posexplode("embedding").alias("d", "val"))
                .groupBy("cid", "d")
                .agg(
                    F.sum(
                        F.round(F.col("val").cast("double") * _KM_Q).cast("long")
                    ).alias("s"),
                    F.count("*").alias("n"),
                )
                .collect()
            )
            byc: dict[int, dict[int, float]] = {}
            for r in rows:
                byc.setdefault(int(r.cid), {})[int(r.d)] = r.s / (
                    float(_KM_Q) * r.n
                )
            cents = sorted(
                (cid, [m[d] for d in range(_EMB_DIM)]) for cid, m in byc.items()
            )
        return cents

    return artifact_memo(
        spark, sf_dir, "embeddings", f"kmeans:{_KM_K}x{_KM_ITERS}", train
    )


@query("vec_kmeans", oracle=_KMEANS_ORACLE, tags=("vectors", "llm-pipeline"))
def vec_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fixed-iteration Lloyd's k-means over the embedding
    corpus — the clustering pass a curation pipeline runs before
    cluster-balanced sampling or SemDedup. k seeds = the k lowest
    vec_ids; _KM_ITERS unrolled iterations; output is per-cluster size +
    exact micro-unit inertia.

    Exactness: every cross-engine float is pinned. Distances are three
    sequential double folds combined in one fixed expression order;
    centroid updates accumulate round(coord*1e6) BIGINTs (the
    oracle_sum2 doctrine) and divide once, so iteration i+1's centroids
    are bit-identical doubles in both engines; inertia is emitted as the
    integer micro-unit sum. Ties in argmin break on cid in both
    (struct-min ORDER = ORDER BY d2, cid).

    Scale: assignment is zero-shuffle pure codegen (centroids are k
    driver-side literals); each update shuffles only k*64 partial sums
    per map task and collects k*64 rows; the final pass is one partial-
    aggregated groupBy(cid). At 100 TB the cost is _KM_ITERS+1 linear
    scans — the standard distributed-Lloyd layout (broadcast centroids,
    map-side partial sums), with the k x dim "model" deliberately tiny
    next to the data."""
    e = _clean_embeddings(Tables(spark, sf_dir).embeddings).select(
        "vec_id", "embedding"
    )
    cents = _km_centroids(spark, sf_dir, e)
    return (
        _km_assign(e, cents)
        .groupBy(F.col("cid").alias("cluster"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("d2") * _KM_Q).cast("long")).alias("inertia_u"),
        )
        .orderBy("cluster")
    )


_SEMDEDUP_TAU = 0.35  # fixture-calibrated: the synthetic embeddings are
# near-isotropic (max pairwise cos ~0.51, within-cluster q99.9 ~0.41 —
# FIXTURES.md corpus notes), so a production tau of ~0.9 would make the
# drop path vacuous here; 0.35 exercises it at every fixture SF.


@query(
    "vec_semdedup",
    oracle=f"""
    WITH e AS MATERIALIZED (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
      WHERE {_KM_VALID_DUCK}
    ),
    c0 AS (SELECT vec_id AS cid, v AS c FROM e WHERE vec_id < {_KM_K}),
    a AS ({_km_duck_assign('c0')}),
    m AS (SELECT a.vec_id, a.cid, e.v FROM a JOIN e USING (vec_id)),
    dup AS (
      SELECT DISTINCT b.vec_id
      FROM m a JOIN m b ON a.cid = b.cid AND a.vec_id < b.vec_id
      WHERE {_DUCK_COS} >= {_SEMDEDUP_TAU}
    )
    SELECT m.vec_id, m.cid AS cluster
    FROM m LEFT JOIN dup ON m.vec_id = dup.vec_id
    WHERE dup.vec_id IS NULL
    """,
    tags=("vectors", "llm-pipeline"),
)
def vec_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDedup-style semantic deduplication (Abbas et al. 2023, public):
    bucket the corpus by nearest seed centroid, then inside each bucket
    drop any vector whose cosine to a LOWER-vec_id bucket-mate reaches
    tau — the keep-the-earliest rule that makes the survivor set a pure
    function of the data (no iteration order, no RNG).

    Exactness: assignment reuses vec_kmeans' pinned distance algebra;
    cosines are the proven _dot/_DUCK_COS twins rounded to 6dp BEFORE
    the threshold, so the drop decision compares identical doubles.

    Scale: the quadratic term is bounded per cluster (the
    sim_pairs_threshold argument — any coarse bucket caps the pair
    space; with balanced k-means buckets it's n^2/k per bucket, and k
    grows with the corpus in production). The dup set join is a
    broadcast-size anti-join at fixture scale and a shuffle anti-join on
    vec_id at 100 TB — both skew-free (unique key)."""
    e = _clean_embeddings(Tables(spark, sf_dir).embeddings).select(
        "vec_id", "embedding"
    )
    seeds = artifact_memo(
        spark,
        sf_dir,
        "embeddings",
        f"kmeans:{_KM_K}:seeds",
        lambda: sorted(
            (int(r.vec_id), [float(v) for v in r.embedding])
            for r in e.filter(F.col("vec_id") < _KM_K)
            .select("vec_id", "embedding")
            .collect()
        ),
    )
    m = _with_norm(_km_assign(e, seeds)).select(
        "vec_id", "cid", "embedding", "norm"
    )
    b = m.select(
        F.col("vec_id").alias("vec_id_b"),
        F.col("cid").alias("cid_b"),
        F.col("embedding").alias("embedding_b"),
        F.col("norm").alias("norm_b"),
    )
    cos = F.round(
        _dot(F.col("embedding"), F.col("embedding_b"))
        / (F.col("norm") * F.col("norm_b")),
        6,
    )
    dup = (
        m.join(
            b,
            (F.col("cid") == F.col("cid_b"))
            & (F.col("vec_id") < F.col("vec_id_b")),
        )
        .filter(cos >= _SEMDEDUP_TAU)
        .select(F.col("vec_id_b").alias("vec_id"))
        .distinct()
    )
    return m.join(dup, "vec_id", "left_anti").select(
        "vec_id", F.col("cid").alias("cluster")
    )


_CB_M = 40  # per-cluster sample size (sf0.01 clusters hold 50-70 valid
# vectors, sf0.1 ~600 — the cap binds at every fixture SF).


@query(
    "pipeline_cluster_balance",
    oracle=f"""
    WITH e AS MATERIALIZED (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
      WHERE {_KM_VALID_DUCK}
    ),
    c0 AS (SELECT vec_id AS cid, v AS c FROM e WHERE vec_id < {_KM_K}),
    a AS ({_km_duck_assign('c0')})
    SELECT vec_id, cid AS cluster, CAST(rk AS BIGINT) AS rk FROM (
      SELECT vec_id, cid,
             row_number() OVER (
               PARTITION BY cid
               ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rk
      FROM a
    ) WHERE rk <= {_CB_M}
    """,
    tags=("vectors", "llm-pipeline"),
)
def pipeline_cluster_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-balanced sampling — vec_kmeans' downstream consumer: keep
    at most m vectors per cluster, chosen by md5(vec_id) order, so the
    curated corpus covers every region of embedding space instead of
    mirroring the raw density (the diversity half of SemDedup-style
    curation). md5 order = a deterministic uniform draw (sample_det
    doctrine): rerun or backfill selects the same rows, and the oracle
    reproduces the choice bit-for-bit.

    Scale: assignment is the zero-shuffle codegen expression; the
    window sees only (vec_id, cid) pairs — the embedding column is
    pruned before the exchange — and WindowGroupLimit prunes each
    partition to its top-m before the shuffle (the sample_stratified
    plan shape), so the exchange carries O(k*m) rows plus partial
    ranks, not the corpus."""
    e = _clean_embeddings(Tables(spark, sf_dir).embeddings).select(
        "vec_id", "embedding"
    )
    seeds = artifact_memo(
        spark,
        sf_dir,
        "embeddings",
        f"kmeans:{_KM_K}:seeds",
        lambda: sorted(
            (int(r.vec_id), [float(v) for v in r.embedding])
            for r in e.filter(F.col("vec_id") < _KM_K)
            .select("vec_id", "embedding")
            .collect()
        ),
    )
    w = W.partitionBy("cid").orderBy(
        F.md5(F.col("vec_id").cast("string")), "vec_id"
    )
    return (
        _km_assign(e, seeds)
        .select("vec_id", "cid")
        .withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= _CB_M)
        .select("vec_id", F.col("cid").alias("cluster"), "rk")
    )


# ------------------------------------------- end-to-end curation recipe

def _curate_semantic_oracle() -> str:
    """Built lazily at import via the function call below so the oracle
    can splice pipeline.py's token-budget constants without a module-
    level import cycle risk (pipeline imports nothing from here)."""
    from pandas_tsdb_spark.operators.pipeline import (
        _BUDGET_TOKENS,
        _TB_QUALITY,
        _TB_TOKS,
    )

    return f"""
    WITH e AS MATERIALIZED (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
      WHERE {_KM_VALID_DUCK}
    ),
    c0 AS (SELECT vec_id AS cid, v AS c FROM e WHERE vec_id < {_KM_K}),
    a AS ({_km_duck_assign('c0')}),
    m AS (SELECT a.vec_id, a.cid, e.v FROM a JOIN e USING (vec_id)),
    dup AS (
      SELECT DISTINCT b.vec_id
      FROM m a JOIN m b ON a.cid = b.cid AND a.vec_id < b.vec_id
      WHERE {_DUCK_COS} >= {_SEMDEDUP_TAU}
    ),
    keep AS (
      SELECT m.vec_id, m.cid FROM m
      LEFT JOIN dup ON m.vec_id = dup.vec_id WHERE dup.vec_id IS NULL
    ),
    sel AS (
      SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               row_number() OVER (
                 PARTITION BY cid
                 ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rk
        FROM keep
      ) WHERE rk <= {_CB_M}
    ),
    scored AS (
      SELECT d.doc_id, sel.cid AS cluster, d.lang,
             CAST(len({_TB_TOKS}) AS BIGINT) AS n_tokens,
             {_TB_QUALITY} AS quality
      FROM documents d JOIN sel ON d.doc_id = sel.vec_id
      WHERE d.text IS NOT NULL AND len({_TB_TOKS}) > 0
    ),
    ranked AS (
      SELECT doc_id, cluster, lang, n_tokens, quality,
             CAST(sum(n_tokens) OVER (
               PARTITION BY lang ORDER BY quality DESC, doc_id
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
      FROM scored
    )
    SELECT doc_id, cluster, lang, n_tokens, quality, cum_tokens
    FROM ranked WHERE cum_tokens <= {_BUDGET_TOKENS}
    """


@query(
    "pipeline_curate_semantic",
    oracle=_curate_semantic_oracle(),
    tags=("vectors", "llm-pipeline"),
)
def pipeline_curate_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full semantic-curation recipe as ONE declarative plan —
    cluster (seed assignment), SemDedup within clusters, cluster-
    balanced diversity sampling, then per-language best-first token
    budgeting over the surviving documents. This is the composition a
    curation run actually executes, registered end-to-end so the driver
    hashes the WHOLE recipe, not just its stages.

    Stage reuse is literal: the survivor set IS vec_semdedup's
    registered builder (same seeds via artifact_memo, same pinned
    cosine algebra), the balance window is pipeline_cluster_balance's
    md5-order rank applied to survivors, and the quality/budget columns
    come from pipeline._doc_token_quality — the one definition the
    token-budget oracle string mirrors. Exactness therefore inherits
    from the three already-proven blocks; the only new algebra is the
    doc_id = vec_id equi-join.

    Scale: the selection that reaches the documents table is <= k*m
    rows at ANY corpus size (the balance cap binds before the join), so
    the join is an explicit broadcast — the 100 TB documents scan never
    shuffles; it streams past a tiny hash relation and only surviving
    rows pay tokenization. The budget window then sees <= k*m rows.
    The quadratic term lives entirely inside vec_semdedup's bounded
    per-cluster pair space (see its docstring for the n^2/k law and
    the measured doubling exponents in tools/curation_scale_probe.py)."""
    from pandas_tsdb_spark.operators.pipeline import (
        _BUDGET_TOKENS,
        _doc_token_quality,
    )

    keep = vec_semdedup(spark, sf_dir)
    w = W.partitionBy("cluster").orderBy(
        F.md5(F.col("vec_id").cast("string")), "vec_id"
    )
    sel = (
        keep.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _CB_M)
        .select("vec_id", "cluster")
    )
    toks, quality = _doc_token_quality()
    # NOTE: deliberately NOT _spread() — the broadcast join cuts the
    # corpus to <= k*m rows BEFORE any tokenization, so fanning the raw
    # documents out first would be a full-corpus exchange for nothing
    # (the inverse of token_budget, whose scoring is corpus-wide).
    scored = (
        Tables(spark, sf_dir).documents
        .join(F.broadcast(sel), F.col("doc_id") == F.col("vec_id"))
        .filter(F.col("text").isNotNull() & (F.size(toks) > 0))
        .select(
            "doc_id",
            "cluster",
            "lang",
            F.size(toks).cast("bigint").alias("n_tokens"),
            quality.alias("quality"),
        )
    )
    wb = (
        W.partitionBy("lang")
        .orderBy(F.col("quality").desc(), "doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        scored.withColumn("cum_tokens", F.sum("n_tokens").over(wb))
        .filter(F.col("cum_tokens") <= _BUDGET_TOKENS)
    )


_CEB_M = 1  # representatives kept per (label, sign-bucket): the bucket
# space is 10 labels x 64 sign patterns = 640 buckets at ANY corpus
# size, so the curated selection is bounded by 640*m rows forever; m=1
# makes the cap bind at every fixture SF (sf0.01 buckets hold 1-5
# vectors, sf0.1 ~8).


def _curate_embedding_oracle() -> str:
    from pandas_tsdb_spark.operators.pipeline import (
        _BUDGET_TOKENS,
        _TB_QUALITY,
        _TB_TOKS,
    )

    return f"""
    WITH e AS MATERIALIZED (
      SELECT vec_id, label, embedding::DOUBLE[] AS v,
             {_SIGN_SQL} AS sbucket
      FROM embeddings
      WHERE {_KM_VALID_DUCK}
    ),
    keep AS (
      SELECT vec_id, label, sbucket FROM e a
      WHERE NOT EXISTS (
          SELECT 1 FROM e b
          WHERE b.label = a.label AND b.sbucket = a.sbucket
            AND b.vec_id < a.vec_id
            AND {_DUCK_COS} >= {_DEDUP_TAU}
      )
    ),
    sel AS (
      SELECT vec_id, label, sbucket FROM (
        SELECT vec_id, label, sbucket,
               row_number() OVER (
                 PARTITION BY label, sbucket
                 ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rk
        FROM keep
      ) WHERE rk <= {_CEB_M}
    ),
    scored AS (
      SELECT d.doc_id, sel.label, sel.sbucket, d.lang,
             CAST(len({_TB_TOKS}) AS BIGINT) AS n_tokens,
             {_TB_QUALITY} AS quality
      FROM documents d JOIN sel ON d.doc_id = sel.vec_id
      WHERE d.text IS NOT NULL AND len({_TB_TOKS}) > 0
    ),
    ranked AS (
      SELECT doc_id, label, sbucket, lang, n_tokens, quality,
             CAST(sum(n_tokens) OVER (
               PARTITION BY lang ORDER BY quality DESC, doc_id
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
      FROM scored
    )
    SELECT doc_id, label, sbucket, lang, n_tokens, quality, cum_tokens
    FROM ranked WHERE cum_tokens <= {_BUDGET_TOKENS}
    """


@query(
    "pipeline_curate_embedding",
    oracle=_curate_embedding_oracle(),
    tags=("vectors", "llm-pipeline"),
)
def pipeline_curate_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LINEAR-interior twin of pipeline_curate_semantic — the
    recipe shape a production corpus actually runs: sign-bucketed
    cosine dedup (dedup_embedding's interior, pair space bounded per
    640-fold-refined bucket) -> one md5-order representative per
    (label, sign-bucket) -> broadcast doc attach -> per-language token
    budget. Where curate_semantic's SemDedup stage is deliberately
    n^2/k with k pinned for oracle exactness (and therefore subsetted
    in the 256x probe), every stage here is linear or bounded, so THIS
    variant runs at the scaled fixture end-to-end and sits in
    tools/driver_collect_audit.py's tight-cap list.

    Exactness: inherits dedup_embedding's proven drop algebra (raw
    parquet floats, 6dp-rounded cosines), cluster_balance's md5-order
    draw doctrine, and the shared _doc_token_quality columns; the
    oracle nests the same blocks.

    Scale: the selection reaching documents is <= 640*m rows at ANY
    corpus size (the bucket space is fixed by construction, not by
    data volume), so the doc attach broadcasts and the corpus never
    shuffles; the budget window then sees <= 640*m rows. Driver
    traffic is O(1) in the corpus — asserted per-round by the 256m
    maxResultSize audit at the 256x fixture."""
    from pandas_tsdb_spark.operators.pipeline import (
        _BUDGET_TOKENS,
        _doc_token_quality,
    )

    keep = _embedding_survivors(spark, sf_dir)
    w = W.partitionBy("label", "sbucket").orderBy(
        F.md5(F.col("vec_id").cast("string")), "vec_id"
    )
    sel = (
        keep.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _CEB_M)
        .select("vec_id", "label", "sbucket")
    )
    toks, quality = _doc_token_quality()
    scored = (
        Tables(spark, sf_dir).documents
        .join(F.broadcast(sel), F.col("doc_id") == F.col("vec_id"))
        .filter(F.col("text").isNotNull() & (F.size(toks) > 0))
        .select(
            "doc_id",
            "label",
            "sbucket",
            "lang",
            F.size(toks).cast("bigint").alias("n_tokens"),
            quality.alias("quality"),
        )
    )
    wb = (
        W.partitionBy("lang")
        .orderBy(F.col("quality").desc(), "doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        scored.withColumn("cum_tokens", F.sum("n_tokens").over(wb))
        .filter(F.col("cum_tokens") <= _BUDGET_TOKENS)
    )
