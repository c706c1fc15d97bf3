#!/usr/bin/env python
"""Round-9 optimization A/B: eliminate duplicated full-corpus subtrees.

The formatted plans (plans/r09/*_before.txt) show the text-family model
tables (tf->df, vocab, uni/big, cand_arrays) re-planning the whole
scan->spread->explode->agg subtree once PER CONSUMER: Catalyst prunes
columns differently per branch, so ReuseExchange never fires and the
corpus pass runs 2-4x per query. Candidate fix (minhash `cands`
precedent): eager localCheckpoint on the small derived table, which
pins the corpus-side work to exactly one pass.

Variant A = registered builder (current), B = checkpointed rewrite.
Protocol: result-equality assert at the bench SF first, then
interleaved A,B,A,B timings in ONE session (the only trustworthy
protocol on this container — BASELINE.md §M7).

Usage: python tools/ab_dup_subtree.py <tfidf|lm_score|lm_bigram|minhash> [reps=7]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, SparkSession, Window as W  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from pandas_tsdb_spark.registry import load_all  # noqa: E402
from pandas_tsdb_spark.session import get_spark  # noqa: E402
from pandas_tsdb_spark.operators import llm_text as LT  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


# ------------------------------------------------------------ variants


def tfidf_ckpt(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = LT._docs(spark, sf_dir)
    tok = LT._spread(d).select(
        "doc_id", F.explode(LT._tokens_col()).alias("tok")
    )
    tf = (
        tok.groupBy("doc_id", "tok")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=True)
    )
    df = tf.groupBy("tok").agg(F.count("*").alias("df"))
    n = d.agg(F.count("*").alias("n_docs"))
    tfidf = F.col("tf") * (
        F.log((F.col("n_docs") + 1.0) / (F.col("df") + F.lit(1.0))) + 1.0
    )
    return (
        tf.join(F.broadcast(df), "tok")
        .crossJoin(F.broadcast(n))
        .select("doc_id", "tok", "tf", "df", F.round(tfidf, 6).alias("tfidf"))
    )


def lm_score_ckpt(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = LT._docs(spark, sf_dir)
    tok = LT._spread(d).select(
        "doc_id", F.explode(LT._tokens_col()).alias("tok")
    )
    vocab = (
        tok.groupBy("tok")
        .agg(F.count("*").alias("cnt"))
        .withColumn(
            "n_total", F.sum("cnt").over(W.partitionBy()).cast("double")
        )
        .localCheckpoint(eager=True)
    )
    lp = F.log(F.col("cnt").cast("double") / F.col("n_total"))
    scored = (
        tok.join(F.broadcast(vocab), "tok")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.sum(lp), 6).alias("sum_lp"),
        )
    )
    nll = -(F.col("sum_lp") / F.col("n_tokens"))
    return scored.select(
        "doc_id", "n_tokens", nll.alias("nll"),
        F.round(F.exp(nll), 6).alias("ppl"),
    )


def lm_bigram_ckpt(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = LT._docs(spark, sf_dir)
    toks = LT._tokens_col()
    n = F.size(toks)
    bigram_col = F.zip_with(
        F.slice(toks, 1, n - 1),
        F.slice(toks, 2, n - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    spread = LT._spread(d)
    tok = spread.select("doc_id", F.explode(toks).alias("tok"))
    uni = (
        tok.groupBy("tok")
        .agg(F.count("*").alias("c1"))
        .withColumn(
            "n_total", F.sum("c1").over(W.partitionBy()).cast("double")
        )
        .localCheckpoint(eager=True)
    )
    db = spread.select("doc_id", F.explode(bigram_col).alias("bigram"))
    big = db.groupBy("bigram").agg(F.count("*").alias("c2"))
    w = F.split(F.col("bigram"), " ")
    bprob = (
        big.join(
            F.broadcast(
                uni.drop("n_total")
                .withColumnRenamed("c1", "c1_w1")
                .withColumnRenamed("tok", "w1")
            ),
            w.getItem(0) == F.col("w1"),
        )
        .join(
            F.broadcast(
                uni.withColumnRenamed("c1", "c1_w2").withColumnRenamed(
                    "tok", "w2"
                )
            ),
            w.getItem(1) == F.col("w2"),
        )
        .select(
            "bigram",
            (
                0.75 * (F.col("c2").cast("double") / F.col("c1_w1"))
                + 0.25 * (F.col("c1_w2").cast("double") / F.col("n_total"))
            ).alias("p"),
        )
    )
    return (
        db.join(F.broadcast(bprob), "bigram")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            (-(F.round(F.sum(F.log("p")), 6) / F.count("*"))).alias("nll2"),
        )
    )


def minhash_ckpt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered dedup_minhash with ONE added checkpoint on cand_arrays
    (the per-candidate shingle sets): the before plan builds the
    LeftSemi + shingle subtree once per probe side (a_sets / b_sets)."""
    import pandas_tsdb_spark.operators.llm_text as M

    d = M._docs(spark, sf_dir)
    th_sig = M._spread(d).select(
        "doc_id",
        F.explode(F.array_distinct(M._shingle_hashes_col(3))).alias("h"),
    )
    K = M._MINHASH_K
    sigs = th_sig.groupBy("doc_id").agg(
        F.expr("count(*) AS set_size"),
        *[
            F.expr(
                f"min(CASE WHEN pmod(h, {K}) = {i} THEN h END) AS h{i}"
            )
            for i in range(K)
        ],
    )
    gmin_sql = "least(" + ", ".join(f"h{i}" for i in range(K)) + ")"
    sigs = sigs.selectExpr(
        "doc_id",
        "set_size",
        *[f"coalesce(h{i}, {gmin_sql} + {i}) AS h{i}" for i in range(K)],
    )
    n_bands = K // M._BAND_ROWS
    band_structs = ", ".join(
        "struct({b} AS band_id, xxhash64({cols}) AS band_hash)".format(
            b=b,
            cols=", ".join(
                f"h{b * M._BAND_ROWS + r}" for r in range(M._BAND_ROWS)
            ),
        )
        for b in range(n_bands)
    )
    bands = sigs.selectExpr(
        "doc_id", "set_size", f"explode(array({band_structs})) AS band"
    ).select("doc_id", "set_size", "band.band_id", "band.band_hash")
    buckets = (
        bands.groupBy("band_id", "band_hash")
        .agg(F.collect_list(F.struct("doc_id", "set_size")).alias("ds"))
        .filter(F.size("ds") >= 2)
    )
    cands = (
        buckets.select(
            F.explode(
                F.expr(
                    "flatten(transform(ds, x -> "
                    "transform(filter(ds, y -> y.doc_id > x.doc_id), "
                    "y -> struct(x.doc_id AS doc_a, y.doc_id AS doc_b, "
                    "x.set_size AS size_a, y.set_size AS size_b))))"
                )
            ).alias("p")
        )
        .select("p.*")
        .distinct()
        .filter(
            (F.col("size_a") <= 2 * F.col("size_b"))
            & (F.col("size_b") <= 2 * F.col("size_a"))
        )
    )
    cands = cands.localCheckpoint(eager=True)
    cand_ids = (
        cands.select(F.col("doc_a").alias("doc_id"))
        .union(cands.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    cand_arrays = (
        d.select("doc_id", "text")
        .join(cand_ids, "doc_id", "left_semi")
        .select(
            "doc_id", F.array_distinct(M._shingle_hashes_col(3)).alias("shs")
        )
        .localCheckpoint(eager=True)  # <- the one new line
    )
    a_sets = cand_arrays.select(
        F.col("doc_id").alias("doc_a"), F.col("shs").alias("sa")
    )
    b_sets = cand_arrays.select(
        F.col("doc_id").alias("doc_b"), F.col("shs").alias("sb")
    )
    inter = (
        cands.join(a_sets, "doc_a")
        .join(b_sets, "doc_b")
        .withColumn("n_inter", F.size(F.array_intersect("sa", "sb")))
    )
    jac = F.col("n_inter") / (
        F.col("size_a") + F.col("size_b") - F.col("n_inter")
    )
    return (
        inter.withColumn("jaccard", F.round(jac, 6))
        .filter(F.col("jaccard") >= 0.5)
        .select("doc_a", "doc_b", "jaccard")
    )


VARIANTS = {
    "tfidf": ("text_tfidf", tfidf_ckpt),
    "lm_score": ("text_lm_score", lm_score_ckpt),
    "lm_bigram": ("text_lm_bigram", lm_bigram_ckpt),
    "minhash": ("dedup_minhash", minhash_ckpt),
}


def main() -> None:
    target = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 7
    key, variant = VARIANTS[target]
    spark = get_spark("ab-dup-subtree")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()

    # result equality at the bench SF (sorted rows); skip at scaled
    # fixtures (row-proportional collect — equality is proven at sf0.1)
    if os.environ.get("SPARK_GRAFT_AB_SKIP_EQ") != "1":
        a_rows = sorted(
            map(tuple, specs[key].builder(spark, SF_DIR).collect())
        )
        b_rows = sorted(map(tuple, variant(spark, SF_DIR).collect()))
        assert a_rows == b_rows, (
            f"variant changes the result: {len(a_rows)} vs {len(b_rows)} rows; "
            f"first diff {next((x for x, y in zip(a_rows, b_rows) if x != y), None)}"
        )
        print(f"{key}: result equality OK ({len(a_rows)} rows)")

    a_times, b_times = [], []
    # 1 discarded warm pass each
    _noop(specs[key].builder(spark, SF_DIR))
    _noop(variant(spark, SF_DIR))
    for _ in range(reps):
        spark._jvm.System.gc()
        t0 = time.perf_counter()
        _noop(specs[key].builder(spark, SF_DIR))
        a_times.append(time.perf_counter() - t0)
        spark._jvm.System.gc()
        t0 = time.perf_counter()
        _noop(variant(spark, SF_DIR))
        b_times.append(time.perf_counter() - t0)
    print(f"A (registered) median {statistics.median(a_times):.3f}s  {sorted(a_times)}")
    print(f"B (checkpoint)  median {statistics.median(b_times):.3f}s  {sorted(b_times)}")


if __name__ == "__main__":
    main()
