#!/usr/bin/env python
"""Scale evidence for the round-9 cluster-curation family.

Two claims need numbers, not docstrings:

1. The LINEAR ops (vec_kmeans, pipeline_cluster_balance,
   pipeline_token_budget, text_dup_ngrams) stay correct AND tractable
   at the 256x fixture — and because every one carries a full DuckDB
   oracle and the harness binds directory-backed fixtures, the scale
   run is the REAL differential (512k vectors / 1.28M docs), not a
   layout digest. text_dup_ngrams is the one row-proportional output
   (one row per document — 1.28M at 256x, which overflows
   spark.driver.maxResultSize if toPandas'd), so IT alone is compared
   through an order-independent cross-engine digest: count(*), exact
   BIGINT column sums (micro-unit doctrine for the 6-dp fraction), and
   count(DISTINCT md5(row-string)) — both engines compute the same
   lowercase-hex md5 over the same concat_ws rendering, and no hex->int
   conversion is needed (DuckDB lacks conv()).

2. vec_semdedup is deliberately quadratic-within-cluster (n^2/k pair
   space — the docstring says so and says k must grow with the
   corpus). This probe MEASURES that law instead of assuming it:
   paired differentials at 8k/16k vector subsets, a Spark-only pass at
   32k, and the fitted doubling exponent printed alongside. A future
   regression that silently makes it all-pairs (k collapsing to 1)
   shows up as the exponent leaving the ~2 band. dedup_embedding runs
   the SAME ladder as the refined-bucket contrast (640 buckets vs 8
   clusters): its exponent staying far below semdedup's is the
   measured argument that bucket refinement, not hardware, is what
   buys semantic dedup its scale.

Usage: python tools/curation_scale_probe.py [sf_dir] [--ladder-only]
e.g.   python tools/curation_scale_probe.py /tmp/sf256full
`--ladder-only` skips the linear-op differentials (already recorded)
and runs just the subset ladders.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, "/root/repo")

_ARGS = [a for a in sys.argv[1:] if not a.startswith("--")]
SF_DIR = _ARGS[0] if _ARGS else "/tmp/sf256full"
LADDER_ONLY = "--ladder-only" in sys.argv
LINEAR_OPS = [
    "vec_kmeans",
    "pipeline_cluster_balance",
    "pipeline_token_budget",
    "text_dup_ngrams",
]
SEMDEDUP_SUBSETS = [8_192, 16_384]   # paired differential sizes
SEMDEDUP_SPARK_ONLY = 32_768         # one more doubling, Spark side only

_DNG_ROW_DUCK = (
    "concat_ws('|', CAST(doc_id AS VARCHAR), CAST(n_shingles AS VARCHAR), "
    "CAST(n_dup AS VARCHAR), "
    "CAST(CAST(round(dup_frac * 1e6) AS BIGINT) AS VARCHAR))"
)


def _dng_digest_spark(df):
    """Order-independent digest of text_dup_ngrams' per-document rows."""
    from pyspark.sql import functions as F

    frac_u = F.round(F.col("dup_frac") * 1e6).cast("long")
    row = F.concat_ws(
        "|",
        F.col("doc_id").cast("string"),
        F.col("n_shingles").cast("string"),
        F.col("n_dup").cast("string"),
        frac_u.cast("string"),
    )
    return df.agg(
        F.count("*").alias("n_rows"),
        F.sum("doc_id").alias("s_doc"),
        F.sum("n_shingles").alias("s_shingles"),
        F.sum("n_dup").alias("s_dup"),
        F.sum(frac_u).alias("s_frac_u"),
        F.countDistinct(F.md5(row)).alias("n_row_md5"),
    )


def _dng_digest_duck(oracle: str) -> str:
    return f"""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(doc_id) AS BIGINT) AS s_doc,
           CAST(sum(n_shingles) AS BIGINT) AS s_shingles,
           CAST(sum(n_dup) AS BIGINT) AS s_dup,
           CAST(sum(CAST(round(dup_frac * 1e6) AS BIGINT)) AS BIGINT)
             AS s_frac_u,
           CAST(count(DISTINCT md5({_DNG_ROW_DUCK})) AS BIGINT) AS n_row_md5
    FROM ({oracle})
    """


def _stage_subset(spark, n: int) -> str:
    """Stage the first n vectors IN vec_id ORDER from SF_DIR's
    embeddings as a fixture dir; other tables symlink to sf0.1 (unused
    by semdedup). orderBy+limit, NOT `vec_id < n`: scaled fixtures
    keyshift vec_ids by 1e6 per copy, so a range predicate selects only
    the original block at every n and the ladder silently measures the
    same data three times (exactly what the first probe run did —
    kept was 1241 at 8k, 16k AND 32k)."""
    import glob
    import shutil

    stage = f"/tmp/curation_probe_{n}"
    if os.path.isdir(stage):
        shutil.rmtree(stage)
    os.makedirs(stage)
    tmp = f"{stage}.write"
    (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .orderBy("vec_id")
        .limit(n)
        .coalesce(1)
        .write.parquet(tmp)
    )
    shutil.copy(
        glob.glob(f"{tmp}/part-*.parquet")[0], f"{stage}/embeddings.parquet"
    )
    shutil.rmtree(tmp)
    for t in ("region nation customer supplier part orders lineitem "
              "events documents").split():
        os.symlink(f"/root/testdata/sf0.1/{t}.parquet", f"{stage}/{t}.parquet")
    return stage


def main() -> int:
    from pandas_tsdb_spark.registry import load_all
    from pandas_tsdb_spark.session import get_spark
    from tests.harness import compare, duck_connect

    spark = get_spark("curation-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()
    out: dict = {"sf_dir": SF_DIR, "linear": {}}
    fails = 0

    con = duck_connect(SF_DIR)
    for name in [] if LADDER_ONLY else LINEAR_OPS:
        spec = specs[name]
        digested = name == "text_dup_ngrams"
        t0 = time.perf_counter()
        df = spec.builder(spark, SF_DIR)
        sp = (_dng_digest_spark(df) if digested else df).toPandas()
        t_spark = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        du = con.execute(
            _dng_digest_duck(spec.oracle) if digested else spec.oracle
        ).fetchdf()
        t_duck = round(time.perf_counter() - t0, 2)
        errs = compare(sp, du, name)
        ok = not errs
        fails += not ok
        n_rows = int(sp["n_rows"].iloc[0]) if digested else len(sp)
        out["linear"][name] = {
            "ok": ok, "rows": n_rows, "digested": digested,
            "spark_sec": t_spark, "duck_sec": t_duck,
        }
        print(
            f"{name}: {'ok' if ok else 'FAIL ' + str(errs[:2])} "
            f"rows={n_rows} spark={t_spark}s duck={t_duck}s"
            f"{' (digest)' if digested else ''}",
            file=sys.stderr,
        )

    # Two semantic-dedup shapes on the SAME rank-subset ladder:
    # vec_semdedup is deliberately n^2/k with k FIXED at 8 (expect the
    # doubling exponent to sit near 2); dedup_embedding refines its
    # buckets 640-fold (10 labels x 64 sign patterns), so at these n it
    # should stay overhead-dominated (exponent near 0-1) — the measured
    # contrast IS the scale argument for bucket refinement.
    ladder_ops = ["vec_semdedup", "dedup_embedding"]
    stages = {n: _stage_subset(spark, n) for n in
              SEMDEDUP_SUBSETS + [SEMDEDUP_SPARK_ONLY]}
    for opname in ladder_ops:
        sem = specs[opname]
        times = []
        rows = []
        for n in SEMDEDUP_SUBSETS:
            stage = stages[n]
            scon = duck_connect(stage)
            t0 = time.perf_counter()
            sp = sem.builder(spark, stage).toPandas()
            t_spark = round(time.perf_counter() - t0, 2)
            t0 = time.perf_counter()
            du = scon.execute(sem.oracle).fetchdf()
            t_duck = round(time.perf_counter() - t0, 2)
            errs = compare(sp, du, f"{opname}@{n}")
            ok = not errs
            fails += not ok
            times.append((n, t_spark))
            rows.append(
                {"n": n, "ok": ok, "kept": len(sp), "spark_sec": t_spark,
                 "duck_sec": t_duck}
            )
            print(
                f"{opname}@{n}: {'ok' if ok else 'FAIL ' + str(errs[:2])} "
                f"kept={len(sp)} spark={t_spark}s duck={t_duck}s",
                file=sys.stderr,
            )
        t0 = time.perf_counter()
        kept = sem.builder(spark, stages[SEMDEDUP_SPARK_ONLY]).count()
        t_spark = round(time.perf_counter() - t0, 2)
        times.append((SEMDEDUP_SPARK_ONLY, t_spark))
        rows.append(
            {"n": SEMDEDUP_SPARK_ONLY, "ok": None, "kept": kept,
             "spark_sec": t_spark, "duck_sec": None}
        )
        print(
            f"{opname}@{SEMDEDUP_SPARK_ONLY}: spark-only kept={kept} "
            f"{t_spark}s",
            file=sys.stderr,
        )
        # fitted doubling exponent (pair space is n^2/k, so pure pair
        # cost doubles 4x; fixed costs damp it)
        exps = [
            round(math.log(t2 / t1, 2), 2)
            for (n1, t1), (n2, t2) in zip(times, times[1:])
        ]
        out[opname] = {"ladder": rows, "doubling_exponents": exps}
        print(f"{opname} doubling exponents: {exps}", file=sys.stderr)

    print(json.dumps(out))
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
