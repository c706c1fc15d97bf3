#!/usr/bin/env python
"""Build COMPLETE scaled fixtures (every headline table scaled, nothing
symlinked to a smaller SF) for the full-headline 256x / 1024x passes —
the round-5 verdict item: BASELINE.md needs a per-query 1024x row with
its matching 256x column, so BOTH fixtures must scale documents,
embeddings, AND the core tables.

Spark does the heavy unions (duckdb's COPY of 1024x lineitem peaked at
93 GB RSS in round 3 — Spark streams it in task-sized chunks instead),
and the text/vector scaling runs as Arrow-batched mapInPandas kernels
on all cores rather than a single-threaded pandas loop:

- events/lineitem/orders/customer: N key-shifted copies of sf0.1 (same
  shift arithmetic as tools/make_scaled.py, so per-key series lengths
  and join selectivities are preserved).
- documents: copy i permutes each doc's tokens with an rng seeded by
  md5(text) ^ i (identical texts -> identical permutation, so exact-dup
  structure scales linearly; distinct texts land in uncorrelated orders
  so 3-shingle Jaccard across copies is ~0 — no manufactured near-dups).
- embeddings: copy i flips signs elementwise by a copy-seeded +-1
  pattern — an isometry (within-copy cosines bit-preserved), cross-copy
  cosines collapse toward 0.

Usage: python tools/make_scaled_full.py <out_dir> <N>
e.g.   python tools/make_scaled_full.py /tmp/sf256full 256
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
LINKED = ["region", "nation", "supplier", "part"]


def main() -> None:
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from pandas_tsdb_spark.session import get_spark

    out = sys.argv[1]
    n = int(sys.argv[2])
    spark = get_spark("make-scaled-full")
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)

    copies = spark.range(n).withColumnRenamed("id", "i")

    def shifted(table: str, shifts: dict[str, int]):
        df = spark.read.parquet(f"{SRC}/{table}.parquet")
        j = df.crossJoin(F.broadcast(copies))
        exprs = [
            (F.col(c) + F.col("i") * F.lit(s)).alias(c)
            if s
            else F.col(c)
            for c, s in ((c, shifts.get(c, 0)) for c in df.columns)
        ]
        return j.select(*exprs)

    core = {
        "events": {"event_id": 100_000_000, "user_id": 100_000},
        "lineitem": {"l_orderkey": 100_000_000},
        "orders": {"o_orderkey": 100_000_000, "o_custkey": 10_000_000},
        "customer": {"c_custkey": 10_000_000},
    }
    for t, shifts in core.items():
        shifted(t, shifts).write.mode("overwrite").parquet(
            f"{out}/{t}.parquet"
        )
        print(t, "done", flush=True)

    # documents: deterministic per-(text, copy) token permutation
    docs = (
        spark.read.parquet(f"{SRC}/documents.parquet")
        .crossJoin(F.broadcast(copies))
        .repartition(4 * int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    )
    doc_cols = [
        c for c in spark.read.parquet(f"{SRC}/documents.parquet").columns
    ]

    def permute(batches):
        import hashlib

        for pdf in batches:
            texts = []
            for text, i in zip(pdf["text"], pdf["i"]):
                i = int(i)
                if i == 0:
                    texts.append(text)
                    continue
                seed = (
                    int.from_bytes(hashlib.md5(text.encode()).digest()[:8], "big")
                    ^ i
                )
                toks = np.array(text.split(" "))
                rng = np.random.default_rng(seed)
                texts.append(" ".join(toks[rng.permutation(len(toks))]))
            res = pdf[doc_cols].copy()
            res["doc_id"] = pdf["doc_id"] + pdf["i"] * 1_000_000
            res["text"] = texts
            yield res

    schema = spark.read.parquet(f"{SRC}/documents.parquet").schema
    docs.mapInPandas(permute, schema).write.mode("overwrite").parquet(
        f"{out}/documents.parquet"
    )
    print("documents done", flush=True)

    emb_src = spark.read.parquet(f"{SRC}/embeddings.parquet")
    dim = len(emb_src.select("embedding").first()[0])
    emb_cols = emb_src.columns

    def signflip(batches):
        sign_cache: dict[int, np.ndarray] = {}
        for pdf in batches:
            embs = []
            for v, i in zip(pdf["embedding"], pdf["i"]):
                i = int(i)
                if i == 0:
                    embs.append(v)
                    continue
                if i not in sign_cache:
                    sign_cache[i] = (
                        np.random.default_rng(i).integers(0, 2, size=dim) * 2 - 1
                    ).astype("float32")
                embs.append(np.asarray(v, dtype="float32") * sign_cache[i])
            res = pdf[emb_cols].copy()
            res["vec_id"] = pdf["vec_id"] + pdf["i"] * 1_000_000
            res["embedding"] = embs
            yield res

    (
        emb_src.crossJoin(F.broadcast(copies))
        .repartition(4 * int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
        .mapInPandas(signflip, emb_src.schema)
        .write.mode("overwrite")
        .parquet(f"{out}/embeddings.parquet")
    )
    print("embeddings done", flush=True)

    for t in LINKED:
        os.symlink(f"{SRC}/{t}.parquet", f"{out}/{t}.parquet")
    for t in list(core) + ["documents", "embeddings"] + LINKED:
        print(t, spark.read.parquet(f"{out}/{t}.parquet").count(), flush=True)


if __name__ == "__main__":
    main()
