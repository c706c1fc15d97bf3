#!/usr/bin/env python
"""Regenerate the throughput-bench dataset: N key-shifted copies of the
core tables (events/lineitem/orders/customer) so keys stay unique and
per-key series keep realistic lengths; dims and the text/vector tables
are symlinked unscaled (scaling duplicated texts would manufacture
quadratic near-dup output — see NOTES.md).

Usage: python tools/make_scaled.py [out_dir] [N] [--scale-docs]
Defaults: /tmp/sfbig 16  (matches BASELINE.md's 16x column)

--scale-docs additionally scales documents and embeddings N-fold
(instead of symlinking) WITHOUT manufacturing near-dup artifacts:

- documents: copy i permutes each doc's tokens with an rng seeded by
  md5(text) + i. Byte-identical texts receive the identical
  permutation, so the corpus's exact-duplicate pairs are preserved in
  every copy (dedup output scales linearly), while any two distinct
  texts — including copy_i vs copy_j of the same doc — land in
  uncorrelated orders, so 3-shingle Jaccard across copies is ~0 and
  near-dup candidate counts don't go quadratic. Token permutation
  preserves n_chars (same tokens, same space count) and the unigram
  distribution (lang_id/tfidf stay meaningful).
- embeddings: copy i multiplies every vector elementwise by a ±1
  pattern seeded by i — an isometry, so all pairwise cosines WITHIN a
  copy are bit-preserved (per-copy top-k structure intact), while
  cross-copy cosines collapse toward 0 (no clone families for
  sim_pairs to blow up on).
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

SRC = "/root/testdata/sf0.1"

SCALED = {
    "events": """
        SELECT event_id + i*100000000 AS event_id, ts,
               user_id + i*100000 AS user_id, event_type, value, props
        FROM read_parquet('{src}/events.parquet'), generate_series(0, {n}) t(i)
    """,
    "lineitem": """
        SELECT l_orderkey + i*100000000 AS l_orderkey, l_partkey, l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
               l_returnflag, l_linestatus, l_shipdate
        FROM read_parquet('{src}/lineitem.parquet'), generate_series(0, {n}) t(i)
    """,
    "orders": """
        SELECT o_orderkey + i*100000000 AS o_orderkey,
               o_custkey + i*10000000 AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM read_parquet('{src}/orders.parquet'), generate_series(0, {n}) t(i)
    """,
    "customer": """
        SELECT c_custkey + i*10000000 AS c_custkey, c_name, c_nationkey,
               c_acctbal, c_mktsegment
        FROM read_parquet('{src}/customer.parquet'), generate_series(0, {n}) t(i)
    """,
}

LINKED = ["region", "nation", "supplier", "part", "documents", "embeddings"]


def _scale_documents(out: str, n: int) -> None:
    import hashlib

    import numpy as np
    import pandas as pd

    df = pd.read_parquet(f"{SRC}/documents.parquet")
    copies = []
    for i in range(n):
        c = df.copy()
        c["doc_id"] = c["doc_id"] + i * 1_000_000
        if i > 0:
            texts = []
            for text in df["text"]:
                seed = int.from_bytes(
                    hashlib.md5(text.encode()).digest()[:8], "big"
                ) ^ i
                toks = text.split(" ")
                rng = np.random.default_rng(seed)
                texts.append(" ".join(np.array(toks)[rng.permutation(len(toks))]))
            c["text"] = texts
        copies.append(c)
    pd.concat(copies, ignore_index=True).to_parquet(
        f"{out}/documents.parquet", index=False
    )


def _scale_embeddings(out: str, n: int) -> None:
    import numpy as np
    import pandas as pd

    df = pd.read_parquet(f"{SRC}/embeddings.parquet")
    dim = len(df["embedding"].iloc[0])
    copies = []
    for i in range(n):
        c = df.copy()
        c["vec_id"] = c["vec_id"] + i * 1_000_000
        if i > 0:
            signs = (
                np.random.default_rng(i).integers(0, 2, size=dim) * 2 - 1
            ).astype("float32")
            c["embedding"] = [
                (np.asarray(v, dtype="float32") * signs) for v in df["embedding"]
            ]
        copies.append(c)
    pd.concat(copies, ignore_index=True).to_parquet(
        f"{out}/embeddings.parquet", index=False
    )


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    out = args[0] if args else "/tmp/sfbig"
    n = int(args[1]) if len(args) > 1 else 16
    scale_docs = "--scale-docs" in sys.argv
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    con = duckdb.connect()
    con.execute(f"SET threads={os.cpu_count()}")
    for t, sql in SCALED.items():
        q = sql.format(src=SRC, n=n - 1)
        con.execute(f"COPY ({q}) TO '{out}/{t}.parquet' (FORMAT PARQUET)")
    linked = list(LINKED)
    if scale_docs:
        linked = [t for t in linked if t not in ("documents", "embeddings")]
        _scale_documents(out, n)
        _scale_embeddings(out, n)
    for t in linked:
        os.symlink(f"{SRC}/{t}.parquet", f"{out}/{t}.parquet")
    for t in list(SCALED) + LINKED:
        c = con.execute(
            f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet')"
        ).fetchone()[0]
        print(t, c)


if __name__ == "__main__":
    main()
