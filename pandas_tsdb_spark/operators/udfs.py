"""§2.11 UDF/UDAF/UDTF surface (the parts not already covered by
udf_scalar in timeseries.py and join_asof_cogroup's cogroup kernel).

Discipline: UDFs are the slow path — each op here exists to prove the
API surface with an oracle, and each docstring names the built-in
formulation that should be preferred when semantics allow. All Python
kernels are Arrow-batched (pandas_udf / applyInPandas / arrow-enabled
UDTF), never row-at-a-time pickling, and every kernel is a closure so
cloudpickle ships it by value (executors don't import this repo).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pandas_tsdb_spark.catalog import Tables
from pandas_tsdb_spark.registry import query


@query(
    "udaf_grouped",
    oracle="""
    SELECT user_id, count(*) AS n,
           round(quantile_cont(value, 0.5), 6) AS med,
           round(quantile_cont(value, 0.75) - quantile_cont(value, 0.25), 6)
               AS iqr
    FROM events GROUP BY user_id
    """,
)
def udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom per-group reduce via applyInPandas: per-user median + IQR.

    pandas' linear-interpolation quantile == DuckDB quantile_cont, so
    even the Arrow-kernel path is oracle-checked exactly. On a cluster
    prefer the built-ins (`median`, `percentile`) — this op is the
    escape hatch for reductions Spark lacks; its shuffle profile is the
    same single hash partition by key as a native groupBy."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["value"]
        q1, med, q3 = v.quantile([0.25, 0.5, 0.75])
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "n": [len(v)],
                "med": [round(med, 6)],
                "iqr": [round(q3 - q1, 6)],
            }
        )

    ev = Tables(spark, sf_dir).events
    return ev.groupBy("user_id").applyInPandas(
        kernel, "user_id long, n long, med double, iqr double"
    )


@query(
    "udtf_table",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks
               FROM documents)
    SELECT doc_id, CAST(i - 1 AS INT) AS pos, toks[i] AS tok
    FROM t, LATERAL (SELECT unnest(generate_series(1, len(toks))) AS i)
    """,
)
def udtf_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-generating op, idiomatic form: posexplode (JVM-side, no
    Python worker). One row per (doc, position, token)."""
    d = Tables(spark, sf_dir).documents
    return d.select(
        "doc_id",
        F.posexplode(F.split(F.lower("text"), " ")).alias("pos", "tok"),
    )


@query(
    "udtf_python",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks
               FROM documents)
    SELECT doc_id, CAST(i - 1 AS INT) AS pos,
           concat_ws(' ', toks[i], toks[i + 1]) AS bigram
    FROM t, LATERAL (SELECT unnest(generate_series(1, len(toks) - 1)) AS i)
    """,
)
def udtf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Genuine Python UDTF (Spark ≥3.5 `@udtf`): token bigrams per doc.

    Exists to prove the real UDTF surface; the posexplode/transform
    formulation in `udtf_table` is the production path (UDTF eval is
    per-row Python). Oracle mirrors the expansion with generate_series,
    so the UDTF wire format itself is correctness-checked."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, bigram string")
    class Bigrams:
        def eval(self, text: str):
            if text is None:  # null text emits no bigrams (oracle:
                return        # generate_series over NULL is empty)
            toks = text.lower().split(" ")
            for i in range(len(toks) - 1):
                yield i, f"{toks[i]} {toks[i + 1]}"

    d = Tables(spark, sf_dir).documents
    return d.lateralJoin(Bigrams(F.col("text").outer())).select(
        "doc_id", "pos", "bigram"
    )
