"""Round-6 sweep #8: IEEE specials (NaN / +Inf / -Inf) in measure columns.

A distinct risk class from the null sweeps: a scraped or exported corpus
serves NaN and ±Inf in double columns, and left raw they are job-killers
under ANSI — the cents-integer aggregation trick (round(v*100) CAST
BIGINT, the engine's float-order-independence device) throws
CAST_OVERFLOW on the FIRST special it meets. The pre-contract probe
measured 48 of 96 swept queries crashing or diverging on a 3-prime
injection; DuckDB itself dies on Inf inside stddev/corr, so
"IEEE propagation parity" is not even an oracle-testable contract.

The engine's contract (catalog._MEASURE_DOUBLES + sanitize_special):
specials in measure doubles are ingest noise, normalized to SQL NULL
(= missing) at the scan layer — batch catalog AND streaming source.
This is the pandas reference model (NaN IS the missing marker there)
and it makes three rounds of null-hardening cover specials for free.

The differential: Spark reads the special-injected files through its
normalizing scan; DuckDB reads views applying the same normalization
(duck_connect(sanitize_specials=True)). Equality proves the
normalization reaches every query — a query reading the raw column
through some side path (a raw spark.read, a streaming source, a store
write) shows up as a crash or a value mismatch here.
"""

from __future__ import annotations

import glob
import math
import os
import shutil

import pytest

pytestmark = pytest.mark.sweep

from pyspark.sql import functions as F

from pandas_tsdb_spark.catalog import _MEASURE_DOUBLES
from pandas_tsdb_spark.registry import load_all

SMALL = "/root/testdata/sf0.001"
SPECS = load_all()

# (table, column) -> (nan_prime, inf_prime, neginf_prime); distinct
# primes per column so dirt patterns don't correlate across columns.
_INJECT: dict[str, list[tuple[str, int, int, int]]] = {
    "events": [("value", 7, 11, 13)],
    "lineitem": [
        ("l_quantity", 7, 11, 13),
        ("l_extendedprice", 17, 19, 23),
        ("l_discount", 29, 31, 37),
    ],
    "orders": [("o_totalprice", 7, 11, 13)],
    "customer": [("c_acctbal", 7, 11, 13)],
    "supplier": [("s_acctbal", 5, 7, 11)],
    "part": [("p_retailprice", 7, 11, 13)],
}

_ROW_KEY = {
    "events": "event_id",
    "lineitem": "l_orderkey + l_linenumber",
    "orders": "o_orderkey",
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
}

# Every oracled query whose oracle reads an injected table (computed
# from the registry so new queries are swept automatically).
_TABLES = set(_INJECT)
SPECIAL_OPS = sorted(
    name
    for name, spec in SPECS.items()
    if spec.oracle is not None
    and any(t in spec.oracle.lower() for t in _TABLES)
)


@pytest.fixture(scope="module")
def special_stage(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("ieee_specials")
    stage = str(tmp / "sf")
    os.makedirs(stage)
    for table, cols in _INJECT.items():
        df = spark.read.parquet(f"{SMALL}/{table}.parquet")
        key = F.expr(_ROW_KEY[table])
        for col, p_nan, p_inf, p_ninf in cols:
            df = df.withColumn(
                col,
                F.when(key % p_nan == 0, F.lit(float("nan")))
                .when(key % p_inf == 0, F.lit(float("inf")))
                .when(key % p_ninf == 0, F.lit(float("-inf")))
                .otherwise(F.col(col)),
            )
        d = str(tmp / f"dirty_{table}")
        df.coalesce(1).write.parquet(d)
        shutil.copy(
            glob.glob(f"{d}/part-*.parquet")[0], f"{stage}/{table}.parquet"
        )
    for table in ("region", "nation", "documents", "embeddings"):
        os.symlink(f"{SMALL}/{table}.parquet", f"{stage}/{table}.parquet")
    return stage


# Rows-only (✗-oracle) ops whose builders read an injected table:
# crash-check only (their approximate outputs carry in-band guards).
ROWS_ONLY_OPS = sorted(
    name
    for name, spec in SPECS.items()
    if spec.oracle is None
    and any(
        t in __import__("inspect").getsource(spec.builder).lower()
        for t in _TABLES
    )
)


@pytest.mark.parametrize("name", ROWS_ONLY_OPS)
def test_ieee_specials_run_only(spark, special_stage, name):
    assert SPECS[name].builder(spark, special_stage).count() >= 0


@pytest.mark.parametrize("name", SPECIAL_OPS)
def test_ieee_specials_differential(spark, special_stage, name):
    from tests.harness import compare, duck_connect

    spec = SPECS[name]
    con = duck_connect(special_stage, sanitize_specials=True)
    sp = spec.builder(spark, special_stage).toPandas()
    du = con.execute(spec.oracle).fetchdf()
    errs = compare(sp, du, name)
    assert not errs, errs[:5]


def test_sanitize_preserves_ordinary_values(spark):
    """The normalization is identity on finite doubles and on NULL."""
    from pandas_tsdb_spark.catalog import sanitize_special

    df = spark.createDataFrame(
        [(0.0,), (-1.5,), (1e308,), (None,), (float("nan"),),
         (float("inf"),), (float("-inf"),)],
        "v double",
    ).select(sanitize_special("v").alias("v"))
    got = [r.v for r in df.collect()]
    assert got[:3] == [0.0, -1.5, 1e308]
    assert got[3:] == [None, None, None, None]


def test_stream_source_sanitizes(spark, tmp_path):
    """The streaming source applies the same contract: a NaN in
    events.value arriving through readStream must reach stateful
    operators as missing, not poison the running state."""
    from pandas_tsdb_spark.operators.streaming import (
        events_stream,
        run_to_memory,
    )

    ev = spark.read.parquet(f"{SMALL}/events.parquet").limit(64)
    dirty = ev.withColumn(
        "value",
        F.when(F.col("event_id") % 5 == 0, F.lit(float("nan")))
        .when(F.col("event_id") % 7 == 0, F.lit(float("inf")))
        .otherwise(F.col("value")),
    )
    d = str(tmp_path / "dirty_stream")
    dirty.coalesce(1).write.parquet(d)
    out = run_to_memory(
        events_stream(spark, SMALL, src_dir=d)
        .groupBy("event_type")
        .agg(F.sum("value").alias("s")),
        "complete",
        "specials",
    ).toPandas()
    assert len(out) > 0
    assert all(math.isfinite(v) for v in out["s"] if v is not None)
