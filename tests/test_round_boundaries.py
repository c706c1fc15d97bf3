"""Round-6 sweep #12: decimal-rounding BOUNDARY values.

Spark's round(double, s>0) rounds HALF_UP on the double's shortest
DECIMAL REPRESENTATION; DuckDB rounds by a float algorithm. They
disagree exactly on values like 1.005 (binary 1.00499999999999989...):
Spark 1.01, DuckDB 1.00 — measured at 0.27% of 3-decimal-ish uniform
doubles (1341 of 500k). The fixtures' coarse 2-decimal values dodge the
class entirely, which is why five rounds of driver hashes never saw it.

Engine doctrine established by this sweep (registry.round_emit_col /
oracle_round document the probe table):
- ROUND-TO-INTEGER is engine-aligned on every probed value and 500k
  random samples -> scale-shift + integer round + divide
  (round(x*100)/100) is the cross-engine-stable emit form;
- where the TRUE total can land ON a cents boundary (sums/means over
  dirty >2-decimal data), even that is noise-unstable -> the exact
  integer-cents sum (registry.sum2_col idiom) is the only stable
  shape, now used by the window means and the corr-family inputs;
- windowed corr is computed from exact integer moments
  ((nΣxy−ΣxΣy)/√(nΣxx−Σx²)√(nΣyy−Σy²), NULL on zero variance): the
  engines' native windowed corr diverges past 1e-6 on near-degenerate
  frames and DuckDB's CRASHES on zero-variance ones.

Injection: shortest-repr-half values (1.005, 2.675, 7.115, ...) into
events.value and lineitem.l_extendedprice; differential over every
events/lineitem oracled query. Pre-doctrine: 15 divergent + 1 oracle
crash. Post: zero.
"""

from __future__ import annotations

import glob
import os
import shutil

import pytest

pytestmark = pytest.mark.sweep

from pyspark.sql import functions as F

from pandas_tsdb_spark.registry import load_all

SMALL = "/root/testdata/sf0.001"
SPECS = load_all()

BOUNDARY = [1.005, 2.675, 7.115, 3.345, -1.005, -2.675, 100.005, 8.635]

BOUNDARY_OPS = sorted(
    name
    for name, spec in SPECS.items()
    if spec.oracle is not None
    and ("events" in spec.oracle.lower() or "lineitem" in spec.oracle.lower())
)


@pytest.fixture(scope="module")
def boundary_stage(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("round_boundary")
    stage = str(tmp / "sf")
    os.makedirs(stage)
    ev = spark.read.parquet(f"{SMALL}/events.parquet")
    expr = F.col("value")
    for j, b in enumerate(BOUNDARY):
        expr = F.when(F.col("event_id") % 11 == j, F.lit(b)).otherwise(expr)
    ev = ev.withColumn("value", expr)
    d = str(tmp / "ev")
    ev.coalesce(1).write.parquet(d)
    shutil.copy(glob.glob(f"{d}/part-*.parquet")[0], f"{stage}/events.parquet")
    li = spark.read.parquet(f"{SMALL}/lineitem.parquet")
    key = F.expr("l_orderkey + l_linenumber")
    e2 = F.col("l_extendedprice")
    for j, b in enumerate(BOUNDARY):
        e2 = F.when(key % 11 == j, F.lit(abs(b) * 100)).otherwise(e2)
    li = li.withColumn("l_extendedprice", e2)
    d = str(tmp / "li")
    li.coalesce(1).write.parquet(d)
    shutil.copy(
        glob.glob(f"{d}/part-*.parquet")[0], f"{stage}/lineitem.parquet"
    )
    for table in (
        "region nation customer supplier part orders documents embeddings"
    ).split():
        os.symlink(f"{SMALL}/{table}.parquet", f"{stage}/{table}.parquet")
    return stage


@pytest.mark.parametrize("name", BOUNDARY_OPS)
def test_round_boundary_differential(spark, boundary_stage, name):
    from tests.harness import compare, duck_connect

    spec = SPECS[name]
    con = duck_connect(boundary_stage)
    sp = spec.builder(spark, boundary_stage).toPandas()
    du = con.execute(spec.oracle).fetchdf()
    errs = compare(sp, du, name)
    assert not errs, errs[:5]


def test_round_emit_helper_aligned(spark):
    """The helper's probe table, pinned: aligned form equals DuckDB on
    the canonical divergent values."""
    import duckdb

    from pandas_tsdb_spark.registry import oracle_round, round_emit_col

    vals = [1.005, 2.675, 1.115, 0.125, 0.005, -1.005, 8.635, 2.5551]
    sp = (
        spark.createDataFrame([(v,) for v in vals], "x double")
        .select(round_emit_col("x", 2).alias("r"))
        .toPandas()["r"]
        .tolist()
    )
    du = [
        duckdb.connect()
        .execute(f"SELECT {oracle_round(f'CAST({v!r} AS DOUBLE)', 2)}")
        .fetchone()[0]
        for v in vals
    ]
    assert sp == du
