"""Round-6 sweep #9: DUPLICATE TIMESTAMPS in the events series.

The fixture generator emits strictly monotone event timestamps per
series (FIXTURES.md), so five rounds of driver hashes never exercised
ties — but real telemetry ties constantly (batched ingestion, clock
granularity, concurrent writers). Every ordering-sensitive operator
(as-of joins, resample first/last/OHLC, ranks, lead/lag) must stay
DETERMINISTIC and engine-agreed when ORDER BY ts alone no longer
defines a total order.

Injection: every 3rd event snaps its ts to the containing DAY, every
5th to the containing HOUR — dense intra-(user), intra-(user,type) and
cross-series ties at several granularities, values left distinct so a
wrong row choice changes emitted values, not just ordering.

The registry's own defense is the tie-break discipline: ordering keys
include event_id (unique) wherever a window or arg-extreme could tie.
This sweep proved it held everywhere except join_asof_directions'
oracle, whose independent "nearest" lookup could pick a different row
than its own backward arm on a duplicate purchase ts (fixed: nearest is
now derived from the backward/forward arms — same row, backward on
distance ties).
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

_DAY_US = 86_400_000_000
_HOUR_US = 3_600_000_000

# Every oracled query reading events (computed from the registry so new
# queries are swept automatically).
TIE_OPS = sorted(
    name
    for name, spec in SPECS.items()
    if spec.oracle is not None and "events" in spec.oracle.lower()
)


@pytest.fixture(scope="module")
def tied_stage(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("dup_ts")
    stage = str(tmp / "sf")
    os.makedirs(stage)
    ev = spark.read.parquet(f"{SMALL}/events.parquet")
    ty = (
        "timestamp_ntz"
        if "ntz" in str(ev.schema["ts"].dataType).lower()
        else "timestamp"
    )

    def snap(unit_us: int) -> str:
        return (
            f"cast(timestamp_micros((unix_micros(cast(ts as timestamp))"
            f" div {unit_us}) * {unit_us}) as {ty})"
        )

    tied = ev.withColumn(
        "ts",
        F.when(F.col("event_id") % 3 == 0, F.expr(snap(_DAY_US)))
        .when(F.col("event_id") % 5 == 0, F.expr(snap(_HOUR_US)))
        .otherwise(F.col("ts")),
    )
    d = str(tmp / "tied")
    tied.coalesce(1).write.parquet(d)
    shutil.copy(glob.glob(f"{d}/part-*.parquet")[0], f"{stage}/events.parquet")
    for table in (
        "region nation customer supplier part orders lineitem "
        "documents embeddings"
    ).split():
        os.symlink(f"{SMALL}/{table}.parquet", f"{stage}/{table}.parquet")
    return stage


def test_fixture_actually_ties(spark, tied_stage):
    """Guard the guard: the staged fixture must contain real ties, or
    the whole sweep is vacuous."""
    from pandas_tsdb_spark.catalog import Tables

    ev = Tables(spark, tied_stage).events
    per_user = (
        ev.groupBy("user_id", "ts").count().filter("count > 1").count()
    )
    assert per_user >= 10


@pytest.mark.parametrize("name", TIE_OPS)
def test_duplicate_ts_differential(spark, tied_stage, name):
    from tests.harness import compare, duck_connect

    spec = SPECS[name]
    con = duck_connect(tied_stage)
    sp = spec.builder(spark, tied_stage).toPandas()
    du = con.execute(spec.oracle).fetchdf()
    errs = compare(sp, du, name)
    assert not errs, errs[:5]
