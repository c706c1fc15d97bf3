"""Round-6: timestamp extremes through the ns->µs scan conversion.

The fixtures are all 2024-dated, so the sign-sensitive part of the
catalog's TIMESTAMP(NANOS) handling was never exercised: integer
division semantics DIFFER between truncation and floor exactly on
pre-1970 (negative-epoch) values, and a 1 µs divergence there would
silently shift joins/windows for any corpus with historical data.
Differential verdict (pinned here): Spark's ``div`` truncates toward
zero and so does DuckDB's ns->µs narrowing cast (-1500 ns -> -1 µs in
both; floor would give -2), so the catalog conversion is engine-exact
across the epoch. Also covers far-future values near the µs range the
engines share, and a narrowed events file (no `value` column) through
the measure-sanitizing loader.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

pytestmark = pytest.mark.sweep

from pyspark.sql import functions as F

from pandas_tsdb_spark.catalog import Tables

# ns values straddling 1970 (non-µs-aligned negatives are the
# truncation-vs-floor witnesses) plus a far-past and far-future point
# int64 ns spans ~1677-09-21 .. 2262-04-11 — use near-extremes of the
# representable range plus the epoch-straddling truncation witnesses
_NS = [
    -9_200_000_000_000_000_000,  # ~1678
    -123_456_789,
    -1_500,
    -1_001,
    -1_000,
    -999,
    -1,
    0,
    999,
    1_500,
    1_690_000_000_123_456_789,
    9_200_000_000_000_000_001,  # ~2261, non-µs-aligned
]


@pytest.fixture(scope="module")
def extreme_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ts_extremes"))
    t = pa.table(
        {
            "event_id": list(range(len(_NS))),
            "ts": pa.array(_NS, pa.timestamp("ns")),
        }
    )
    pq.write_table(t, os.path.join(d, "events.parquet"))
    return d


def test_ns_to_us_matches_duckdb_across_epoch(spark, extreme_dir):
    import duckdb

    con = duckdb.connect()
    duck = con.execute(
        "SELECT event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us "
        f"FROM read_parquet('{extreme_dir}/events.parquet') "
        "ORDER BY event_id"
    ).fetchall()
    ev = Tables(spark, extreme_dir).events
    sp = (
        ev.select("event_id", F.unix_micros("ts").alias("us"))
        .orderBy("event_id")
        .collect()
    )
    assert [r[1] for r in duck] == [r.us for r in sp]


def test_loader_tolerates_narrowed_schema(spark, extreme_dir):
    """A user file lacking a declared measure column must still load
    (the sanitizer is presence-guarded) — caught by this probe when the
    round-6 specials loop assumed `value` exists."""
    ev = Tables(spark, extreme_dir).events
    assert ev.count() == len(_NS)
    assert "value" not in ev.columns
