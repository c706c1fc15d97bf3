"""Round-7 sweep #14: NON-UTC SESSION TIMEZONE perturbation.

The engine's documented contract (TsFrame docstring, MIGRATION.md) is
UTC-everywhere: every oracle compares against naive/UTC DuckDB, and
``ensure_conf`` — called by every builder through Tables — must rescue
a driver-owned session whose ``spark.sql.session.timeZone`` is NOT
UTC. A user in Tokyo running the engine on a default session is the
normal case, not an edge case; any calendar-bucket builder that reads
the session zone instead of the pinned one would shift every
date_trunc/to_date/dayofweek by hours and stay green on a UTC-only CI
forever.

The sweep perturbs the session to extreme zones BETWEEN builder runs
(ensure_conf re-pins on the next call) and replays the most
date-sensitive oracled queries. It must hold for every zone including
one with a :30 offset and one across the date line.
"""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.sweep

from pandas_tsdb_spark.registry import load_all

SPECS = load_all()
SF = "/root/testdata/sf0.01"

# the queries where a leaked session zone shifts answers: calendar
# bucketing, date part extraction, time-range filters, time-of-day,
# as-of tolerance windows, resample anchors, day partitioned writes
DATE_SENSITIVE = [
    "fn_date",
    "filter_time_range",
    "filter_time_of_day",
    "win_resample",
    "win_resample_month",
    "win_resample_wmon",
    "win_resample_hour",
    "win_resample_ohlc",
    "win_rolling_time",
    "join_asof",
    "sink_partition_prune",
    "agg_groupby",
]

ZONES = ["Asia/Tokyo", "America/Los_Angeles", "Asia/Kathmandu", "Pacific/Kiritimati"]


@pytest.mark.parametrize("zone", ZONES)
@pytest.mark.parametrize("name", DATE_SENSITIVE)
def test_non_utc_session_zone_is_rescued(spark, zone, name):
    from tests.harness import compare, duck_connect

    spec = SPECS[name]
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", zone)
    try:
        # the builder itself must re-pin UTC (ensure_conf via Tables)
        sp = spec.builder(spark, SF).toPandas()
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC", (
            "builder did not rescue the session timezone"
        )
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    con = duck_connect(SF)
    du = con.execute(spec.oracle).fetchdf()
    errs = compare(sp, du, name)
    assert not errs, (zone, errs[:5])
