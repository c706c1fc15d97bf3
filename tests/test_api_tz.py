"""Round-7 verdict item 3: the TIMEZONE/DST contract, differentially
verified against real pandas.

The engine's base contract is UTC-everywhere (session.RUNTIME_CONFS
pins spark.sql.session.timeZone=UTC; naive timestamps ARE UTC
instants). ``TsFrame(tz=...)`` opts the calendar surface into local
wall-clock semantics. These tests drive the exact cases the r6 verdict
named — 23-hour spring-forward days, 25-hour fall-back days, W-MON
anchors, right-labeled month ends — through both engines:

  pandas: tz-aware DatetimeIndex resample; labels normalized with
          .tz_convert("UTC").tz_localize(None)
  spark:  TsFrame(df, tz=...) — naive-UTC instants in, UTC-instant
          bucket labels out

and assert bucket labels AND aggregates identical. America/New_York,
2024: spring forward 2024-03-10 02:00->03:00 (23-hour local day),
fall back 2024-11-03 (25-hour local day).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from pandas_tsdb_spark.api import TsFrame

TZ = "America/New_York"


def _hourly(start: str, end: str):
    idx = pd.date_range(start, end, freq="h", tz="UTC", inclusive="left")
    vals = np.arange(len(idx), dtype="float64")
    return idx, vals


def _pandas_resample(idx, vals, freq):
    s = pd.Series(vals, index=idx.tz_convert(TZ))
    r = s.resample(freq).agg(["count", "sum"])
    r = r[r["count"] > 0]  # the engine emits only non-empty buckets
    labels = r.index.tz_convert("UTC").tz_localize(None)
    return list(zip(labels, r["count"].astype(int), r["sum"]))


def _spark_resample(spark, idx, vals, freq):
    pdf = pd.DataFrame(
        {"ts": idx.tz_convert("UTC").tz_localize(None), "v": vals}
    )
    tf = TsFrame(spark.createDataFrame(pdf), "ts", tz=TZ)
    out = (
        tf.resample(freq)
        .agg(F.count("v").alias("n"), F.sum("v").alias("s"))
        .orderBy("bucket")
        .collect()
    )
    return [(pd.Timestamp(r.bucket), int(r.n), float(r.s)) for r in out]


@pytest.mark.parametrize(
    "start,end,desc",
    [
        ("2024-03-08", "2024-03-13", "spring-forward (23h local day)"),
        ("2024-11-01", "2024-11-06", "fall-back (25h local day)"),
    ],
)
def test_daily_buckets_across_dst(spark, start, end, desc):
    idx, vals = _hourly(start, end)
    want = _pandas_resample(idx, vals, "D")
    got = _spark_resample(spark, idx, vals, "D")
    assert got == want, desc
    # the transition day really is 23/25 hours — the test has teeth
    counts = [n for _, n, _ in want]
    assert 23 in counts or 25 in counts


def test_w_mon_anchor_across_dst(spark):
    idx, vals = _hourly("2024-03-04", "2024-03-18")
    want = _pandas_resample(idx, vals, "W-MON")
    got = _spark_resample(spark, idx, vals, "W-MON")
    assert got == want


def test_month_end_label_across_dst(spark):
    # March 2024 contains the spring-forward; pandas labels the month
    # at local Mar-31 midnight = 2024-03-31 04:00 UTC (EDT by then)
    idx, vals = _hourly("2024-03-01", "2024-04-10")
    want = _pandas_resample(idx, vals, "ME")
    got = _spark_resample(spark, idx, vals, "ME")
    assert got == want
    # (the first UTC hours of Mar-1 are still local Feb-29, so a
    # February bucket precedes it — itself a wall-clock proof)
    assert pd.Timestamp("2024-03-31 04:00:00") in [lab for lab, _, _ in got]


def test_subday_buckets_are_instant_semantics(spark):
    # pandas parity: a tz-aware hourly resample bins by absolute hour —
    # DST neither merges nor splits sub-day buckets, so tz= must be a
    # no-op for them
    idx, vals = _hourly("2024-03-09 20:00", "2024-03-10 12:00")
    want = _pandas_resample(idx, vals, "h")
    got = _spark_resample(spark, idx, vals, "h")
    assert got == want
    # identical to the UTC (tz=None) result
    pdf = pd.DataFrame(
        {"ts": idx.tz_convert("UTC").tz_localize(None), "v": vals}
    )
    tf_utc = TsFrame(spark.createDataFrame(pdf), "ts")
    utc = [
        (pd.Timestamp(r.bucket), int(r.n), float(r.s))
        for r in tf_utc.resample("h")
        .agg(F.count("v").alias("n"), F.sum("v").alias("s"))
        .orderBy("bucket")
        .collect()
    ]
    assert got == utc


def test_keyed_daily_buckets_across_dst(spark):
    idx, vals = _hourly("2024-11-01", "2024-11-06")
    pdf = pd.DataFrame(
        {
            "ts": list(idx.tz_convert("UTC").tz_localize(None)) * 2,
            "k": ["a"] * len(idx) + ["b"] * len(idx),
            "v": list(vals) + list(vals * 10),
        }
    )
    tf = TsFrame(spark.createDataFrame(pdf), "ts", by="k", tz=TZ)
    got = {
        (r.k, pd.Timestamp(r.bucket)): (int(r.n), float(r.s))
        for r in tf.resample("D")
        .agg(F.count("v").alias("n"), F.sum("v").alias("s"))
        .collect()
    }
    for key, mult in (("a", 1), ("b", 10)):
        want = _pandas_resample(idx, vals * mult, "D")
        for label, n, s in want:
            assert got[(key, label)] == (n, s)


def test_tz_fill_paths_refuse(spark):
    idx, vals = _hourly("2024-03-08", "2024-03-10")
    pdf = pd.DataFrame(
        {"ts": idx.tz_convert("UTC").tz_localize(None), "v": vals}
    )
    tf = TsFrame(spark.createDataFrame(pdf), "ts", tz=TZ)
    with pytest.raises(ValueError, match="tz-aware fill"):
        tf.resample("D").ffill("v")
    with pytest.raises(ValueError, match="tz-aware fill"):
        tf.resample("D").asfreq("v")
    with pytest.raises(ValueError, match="calendar frequencies and '1D'"):
        tf.resample("2D")


def test_tz_invariant_surfaces_unchanged(spark):
    # rolling over a time RANGE is duration-based on instants — the tz
    # flag must not change it (pandas behaves identically)
    idx, vals = _hourly("2024-03-09", "2024-03-12")
    pdf = pd.DataFrame(
        {"ts": idx.tz_convert("UTC").tz_localize(None), "v": vals}
    )
    df = spark.createDataFrame(pdf)
    a = (
        TsFrame(df, "ts")
        .rolling(window="6h")
        .sum("v")
        .to_df()
        .orderBy("ts")
        .collect()
    )
    b = (
        TsFrame(df, "ts", tz=TZ)
        .rolling(window="6h")
        .sum("v")
        .to_df()
        .orderBy("ts")
        .collect()
    )
    assert a == b


def test_tz_resample_plan_stays_single_exchange(spark):
    # the wall-clock conversion is two scalar expressions
    # (from_utc_timestamp for bucketing, to_utc_timestamp on the
    # label) — it must not add an exchange or drop to Python
    idx, vals = _hourly("2024-03-08", "2024-03-12")
    pdf = pd.DataFrame(
        {
            "ts": idx.tz_convert("UTC").tz_localize(None),
            "k": ["a", "b"] * (len(idx) // 2),
            "v": vals,
        }
    )
    tf = TsFrame(spark.createDataFrame(pdf), "ts", by="k", tz=TZ)
    plan = (
        tf.resample("D")
        .agg(F.sum("v").alias("s"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# -- hypothesis matrix: random zones x irregular timestamps x freqs ------
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# zones chosen for distinct failure modes: classic US DST, UK (transition
# at 01:00), Lord Howe (30-MINUTE DST shift), Kathmandu (+05:45, no DST),
# and UTC as the identity case. Zones whose transition touches local
# MIDNIGHT (e.g. America/Santiago) are excluded on purpose: pandas itself
# raises NonExistentTimeError on such labels and there is no behavior to
# mirror.
_ZONES = [
    "America/New_York",
    "Europe/London",
    "Australia/Lord_Howe",
    "Asia/Kathmandu",
    "UTC",
]
_FREQS = ["D", "W-MON", "W-SUN", "ME", "QE", "YE"]


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    zone=st.sampled_from(_ZONES),
    freq=st.sampled_from(_FREQS),
    start_day=st.integers(min_value=0, max_value=360),
    step_min=st.integers(min_value=37, max_value=360),
    n=st.integers(min_value=3, max_value=200),
)
def test_tz_resample_fuzz_vs_pandas(spark, zone, freq, start_day, step_min, n):
    """Any zone, any irregular spacing, any calendar freq: bucket labels
    and aggregates must match pandas exactly (labels compared as UTC
    instants). Spacing is prime-ish minutes so timestamps land at odd
    wall times, including inside DST transitions."""
    idx = pd.DatetimeIndex(
        pd.Timestamp("2024-01-01", tz="UTC")
        + pd.to_timedelta(np.arange(n) * step_min + start_day * 1440, "min")
    )
    vals = np.arange(n, dtype="float64")
    s = pd.Series(vals, index=idx.tz_convert(zone))
    r = s.resample(freq).agg(["count", "sum"])
    r = r[r["count"] > 0]
    want = list(
        zip(
            r.index.tz_convert("UTC").tz_localize(None),
            r["count"].astype(int),
            r["sum"],
        )
    )
    pdf = pd.DataFrame(
        {"ts": idx.tz_convert("UTC").tz_localize(None), "v": vals}
    )
    tf = TsFrame(spark.createDataFrame(pdf), "ts", tz=zone)
    got = [
        (pd.Timestamp(row.bucket), int(row.n), float(row.s))
        for row in tf.resample(freq)
        .agg(F.count("v").alias("n"), F.sum("v").alias("s"))
        .orderBy("bucket")
        .collect()
    ]
    assert got == want, (zone, freq, start_day, step_min, n)


def test_tz_resample_last_and_ohlc_across_dst(spark):
    """The edge/ohlc paths share _group()'s bucket, so they must follow
    the same wall-clock days; pandas differential on last()."""
    idx, vals = _hourly("2024-11-01", "2024-11-06")
    s = pd.Series(vals, index=idx.tz_convert(TZ))
    r = s.resample("D").last().dropna()
    want = {
        lab: v
        for lab, v in zip(
            r.index.tz_convert("UTC").tz_localize(None), r.values
        )
    }
    pdf = pd.DataFrame(
        {"ts": idx.tz_convert("UTC").tz_localize(None), "v": vals}
    )
    tf = TsFrame(spark.createDataFrame(pdf), "ts", tz=TZ)
    got = {
        pd.Timestamp(row.bucket): row.v
        for row in tf.resample("D").last("v").collect()
    }
    assert got == want
    # ohlc over the same buckets: open=first hour, close=last hour of
    # each LOCAL day (25 hours on 2024-11-03)
    ohlc = {
        pd.Timestamp(row.bucket): (row.open, row.close)
        for row in tf.resample("D").ohlc("v").collect()
    }
    po = s.resample("D").ohlc().dropna()
    for lab, row in zip(po.index.tz_convert("UTC").tz_localize(None), po.itertuples()):
        assert ohlc[lab] == (row.open, row.close)


def test_dst_staged_ops_bucket_widths(spark):
    """Round-8 driver ops (win_resample_tz_wmon / _month / _dst_day):
    assert the staged DST table's SEMANTIC landmarks directly — the
    23-hour local day is a 46-row bucket on the 30-min grid, the
    25-hour day is 50, the 2024-11-01 00:00Z rows split into an
    OCTOBER month bucket, and the week labels flip EDT(04:00Z) ->
    EST(05:00Z) across fall-back. The registry differential checks
    Spark==DuckDB; this checks both are RIGHT."""
    from pandas_tsdb_spark.registry import load_all

    specs = load_all()
    day = {
        pd.Timestamp(r.bucket): r.n
        for r in specs["win_resample_tz_dst_day"].builder(spark, "").collect()
    }
    assert day[pd.Timestamp("2024-03-10 05:00:00")] == 46  # spring forward
    assert day[pd.Timestamp("2024-11-03 04:00:00")] == 50  # fall back
    assert day[pd.Timestamp("2024-03-09 05:00:00")] == 48  # normal EST day

    mon = specs["win_resample_tz_month"].builder(spark, "").toPandas()
    by_month = mon.groupby("bucket").n.sum()
    assert by_month[pd.Timestamp("2024-10-31 04:00:00")] == 8  # EDT label
    assert by_month[pd.Timestamp("2024-11-30 05:00:00")] == 232  # EST label
    assert by_month[pd.Timestamp("2024-03-31 04:00:00")] == 240

    wk = specs["win_resample_tz_wmon"].builder(spark, "").toPandas()
    labels = set(pd.to_datetime(wk.bucket))
    # Monday labels at local midnight's UTC instant: EDT week vs EST week
    assert pd.Timestamp("2024-03-11 04:00:00") in labels  # EDT Monday
    assert pd.Timestamp("2024-11-04 05:00:00") in labels  # EST Monday


def test_sydney_opposite_direction_dst(spark):
    """Southern hemisphere (round-9 verdict #5): Australia/Sydney's
    April transition is fall-BACK (25-hour local day 2024-04-07) and
    October's spring-FORWARD (23 hours on 2024-10-06) — opposite the
    US direction. Differential vs pandas AND semantic landmarks on the
    staged AU driver op."""
    idx, vals = _hourly("2024-04-05", "2024-04-10")
    s = pd.Series(vals, index=idx.tz_convert("Australia/Sydney"))
    r = s.resample("D").agg(["count", "sum"])
    r = r[r["count"] > 0]
    want = list(
        zip(
            r.index.tz_convert("UTC").tz_localize(None),
            r["count"].astype(int),
            r["sum"],
        )
    )
    pdf = pd.DataFrame({"ts": idx.tz_convert("UTC").tz_localize(None), "v": vals})
    tf = TsFrame(spark.createDataFrame(pdf), "ts", tz="Australia/Sydney")
    got = [
        (pd.Timestamp(r2.bucket), int(r2.n), float(r2.s))
        for r2 in tf.resample("D")
        .agg(F.count("v").alias("n"), F.sum("v").alias("s"))
        .orderBy("bucket")
        .collect()
    ]
    assert got == want
    assert 25 in [n for _, n, _ in want]  # April IS the fall-back

    from pandas_tsdb_spark.registry import load_all

    specs = load_all()
    day = {
        pd.Timestamp(r3.bucket): r3.n
        for r3 in specs["win_resample_tz_sydney"].builder(spark, "").collect()
    }
    # local 2024-04-07 starts at 2024-04-06 13:00 UTC (AEDT, +11) and
    # is 25 h wide = 50 rows on the 30-min grid; local 2024-10-06
    # starts at 2024-10-05 14:00 UTC (AEST, +10) and is 23 h = 46 rows
    assert day[pd.Timestamp("2024-04-06 13:00:00")] == 50
    assert day[pd.Timestamp("2024-10-05 14:00:00")] == 46
    # label offsets flip the OPPOSITE way to the US: +11 before April's
    # transition, +10 after
    assert day[pd.Timestamp("2024-04-07 14:00:00")] == 48  # AEST day


def test_quarter_year_anchors_under_tz(spark):
    """Q/Y anchors under tz (round-9 verdict #5), differential vs
    pandas plus the staged-op landmarks: Q1 labels 2024-03-31 00:00
    EDT = 04:00Z, Q4 labels 2024-12-31 00:00 EST = 05:00Z, and the
    2024-11-01 00:00Z rows (local Oct 31) land in Q4."""
    idx, vals = _hourly("2024-03-01", "2024-04-10")
    for freq in ("QE", "YE"):
        want = _pandas_resample(idx, vals, freq)
        got = _spark_resample(spark, idx, vals, freq)
        assert got == want, freq

    from pandas_tsdb_spark.registry import load_all

    specs = load_all()
    q4 = specs["win_resample_tz_quarter"].builder(spark, "").toPandas()
    by_q = q4.groupby("bucket").n.sum()
    assert by_q[pd.Timestamp("2024-03-31 04:00:00")] == 240  # Q1, EDT label
    assert by_q[pd.Timestamp("2024-12-31 05:00:00")] == 240  # Q4, EST label
    yr = specs["win_resample_tz_year"].builder(spark, "").toPandas()
    assert list(pd.to_datetime(yr.bucket)) == [pd.Timestamp("2024-12-31 05:00:00")]
    assert int(yr.n.iloc[0]) == 480
