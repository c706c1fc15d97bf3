"""TsFrame fluent API vs pandas — the reference's surface, verified
method-by-method against real pandas on the events fixture (sf0.001,
1k rows). Every comparison sorts on event_id and NaN-safe-compares."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from pandas_tsdb_spark.api import TsFrame
from pandas_tsdb_spark.catalog import Tables

SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def ev(spark):
    return Tables(spark, SMALL).events.select(
        "event_id", "ts", "user_id", "event_type", "value"
    )


@pytest.fixture(scope="module")
def pev(ev):
    return ev.toPandas().sort_values("event_id").reset_index(drop=True)


def tsf(ev):
    return TsFrame(ev, ts_col="ts", by="user_id", order_col="event_id")


def _sorted(df):
    return df.sort_values("event_id").reset_index(drop=True)


def _eq(a: pd.Series, b: pd.Series, tol=1e-9):
    a = a.astype(float).to_numpy()
    b = b.astype(float).to_numpy()
    both_nan = np.isnan(a) & np.isnan(b)
    close = np.isclose(a, b, rtol=tol, atol=tol, equal_nan=False)
    return bool((both_nan | close).all())


def _pandas_per_user(pev, fn):
    out = pev.sort_values(["user_id", "ts", "event_id"]).copy()
    res = fn(out.groupby("user_id"))
    if isinstance(res.index, pd.MultiIndex):
        res = res.reset_index(level=0, drop=True)
    out["want"] = res
    return _sorted(out)


def test_shift_diff_pct(ev, pev):
    got = _sorted(
        tsf(ev).shift("value").diff("value").pct_change("value").to_pandas()
    )
    want = _pandas_per_user(pev, lambda g: g["value"].shift(1))
    assert _eq(got.value_shift, want.want)
    want = _pandas_per_user(pev, lambda g: g["value"].diff(1))
    assert _eq(got.value_diff, want.want)
    want = _pandas_per_user(pev, lambda g: g["value"].pct_change(fill_method=None))
    assert _eq(got.value_pct, want.want)


def test_cumsum_cummax(ev, pev):
    got = _sorted(tsf(ev).cumsum("value").cummax("value").to_pandas())
    want = _pandas_per_user(pev, lambda g: g["value"].cumsum())
    assert _eq(got.value_cumsum, want.want, tol=1e-6)
    want = _pandas_per_user(pev, lambda g: g["value"].cummax())
    assert _eq(got.value_cummax, want.want)


def test_rolling_count_window(ev, pev):
    got = _sorted(tsf(ev).rolling(5).mean("value").to_pandas())
    want = _pandas_per_user(pev, lambda g: g["value"].rolling(5).mean())
    assert _eq(got.value_mean, want.want, tol=1e-6)
    got = _sorted(tsf(ev).rolling(5, min_periods=2).std("value").to_pandas())
    want = _pandas_per_user(
        pev, lambda g: g["value"].rolling(5, min_periods=2).std()
    )
    assert _eq(got.value_std, want.want, tol=1e-6)


def test_rolling_median_api(ev, pev):
    got = _sorted(tsf(ev).rolling(4).median("value").to_pandas())
    want = _pandas_per_user(pev, lambda g: g["value"].rolling(4).median())
    assert _eq(got.value_median, want.want)


def test_rolling_time_window(ev, pev):
    got = _sorted(tsf(ev).rolling("3d").sum("value").to_pandas())

    def fn(g):
        return (
            g.apply(
                lambda d: d.set_index("ts")["value"].rolling("3D").sum()
            ).reset_index(level=0, drop=True)
        ).to_numpy()

    out = pev.sort_values(["user_id", "ts", "event_id"]).copy()
    rolled = (
        out.set_index("ts").groupby("user_id")["value"].rolling("3D").sum()
    )
    out["want"] = rolled.reset_index(level=0, drop=True).to_numpy()
    want = _sorted(out)
    assert _eq(got.value_sum, want.want, tol=1e-6)


def test_expanding(ev, pev):
    got = _sorted(tsf(ev).expanding().max("value").to_pandas())
    want = _pandas_per_user(pev, lambda g: g["value"].expanding().max())
    assert _eq(got.value_max, want.want)


def test_ewm(ev, pev):
    got = _sorted(tsf(ev).ewm(alpha=0.3).mean("value").to_pandas())
    want = _pandas_per_user(
        pev, lambda g: g["value"].ewm(alpha=0.3, adjust=True).mean()
    )
    assert _eq(got.value_ewm, want.want, tol=1e-9)


def test_zscore(ev, pev):
    got = _sorted(tsf(ev).zscore("value").to_pandas())
    out = pev.copy()
    out["want"] = out.groupby("user_id")["value"].transform(
        lambda s: (s - s.mean()) / s.std()
    )
    assert _eq(got.value_z, _sorted(out).want, tol=1e-6)


def test_between_and_between_time(ev, pev):
    got = (
        tsf(ev)
        .between("2024-01-05", "2024-01-10 23:59:59")
        .to_df()
        .count()
    )
    lo, hi = pd.Timestamp("2024-01-05"), pd.Timestamp("2024-01-10 23:59:59")
    assert got == ((pev.ts >= lo) & (pev.ts <= hi)).sum()

    got = tsf(ev).between_time("09:30", "16:00").to_pandas()
    mod = pev.ts.dt.hour * 60 + pev.ts.dt.minute
    assert len(got) == ((mod >= 570) & (mod <= 960)).sum()


def test_resample_mean_and_nonunit_bucket(ev, pev):
    got = TsFrame(ev, by=None).resample("1d").mean("value").toPandas()
    want = pev.set_index("ts")["value"].resample("1D").mean().dropna()
    got = got.sort_values("bucket").reset_index(drop=True)
    assert len(got) == len(want)
    assert _eq(got.value_mean, want.reset_index(drop=True), tol=1e-6)

    got6 = TsFrame(ev, by=None).resample("6h").count().toPandas()
    want6 = pev.set_index("ts")["value"].resample("6h").count()
    want6 = want6[want6 > 0]
    assert len(got6) == len(want6)
    assert sorted(got6.n) == sorted(want6.to_numpy())


def test_resample_ohlc(ev, pev):
    got = (
        TsFrame(ev, by=None, order_col="event_id")
        .resample("1d")
        .ohlc("value")
        .toPandas()
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    want = (
        pev.sort_values("event_id").set_index("ts")["value"].resample("1D").ohlc()
    )
    for c in ["open", "high", "low", "close"]:
        assert _eq(got[c], want[c].reset_index(drop=True))


def test_resample_ffill(ev, pev):
    got = (
        TsFrame(ev, by="user_id", order_col="event_id")
        .resample("1d")
        .ffill("value")
        .toPandas()
    )
    # grid is dense per user over that user's own day range (pandas
    # reindexes per group — fuzz matrix 6 caught the old global grid)
    span = (
        pev.assign(day=pev.ts.dt.floor("D"))
        .groupby("user_id")["day"]
        .agg(lambda d: (d.max() - d.min()).days + 1)
    )
    assert len(got) == int(span.sum())
    per_user = got.groupby("user_id").bucket.nunique()
    assert (per_user == span.reindex(per_user.index)).all()
    # spot-check one user against pandas resample().last().ffill()
    uid = int(pev.user_id.iloc[0])
    g = got[got.user_id == uid].sort_values("bucket")
    p = (
        pev[pev.user_id == uid]
        .sort_values("event_id")
        .set_index("ts")["value"]
        .resample("1D")
        .last()
        .reindex(g.bucket, method="ffill")
    )
    lhs, rhs = g.value.to_numpy(), p.to_numpy()
    mask = ~np.isnan(rhs)
    assert ((lhs[mask] == rhs[mask])).all()


@pytest.mark.parametrize("method", ["linear", "pad"])
def test_resampler_interpolate_vs_pandas(spark, ev, pev, method):
    """resample('1d').interpolate(method) — grid densify + fill; pandas
    twin per user: resample('1D').last().interpolate()/ffill(). Grid
    spans the global range, so compare from each user's first bucket."""
    got = (
        tsf(ev).resample("1d").interpolate("value", method=method).toPandas()
    )
    uid = int(pev.user_id.iloc[0])
    g = got[got.user_id == uid].sort_values("bucket")
    ser = (
        pev[pev.user_id == uid]
        .sort_values(["ts", "event_id"])
        .set_index("ts")["value"]
        .resample("1D")
        .last()
    )
    p = ser.interpolate("linear") if method == "linear" else ser.ffill()
    p = p.reindex(g.bucket)
    lhs, rhs = g.value.to_numpy(), p.to_numpy()
    mask = ~np.isnan(rhs)
    assert mask.sum() > 0
    assert np.allclose(lhs[mask], rhs[mask], rtol=1e-9)
    # leading grid buckets before the user's first day stay null
    assert np.isnan(lhs[~mask]).all()


@pytest.mark.parametrize(
    "spark_freq,pd_freq",
    [("W", "W"), ("W-MON", "W-MON"), ("W-THU", "W-THU"),
     ("M", "ME"), ("Q", "QE"), ("Y", "YE"), ("B", "B")],
)
def test_resample_calendar_vs_pandas(spark, ev, pev, spark_freq, pd_freq):
    """Calendar/anchored frequencies: label parity with pandas resample
    defaults (right-labeled period ends for W/M/Q/Y, left-labeled
    business day for B). pandas emits empty bins; groupBy only emits
    populated ones — compare on the populated set."""
    got = (
        TsFrame(ev, by=None)
        .resample(spark_freq)
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("tot"))
        .toPandas()
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    want = (
        pev.set_index("ts")["value"]
        .resample(pd_freq)
        .agg(["count", "sum"])
        .query("count > 0")
        .reset_index()
    )
    assert (got["bucket"].to_numpy() == want["ts"].to_numpy()).all(), spark_freq
    assert (got["n"].to_numpy() == want["count"].to_numpy()).all()
    assert _eq(got["tot"], want["sum"].round(6), tol=1e-6)


def test_resample_calendar_edges(spark):
    """The sharp edges: intraday times ON the label day stay in the
    period (pandas adjusts calendar bin edges to end-of-day), weekends
    roll back to Friday for 'B', and month/quarter boundaries label at
    the period END."""
    stamps = [
        "2024-01-31 12:00:00",  # intraday on month end -> Jan bucket
        "2024-02-01 00:00:00",
        "2024-03-31 23:59:00",  # intraday on quarter end Sunday
        "2024-01-01 00:00:00",  # Monday midnight -> its own W-MON label
        "2024-01-06 13:00:00",  # Saturday
        "2024-01-07 09:00:00",  # Sunday intraday -> that week's W label
        "2024-01-08 00:00:00",
    ]
    pdf = pd.DataFrame(
        {"ts": pd.to_datetime(stamps, format="mixed"), "value": range(7)}
    )
    sdf = spark.createDataFrame(pdf)
    for spark_freq, pd_freq in [
        ("M", "ME"), ("W", "W"), ("W-MON", "W-MON"), ("Q", "QE"), ("B", "B")
    ]:
        got = (
            TsFrame(sdf, by=None)
            .resample(spark_freq)
            .count()
            .toPandas()
            .sort_values("bucket")
            .reset_index(drop=True)
        )
        want = (
            pdf.set_index("ts")["value"]
            .resample(pd_freq)
            .count()
            .loc[lambda s: s > 0]
            .reset_index()
        )
        assert (
            got["bucket"].to_numpy() == want["ts"].to_numpy()
        ).all(), spark_freq
        assert (got["n"].to_numpy() == want["value"].to_numpy()).all(), spark_freq


def test_resample_calendar_rejects_multiples():
    with pytest.raises(ValueError):
        from pandas_tsdb_spark.api import _calendar_bucket

        _calendar_bucket("3M", "ts")


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
def test_merge_asof_directions_vs_pandas(spark, ev, pev, direction):
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "ts", "user_id", F.col("value").alias("pval")
    )
    got = _sorted(
        tsf(ev)
        .merge_asof(purchases, ["pval"], direction=direction)
        .to_pandas()
    )
    pp = (
        pev[pev.event_type == "purchase"][["ts", "user_id", "value"]]
        .rename(columns={"value": "pval_want"})
        .sort_values("ts")
    )
    want = _sorted(
        pd.merge_asof(
            pev.sort_values("ts"),
            pp,
            on="ts",
            by="user_id",
            direction=direction,
        )
    )
    assert _eq(got["pval_r"], want["pval_want"])


def test_merge_asof_tolerance(spark, ev, pev):
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "ts", "user_id", F.col("value").alias("pval")
    )
    got = _sorted(
        tsf(ev)
        .merge_asof(purchases, ["pval"], direction="backward", tolerance="2d")
        .to_pandas()
    )
    pp = (
        pev[pev.event_type == "purchase"][["ts", "user_id", "value"]]
        .rename(columns={"value": "pval_want"})
        .sort_values("ts")
    )
    want = _sorted(
        pd.merge_asof(
            pev.sort_values("ts"),
            pp,
            on="ts",
            by="user_id",
            direction="backward",
            tolerance=pd.Timedelta("2D"),
        )
    )
    assert _eq(got["pval_r"], want["pval_want"])


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
@pytest.mark.parametrize("tol", [None, "2d"])
def test_merge_asof_exclusive_vs_pandas(spark, ev, pev, direction, tol):
    """allow_exact_matches=False across the direction x tolerance
    matrix. Every purchase row has an exact-ts match in the right side
    (it IS the right side), so exclusive matching changes the answer on
    every such row — a sharp differential."""
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "ts", "user_id", F.col("value").alias("pval")
    )
    got = _sorted(
        tsf(ev)
        .merge_asof(
            purchases,
            ["pval"],
            direction=direction,
            tolerance=tol,
            allow_exact_matches=False,
        )
        .to_pandas()
    )
    pp = (
        pev[pev.event_type == "purchase"][["ts", "user_id", "value"]]
        .rename(columns={"value": "pval_want"})
        .sort_values("ts")
    )
    want = _sorted(
        pd.merge_asof(
            pev.sort_values("ts"),
            pp,
            on="ts",
            by="user_id",
            direction=direction,
            tolerance=pd.Timedelta("2D") if tol else None,
            allow_exact_matches=False,
        )
    )
    assert _eq(got["pval_r"], want["pval_want"])


def test_merge_asof_left_by_right_by(spark, ev, pev):
    """Asymmetric key names: right carries the key as 'uid'."""
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "ts",
        F.col("user_id").alias("uid"),
        F.col("value").alias("pval"),
    )
    got = _sorted(
        tsf(ev)
        .merge_asof(
            purchases, ["pval"], left_by="user_id", right_by="uid"
        )
        .to_pandas()
    )
    pp = (
        pev[pev.event_type == "purchase"][["ts", "user_id", "value"]]
        .rename(columns={"value": "pval_want", "user_id": "uid"})
        .sort_values("ts")
    )
    want = _sorted(
        pd.merge_asof(
            pev.sort_values("ts"),
            pp,
            on="ts",
            left_by="user_id",
            right_by="uid",
            direction="backward",
        )
    )
    assert _eq(got["pval_r"], want["pval_want"])


@pytest.mark.parametrize("method", ["linear", "time", "pad"])
@pytest.mark.parametrize("limit", [None, 2])
def test_interpolate_vs_pandas(spark, ev, pev, method, limit):
    """interpolate over the RAW irregular series — every ~7th value
    nulled, then filled per method; pandas twin per user on a
    DatetimeIndex (method='time' weights by timestamp distance)."""
    holey = ev.withColumn(
        "value", F.when(F.col("event_id") % 7 != 0, F.col("value"))
    )
    got = _sorted(
        TsFrame(holey, ts_col="ts", by="user_id", order_col="event_id")
        .interpolate("value", method=method, limit=limit)
        .to_pandas()
    )
    p = pev.copy()
    p.loc[p.event_id % 7 == 0, "value"] = np.nan

    def fill(grp):
        grp = grp.sort_values(["ts", "event_id"]).set_index("ts")
        if method == "pad":
            grp["want"] = grp["value"].ffill(limit=limit)
        else:
            grp["want"] = grp["value"].interpolate(method=method, limit=limit)
        return grp.reset_index()

    want = _sorted(
        p.groupby("user_id", group_keys=False)[p.columns.tolist()].apply(fill)
    )
    assert _eq(got["value_interp"], want["want"])


@pytest.mark.parametrize("limit", [None, 1])
def test_ffill_bfill_vs_pandas(spark, ev, pev, limit):
    holey = ev.withColumn(
        "value", F.when(F.col("event_id") % 5 != 0, F.col("value"))
    )
    tf = TsFrame(holey, ts_col="ts", by="user_id", order_col="event_id")
    got = _sorted(tf.ffill("value", limit=limit).bfill("value", limit=limit).to_pandas())
    p = pev.copy()
    p.loc[p.event_id % 5 == 0, "value"] = np.nan
    want_f = _pandas_per_user(p, lambda g: g["value"].ffill(limit=limit))
    assert _eq(got["value_ffill"], want_f["want"])
    want_b = _pandas_per_user(p, lambda g: g["value"].bfill(limit=limit))
    assert _eq(got["value_bfill"], want_b["want"])


def test_merge_asof_exclusive_subset_invariants(spark, ev):
    """Laws the pandas differential can't state directly:
    - an exclusive match is strictly earlier than the left row (backward)
    - exclusive-matched rows are a subset of inclusive-matched rows
    - tightening tolerance only removes matches, never adds or changes"""
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "ts", "user_id", F.col("value").alias("pval")
    )

    def run(**kw):
        return (
            tsf(ev)
            .merge_asof(purchases, ["pval"], **kw)
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )

    inc = run()
    exc = run(allow_exact_matches=False)
    m_inc, m_exc = inc.pval_r.notna(), exc.pval_r.notna()
    assert (m_exc <= m_inc).all()  # subset
    assert m_exc.sum() < m_inc.sum()  # purchases self-match inclusively
    tol2 = run(tolerance="2d")
    tol7 = run(tolerance="7d")
    m2, m7 = tol2.pval_r.notna(), tol7.pval_r.notna()
    assert (m2 <= m7).all()
    # where both match, the matched value is identical
    both = m2 & m7
    assert (tol2.pval_r[both] == tol7.pval_r[both]).all()


@pytest.mark.parametrize("method", ["linear", "time", "pad", "nearest"])
def test_interpolate_invariants(spark, ev, method):
    """Complete data is a fixed point; filled values never leave the
    [prev, next] envelope of their gap's endpoints."""
    tf = tsf(ev)
    got = _sorted(tf.interpolate("value", method=method).to_pandas())
    base = _sorted(tf.to_pandas())
    assert np.allclose(got["value_interp"], base["value"])  # fixed point

    holey = ev.withColumn(
        "value", F.when(F.col("event_id") % 3 != 0, F.col("value"))
    )
    out = _sorted(
        TsFrame(holey, ts_col="ts", by="user_id", order_col="event_id")
        .interpolate("value", method=method)
        .to_pandas()
    )
    p = out.sort_values(["user_id", "ts", "event_id"]).copy()
    prev_v = p.groupby("user_id")["value"].ffill()
    next_v = p.groupby("user_id")["value"].bfill()
    filled = p["value"].isna() & p["value_interp"].notna()
    lo = np.minimum(prev_v[filled], next_v[filled].fillna(prev_v[filled]))
    hi = np.maximum(prev_v[filled], next_v[filled].fillna(prev_v[filled]))
    v = p["value_interp"][filled]
    assert ((v >= lo - 1e-9) & (v <= hi + 1e-9)).all()


def test_resample_calendar_partition_laws(spark, ev, pev):
    """Every row lands in exactly one bucket (counts partition the
    frame) and labels sit on the anchor: month-end for M, Monday for
    W-MON, a weekday for B."""
    n = len(pev)
    for freq in ["M", "W-MON", "B"]:
        got = TsFrame(ev, by=None).resample(freq).count().toPandas()
        assert got["n"].sum() == n, freq
        days = pd.to_datetime(got["bucket"])
        if freq == "M":
            assert (days == days + pd.offsets.MonthEnd(0)).all()
        elif freq == "W-MON":
            assert (days.dt.dayofweek == 0).all()
        else:
            assert (days.dt.dayofweek < 5).all()


def test_interpolate_nearest():
    """pandas 'nearest' needs scipy (absent here) — check against the
    scipy interp1d convention by hand: closer neighbor by timestamp,
    exact midpoint takes the previous, leading null stays, trailing
    pads."""
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "ts": pd.to_datetime(
                [
                    "2024-01-01", "2024-01-02", "2024-01-03",
                    "2024-01-06", "2024-01-10", "2024-01-11",
                ]
            ),
            "value": [None, 2.0, None, None, 8.0, None],
        }
    )
    from pandas_tsdb_spark.session import get_spark

    sdf = get_spark().createDataFrame(pdf)
    got = (
        TsFrame(sdf, ts_col="ts", by=None)
        .interpolate("value", method="nearest")
        .to_pandas()
        .sort_values("ts")["value_interp"]
        .tolist()
    )
    # Jan03: 1d to Jan02 vs 7d to Jan10 -> 2.0; Jan06: 4d vs 4d exact
    # midpoint -> previous (2.0); leading None stays; trailing pads 8.0
    assert got[0] != got[0]  # NaN
    assert got[1:] == [2.0, 2.0, 2.0, 8.0, 8.0]


def test_sessionize_gap(ev, pev):
    got = _sorted(tsf(ev).sessionize("1d").to_pandas())
    out = pev.sort_values(["user_id", "ts", "event_id"]).copy()
    gap = out.groupby("user_id")["ts"].diff() > pd.Timedelta("1D")
    out["want"] = gap.astype(int).groupby(out.user_id).cumsum() + 1
    want = _sorted(out)
    assert (got.session_id.to_numpy() == want.want.to_numpy()).all()


def test_rank_methods(ev, pev):
    for method in ["average", "min", "dense", "first"]:
        got = _sorted(tsf(ev).rank("value", method=method).to_pandas())
        out = pev.sort_values(["user_id", "ts", "event_id"]).copy()
        out["want"] = out.groupby("user_id")["value"].rank(method=method)
        want = _sorted(out)
        assert _eq(got.value_rank, want.want), method


def test_topk_per_series(ev, pev):
    got = tsf(ev).topk("value", 3).to_pandas()
    want = pev.groupby("user_id")["value"].nlargest(3)
    assert len(got) == len(want)
    got_sum = got.groupby("user_id")["value"].sum().sort_index()
    want_sum = want.groupby("user_id").sum().sort_index()
    assert _eq(got_sum, want_sum, tol=1e-9)


def test_trend_matches_numpy(ev, pev):
    got = tsf(ev).trend("value").toPandas().sort_values("user_id")
    uid = int(pev.user_id.iloc[0])
    g = pev[pev.user_id == uid]
    x = g.ts.astype("int64").to_numpy() / 1e3 / 86_400_000_000.0
    slope, intercept = np.polyfit(x, g.value.to_numpy(), 1)
    row = got[got.user_id == uid].iloc[0]
    assert abs(row.value_slope_per_day - slope) < 1e-6 * max(1, abs(slope))
    assert abs(row.value_intercept - intercept) < 1e-4 * max(1, abs(intercept))


def test_outliers_flag(ev, pev):
    got = tsf(ev).outliers("value", n_mads=3).to_pandas()
    assert f"value_is_outlier" in got.columns
    # per-user MAD rule recomputed in pandas
    uid = int(pev.user_id.iloc[0])
    g = pev[pev.user_id == uid]
    med = g.value.median()
    mad = (g.value - med).abs().median()
    want = ((g.value - med).abs() > 3 * mad)
    sub = got[got.user_id == uid].set_index("event_id").loc[g.event_id]
    assert (sub.value_is_outlier.to_numpy() == want.to_numpy()).all()


def test_resample_twa_constant_series(spark):
    """TWA of a constant-valued series equals the constant in every
    bucket, regardless of sample irregularity."""
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "ts": pd.to_datetime(
                ["2024-01-01 00:05", "2024-01-01 07:00", "2024-01-01 23:59",
                 "2024-01-02 01:00", "2024-01-02 02:00"]
            ),
            "user_id": [1] * 5,
            "value": [7.5] * 5,
            "event_id": range(5),
        }
    )
    tf = TsFrame(spark.createDataFrame(pdf), by="user_id", order_col="event_id")
    got = tf.resample("1d").twa("value").toPandas()
    assert (got.value_twa == 7.5).all()
    assert len(got) == 2


def test_apply_per_series_custom_kernel(ev, pev):
    """Generic per-series kernel: pandas interpolate() (not otherwise
    exposed) over each user's series."""

    def interp(pdf):
        out = pdf[["event_id", "user_id", "value"]].copy()
        masked = out.value.where(out.value <= 400)  # knock out spikes
        out["value_i"] = masked.interpolate(limit_direction="both")
        return out

    got = (
        tsf(ev)
        .apply_per_series(
            interp, "event_id long, user_id long, value double, value_i double"
        )
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    out = pev.sort_values(["user_id", "ts", "event_id"]).copy()
    masked = out.value.where(out.value <= 400)
    out["want"] = (
        masked.groupby(out.user_id, group_keys=False)
        .apply(lambda s: s.interpolate(limit_direction="both"))
    )
    want = _sorted(out)
    assert _eq(got.value_i, want.want, tol=1e-9)


def test_rolling_skew_api(ev, pev):
    got = _sorted(tsf(ev).rolling(7).skew("value").to_pandas())
    want = _pandas_per_user(pev, lambda g: g["value"].rolling(7).skew())
    assert _eq(got.value_skew, want.want, tol=1e-7)
    # min_periods below 3 still needs 3 obs (pandas semantics)
    got = _sorted(tsf(ev).rolling(5, min_periods=2).skew("value").to_pandas())
    want = _pandas_per_user(
        pev, lambda g: g["value"].rolling(5, min_periods=2).skew()
    )
    assert _eq(got.value_skew, want.want, tol=1e-7)


def test_rolling_kurt_api(ev, pev):
    got = _sorted(tsf(ev).rolling(7).kurt("value").to_pandas())
    want = _pandas_per_user(pev, lambda g: g["value"].rolling(7).kurt())
    assert _eq(got.value_kurt, want.want, tol=1e-6)
    # min_periods below 4 still needs 4 obs (pandas semantics)
    got = _sorted(tsf(ev).rolling(6, min_periods=2).kurt("value").to_pandas())
    want = _pandas_per_user(
        pev, lambda g: g["value"].rolling(6, min_periods=2).kurt()
    )
    assert _eq(got.value_kurt, want.want, tol=1e-6)


def test_rolling_quantile_api(ev, pev):
    got = _sorted(tsf(ev).rolling(7).quantile("value", 0.25).to_pandas())
    want = _pandas_per_user(pev, lambda g: g["value"].rolling(7).quantile(0.25))
    assert _eq(got.value_q25, want.want, tol=1e-12)
    # variable frame size: min_periods below window + an extreme q
    got = _sorted(tsf(ev).rolling(5, min_periods=2).quantile("value", 0.9).to_pandas())
    want = _pandas_per_user(
        pev, lambda g: g["value"].rolling(5, min_periods=2).quantile(0.9)
    )
    assert _eq(got.value_q90, want.want, tol=1e-12)


def test_combine_first_vs_pandas(ev, pev):
    """Mask even event_ids in the primary frame; combine_first must
    recover them from the secondary and keep odd rows from primary."""
    masked = ev.withColumn(
        "value", F.when(F.col("event_id") % 2 == 0, None).otherwise(F.col("value"))
    )
    primary = TsFrame(masked, ts_col="ts", by="user_id", order_col="event_id")
    got = _sorted(primary.combine_first(ev, keys=["event_id"]).to_pandas())
    pm = pev.set_index("event_id")
    pmasked = pm.copy()
    pmasked.loc[pmasked.index % 2 == 0, "value"] = np.nan
    want = pmasked.combine_first(pm).reset_index().pipe(_sorted)
    assert _eq(got["value"], want["value"])
    assert len(got) == len(want)


def test_combine_first_unions_rows_and_columns(ev):
    a = ev.filter(F.col("event_id") % 3 == 0).withColumn("a_extra", F.lit(1))
    b = ev.filter(F.col("event_id") % 3 != 0).withColumn("b_extra", F.lit(2))
    tf = TsFrame(a, ts_col="ts", by="user_id", order_col="event_id")
    out = tf.combine_first(b, keys=["event_id"]).to_pandas()
    assert len(out) == ev.count()
    assert {"a_extra", "b_extra"} <= set(out.columns)


def test_seasonal_adjust_vs_pandas(ev, pev):
    got = _sorted(tsf(ev).seasonal_adjust("value").to_pandas())
    p = pev.copy()
    # pandas dayofweek: Monday=0; Spark dayofweek: Sunday=1 — any
    # consistent labeling gives the same group means
    p["dow"] = p["ts"].dt.dayofweek
    p["want"] = p["value"] - p.groupby(["user_id", "dow"])["value"].transform("mean")
    assert _eq(got["value_deseason"], _sorted(p)["want"])


def test_holt_api_matches_registry_kernel(spark, ev, pev):
    """TsFrame.holt (per-key applyInPandas) must equal the registry's
    win_holt (mapInPandas + carry) — two independent implementations
    of the same recurrence, alpha/beta matching."""
    from pandas_tsdb_spark.registry import load_all

    got = _sorted(
        tsf(ev.select("user_id", "ts", "event_id", "value"))
        .holt("value", alpha=0.5, beta=0.3)
        .toPandas()
    )
    reg = (
        load_all()["win_holt"]
        .builder(spark, SMALL)
        .toPandas()
        .pipe(_sorted)
    )
    assert _eq(got["value_holt"], reg["holt_level"], tol=1e-12)


def test_ewm_var_std_vs_pandas(ev, pev):
    got = _sorted(
        tsf(ev).ewm(0.3).var("value").to_df().toPandas()
    )
    want = _pandas_per_user(
        pev, lambda g: g["value"].ewm(alpha=0.3, adjust=True).var()
    )
    assert _eq(got["value_ewmvar"], want["want"])
    got2 = _sorted(tsf(ev).ewm(0.3).std("value").to_df().toPandas())
    want2 = _pandas_per_user(
        pev, lambda g: g["value"].ewm(alpha=0.3, adjust=True).std()
    )
    assert _eq(got2["value_ewmstd"], want2["want"])


def test_rolling_corr_cov_vs_pandas(ev, pev):
    """rolling(10).corr/cov of value against its own lag-1 — pandas
    twins computed per series with the same min_periods."""
    shifted = tsf(ev).shift("value", 1, out="prev")
    got = _sorted(
        shifted.rolling(10).cov("value", "prev").to_df().toPandas()
    )
    got2 = _sorted(
        shifted.rolling(10).corr("value", "prev").to_df().toPandas()
    )
    p = pev.sort_values(["user_id", "ts", "event_id"]).copy()
    g = p.groupby("user_id")
    p["prev"] = g["value"].shift(1)

    def roll(fn):
        out = []
        for _, grp in p.groupby("user_id"):
            r = getattr(grp["value"].rolling(10), fn)(grp["prev"])
            out.append(r)
        return pd.concat(out)

    p["want_cov"] = roll("cov")
    p["want_corr"] = roll("corr")
    p = _sorted(p)
    # full equality including the NaN pattern: the guard counts complete
    # PAIRS like pandas, so windows where prev has nulls (first rows
    # after shift) are NaN on both sides
    assert _eq(got["value_prev_cov"], p["want_cov"])
    assert _eq(got2["value_prev_corr"], p["want_corr"])


def test_describe_vs_pandas(ev, pev):
    got = (
        tsf(ev).describe("value").toPandas().sort_values("user_id").reset_index(drop=True)
    )
    want = (
        pev.groupby("user_id")["value"]
        .describe()
        .reset_index()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert (got["count"].to_numpy() == want["count"].to_numpy()).all()
    for spark_c, pd_c in [("mean", "mean"), ("std", "std"), ("min", "min"),
                          ("p25", "25%"), ("p50", "50%"), ("p75", "75%"),
                          ("max", "max")]:
        assert _eq(got[spark_c], want[pd_c]), spark_c


def test_describe_no_by(ev, pev):
    """by=None describes the whole frame as ONE series; no literal
    grouping column may leak into the output schema."""
    got = TsFrame(ev, ts_col="ts", order_col="event_id").describe("value")
    assert got.columns == [
        "count", "mean", "std", "min", "p25", "p50", "p75", "max"
    ]
    row = got.toPandas().iloc[0]
    want = pev["value"].describe()
    assert row["count"] == want["count"]
    for spark_c, pd_c in [("mean", "mean"), ("std", "std"), ("min", "min"),
                          ("p25", "25%"), ("p50", "50%"), ("p75", "75%"),
                          ("max", "max")]:
        assert abs(row[spark_c] - want[pd_c]) < 1e-9, spark_c


def test_clip_vs_pandas(ev, pev):
    got = _sorted(tsf(ev).clip("value", lower=-50.0, upper=120.0).to_pandas())
    want = _sorted(pev.copy())
    want["want"] = want["value"].clip(lower=-50.0, upper=120.0)
    assert _eq(got["value_clip"], want["want"])
    # one-sided + null preservation
    got1 = _sorted(
        tsf(ev.withColumn("value", F.when(F.col("event_id") % 7 != 0, F.col("value"))))
        .clip("value", upper=0.0)
        .to_pandas()
    )
    base = pev.copy()
    base.loc[base.event_id % 7 == 0, "value"] = np.nan
    assert _eq(got1["value_clip"], base["value"].clip(upper=0.0))


def test_rolling_var_vs_pandas(ev, pev):
    got = _sorted(tsf(ev).rolling(5, min_periods=3).var("value").to_pandas())
    want = _pandas_per_user(
        pev, lambda g: g["value"].rolling(5, min_periods=3).var()
    )
    assert _eq(got["value_var"], want["want"], tol=1e-7)


def test_rolling_apply_vs_pandas(ev, pev):
    """Generic rolling .apply: row window, time window, and expanding,
    each against pandas' own rolling apply of the same callable."""
    fn = lambda a: np.median(a) - a[0]  # noqa: E731 - no builtin expresses this
    got = _sorted(tsf(ev).rolling(7, min_periods=2).apply("value", fn).to_pandas())
    want = _pandas_per_user(
        pev,
        lambda g: g["value"].rolling(7, min_periods=2).apply(fn, raw=True),
    )
    assert _eq(got["value_apply"], want["want"], tol=1e-9)

    got_t = _sorted(
        tsf(ev).rolling("3D", min_periods=1).apply("value", fn).to_pandas()
    )

    def pandas_time(g):
        return (
            g.apply(
                lambda sub: sub.set_index("ts")["value"]
                .rolling(pd.Timedelta("3D"), min_periods=1)
                .apply(fn, raw=True)
                .reset_index(drop=True)
            )
            .reset_index(drop=True)
        )

    src = pev.sort_values(["user_id", "ts", "event_id"]).copy()
    res = []
    for _, sub in src.groupby("user_id"):
        r = (
            sub.set_index("ts")["value"]
            .rolling(pd.Timedelta("3D"), min_periods=1)
            .apply(fn, raw=True)
        )
        res.append(pd.Series(r.to_numpy(), index=sub.index))
    src["want"] = pd.concat(res)
    assert _eq(got_t["value_apply"], _sorted(src)["want"], tol=1e-9)

    got_e = _sorted(
        tsf(ev).expanding(min_periods=2).apply("value", fn).to_pandas()
    )
    want_e = _pandas_per_user(
        pev, lambda g: g["value"].expanding(min_periods=2).apply(fn, raw=True)
    )
    assert _eq(got_e["value_apply"], want_e["want"], tol=1e-9)


def test_resampler_asfreq_vs_pandas(spark):
    """asfreq snapshot semantics vs pandas resample().asfreq(): values
    only at exact grid timestamps, null elsewhere, no filling."""
    base = pd.Timestamp("2024-01-01")
    pdf = pd.DataFrame(
        {
            "rid": np.arange(8),
            "ts": [
                base,
                base + pd.Timedelta("30min"),
                base + pd.Timedelta("1h"),
                base + pd.Timedelta("2h"),
                base + pd.Timedelta("2h30min"),
                base + pd.Timedelta("5h"),
                base + pd.Timedelta("6h1min"),
                base + pd.Timedelta("7h"),
            ],
            "user_id": np.zeros(8, dtype=np.int64),
            "value": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0],
        }
    )
    sdf = spark.createDataFrame(pdf)
    got = (
        TsFrame(sdf, by="user_id", order_col="rid")
        .resample("1h")
        .asfreq("value")
        .toPandas()
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    want = (
        pdf.set_index("ts")["value"].resample("1h").asfreq().reset_index()
    )
    assert (got["bucket"].to_numpy() == want["ts"].to_numpy()).all()
    assert _eq(got["value"], want["value"])


def test_merge_ordered_vs_pandas(spark):
    """Ordered outer merge + ffill vs pd.merge_ordered(left_by=...)."""
    rng = np.random.RandomState(7)
    base = pd.Timestamp("2024-01-01").value // 1000

    def mk(n, seed_off):
        r = np.random.RandomState(100 + seed_off)
        ts = np.sort(r.choice(np.arange(0, 5_000_000, 7), size=n, replace=False))
        return pd.DataFrame(
            {
                "user_id": r.randint(0, 3, n).astype(np.int64),
                "ts": pd.to_datetime((base + ts) * 1000),
                "v": np.round(r.randn(n), 3),
            }
        )

    lp = mk(40, 0).rename(columns={"v": "lv"})
    rp = mk(35, 1).rename(columns={"v": "rv"})
    ls = spark.createDataFrame(lp)
    rs = spark.createDataFrame(rp)
    got = (
        TsFrame(ls, by="user_id")
        .merge_ordered(rs, ["lv"], ["rv"])
        .to_pandas()
        .sort_values(["user_id", "ts"])
        .reset_index(drop=True)
    )
    wants = []
    for uid in sorted(set(lp.user_id) | set(rp.user_id)):
        w = pd.merge_ordered(
            lp[lp.user_id == uid].drop(columns="user_id"),
            rp[rp.user_id == uid].drop(columns="user_id"),
            on="ts",
            fill_method="ffill",
        )
        w["user_id"] = uid
        wants.append(w)
    want = (
        pd.concat(wants)
        .sort_values(["user_id", "ts"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    assert (got["ts"].to_numpy() == want["ts"].to_numpy()).all()
    assert _eq(got["lv"], want["lv"])
    assert _eq(got["rv"], want["rv"])
    # fill_method=None keeps the raw outer-join nulls
    raw = (
        TsFrame(ls, by="user_id")
        .merge_ordered(rs, ["lv"], ["rv"], fill_method=None)
        .to_pandas()
    )
    assert raw["lv"].isna().sum() > 0 and raw["rv"].isna().sum() > 0


def test_rank_pct_vs_pandas(ev, pev):
    for method in ["average", "min", "dense", "first"]:
        got = _sorted(
            tsf(ev).rank("value", method=method, pct=True).to_pandas()
        )
        want = _pandas_per_user(
            pev, lambda g: g["value"].rank(method=method, pct=True)
        )
        assert _eq(got["value_rank"], want["want"]), method


def test_register_views_sql_entry(spark):
    """spark.sql over registered views equals the DataFrame path,
    including the events ts normalization."""
    t = Tables(spark, SMALL)
    views = t.register_views(prefix="v_")
    assert len(views) == 10
    got = spark.sql(
        "SELECT event_type, count(*) AS n, round(sum(value), 2) AS tot "
        "FROM v_events GROUP BY 1 ORDER BY 1"
    ).toPandas()
    want = (
        t.events.groupBy("event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("tot"))
        .orderBy("event_type")
        .toPandas()
    )
    assert got.equals(want)
    ts0 = spark.sql("SELECT max(ts) AS m FROM v_events").collect()[0].m
    assert ts0 == t.events.agg(F.max("ts")).collect()[0][0]


def test_resampler_first_last_vs_pandas(ev, pev):
    for which in ["first", "last"]:
        got = (
            getattr(tsf(ev).resample("1d"), which)("value")
            .toPandas()
            .sort_values(["user_id", "bucket"])
            .reset_index(drop=True)
        )
        wants = []
        for uid, sub in pev.sort_values(["ts", "event_id"]).groupby("user_id"):
            s = getattr(
                sub.set_index("ts")["value"].resample("1D"), which
            )()
            w = s.dropna().reset_index().rename(columns={"ts": "bucket"})
            w["user_id"] = uid
            wants.append(w)
        want = (
            pd.concat(wants)
            .sort_values(["user_id", "bucket"])
            .reset_index(drop=True)
        )
        # groupBy emits only populated buckets; pandas emits the dense
        # span — compare on populated buckets
        got_nn = got[got.value.notna()].reset_index(drop=True)
        assert len(got_nn) == len(want), which
        assert _eq(got_nn["value"], want["value"]), which


def test_fillna_dropna(ev):
    nulled = ev.withColumn(
        "value", F.when(F.col("event_id") % 5 != 0, F.col("value"))
    )
    tf = TsFrame(nulled, by="user_id", order_col="event_id")
    filled = tf.fillna(-1.0, ["value"]).to_pandas()
    assert (filled.value.isna()).sum() == 0
    assert (filled.value == -1.0).sum() > 0
    dropped = tf.dropna(["value"]).to_pandas()
    assert dropped.value.notna().all()
    assert len(dropped) < nulled.count()


@pytest.mark.parametrize(
    "spark_freq,pd_freq",
    [("W-MON", "W-MON"), ("M", "ME"), ("Q", "QE"), ("B", "B")],
)
def test_resample_calendar_ffill_vs_pandas(spark, ev, pev, spark_freq, pd_freq):
    """resample('M').ffill() and friends (round-2 ADVICE: these raised a
    confusing sub-month-frequency error). Calendar-grid densification:
    per-series period-end labels from first to last populated period,
    forward-filling resample().last() — differential vs pandas."""
    got = (
        tsf(ev)
        .resample(spark_freq)
        .ffill("value")
        .toPandas()
        .sort_values(["user_id", "bucket"])
        .reset_index(drop=True)
    )
    want = (
        pev.set_index("ts")
        .groupby("user_id")["value"]
        .resample(pd_freq)
        .last()
        .groupby(level=0)
        .ffill()
        .rename("want")
        .reset_index()
        .sort_values(["user_id", "ts"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want), (spark_freq, len(got), len(want))
    assert (got["bucket"].to_numpy() == want["ts"].to_numpy()).all()
    assert _eq(got["value"], want["want"])


def test_resample_calendar_asfreq_and_interpolate(spark, ev):
    """Calendar asfreq snapshots at the period-end label instant (null
    unless a row sits exactly there — none do in the fixture), and the
    grid covers every period label between the series' first and last
    period with no gaps; interpolate fills interior nulls."""
    r = tsf(ev).resample("M")
    grid = r.asfreq("value").toPandas().sort_values(["user_id", "bucket"])
    assert grid["value"].isna().all()  # no midnight month-end rows
    # per-user grid is contiguous month ends
    for _, g in grid.groupby("user_id"):
        months = pd.DatetimeIndex(g["bucket"])
        assert (months == pd.date_range(months[0], months[-1], freq="ME")).all()
    filled = r.interpolate("value", method="linear").toPandas()
    last = tsf(ev).resample("M").last("value").toPandas()
    # interpolation only densifies BETWEEN populated buckets; where a
    # bucket had data, the value must equal resample().last()
    m = filled.merge(last, on=["user_id", "bucket"], suffixes=("", "_want"))
    assert _eq(m["value"], m["value_want"])


def test_kalman_api_matches_registry_kernel(spark, ev, pev):
    """TsFrame.kalman (per-key applyInPandas, scalar loop) must equal
    the registry's win_kalman (across-series vectorized mapInPandas
    with cross-batch carry) — two independent implementations of the
    same nonlinear recurrence, q/r matching."""
    from pandas_tsdb_spark.registry import load_all

    got = _sorted(
        tsf(ev.select("user_id", "ts", "event_id", "value"))
        .kalman("value", q=0.001, r=0.04)
        .toPandas()
    )
    reg = (
        load_all()["win_kalman"]
        .builder(spark, SMALL)
        .toPandas()
        .pipe(_sorted)
    )
    assert _eq(got["value_kalman"], reg["kalman_level"], tol=1e-12)


def test_ewm_adjust_false_vs_pandas(spark, ev, pev):
    """ewm(alpha, adjust=False): the plain recursion
    y_t = (1-a) y_{t-1} + a x_t — pandas parity for the non-default
    adjust mode (round-3 API widening)."""
    got = _sorted(
        tsf(ev).ewm(alpha=0.3, adjust=False).mean("value").to_pandas()
    )
    want = _pandas_per_user(
        pev, lambda g: g["value"].ewm(alpha=0.3, adjust=False).mean()
    )
    assert _eq(got.value_ewm, want.want, tol=1e-9)
    got_v = _sorted(
        tsf(ev).ewm(alpha=0.3, adjust=False).var("value").to_df().toPandas()
    )
    want_v = _pandas_per_user(
        pev, lambda g: g["value"].ewm(alpha=0.3, adjust=False).var()
    )
    assert _eq(got_v["value_ewmvar"], want_v["want"])


def test_rolling_center_vs_pandas(spark, ev, pev):
    """rolling(window, center=True) for odd AND even windows — the
    centered frame [i-(w-1)//2, i+w//2] must match pandas exactly."""
    for w in (7, 4):
        got = _sorted(
            tsf(ev).rolling(w, center=True).mean("value").to_pandas()
        )
        want = _pandas_per_user(
            pev,
            lambda g, w=w: g["value"].rolling(w, center=True, min_periods=w).mean(),
        )
        assert _eq(got.value_mean, want.want), w


def test_ewm_decay_aliases_vs_pandas(spark, ev, pev):
    """ewm(com=) / ewm(span=) / ewm(halflife=) — the pandas decay
    conversions, differential against the same pandas call."""
    for kw in ({"com": 2.5}, {"span": 10}, {"halflife": 3.0}):
        got = _sorted(tsf(ev).ewm(**kw).mean("value").to_pandas())
        want = _pandas_per_user(
            pev, lambda g, kw=kw: g["value"].ewm(**kw, adjust=True).mean()
        )
        assert _eq(got.value_ewm, want.want, tol=1e-9), kw
    import pytest as _pytest

    with _pytest.raises(ValueError):
        tsf(ev).ewm(alpha=0.3, span=10)
    with _pytest.raises(ValueError):
        tsf(ev).ewm()


def test_ewm_time_halflife_vs_pandas(spark, ev, pev):
    """Time-decayed EWM over irregular samples: ewm(halflife="2d")
    weights by 0.5^(observed gap / halflife) using the frame's time
    column — pandas ewm(halflife=Timedelta, times=index) parity."""
    got = _sorted(tsf(ev).ewm(halflife="2d").mean("value").to_pandas())
    want = _pandas_per_user(
        pev,
        lambda g: g.apply(
            lambda sub: sub["value"]
            .ewm(halflife=pd.Timedelta("2d"), times=sub["ts"])
            .mean()
        ),
    )
    assert _eq(got.value_ewm, want.want, tol=1e-9)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        tsf(ev).ewm(halflife="2d", adjust=False)


def test_resample_ohlc_skips_nulls(ev, pev):
    """pandas Resampler.ohlc computes all four edges over the bucket's
    NON-null values (a leading NaN never becomes the open) — round-5
    null-hardening of the TsFrame twin: plain min_by/max_by would emit
    the NaN edge rows verbatim."""
    holey = ev.withColumn(
        "value",
        F.when(F.col("event_id") % 5 != 0, F.col("value")).cast("double"),
    )
    got = (
        TsFrame(holey, by=None, order_col="event_id")
        .resample("1d")
        .ohlc("value")
        .toPandas()
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    ph = pev.sort_values("event_id").copy()
    ph.loc[ph.event_id % 5 == 0, "value"] = np.nan
    want = ph.set_index("ts")["value"].resample("1D").ohlc()
    for c in ["open", "high", "low", "close"]:
        assert _eq(got[c], want[c].reset_index(drop=True)), c


def test_ewm_time_halflife_nulls_vs_pandas(ev, pev):
    """Round-5 recurrence-family null sweep: the time-decayed EWM kernel
    (win_ewm_time's engine) must match pandas ewm(halflife=Timedelta,
    times=...) on null-injected data — NaN observations contribute no
    weight but time keeps decaying."""
    holey = ev.withColumn(
        "value",
        F.when(F.col("event_id") % 5 != 0, F.col("value")).cast("double"),
    )
    got = (
        TsFrame(holey, ts_col="ts", by="user_id", order_col="event_id")
        .ewm(halflife="2 days")
        .mean("value")
        .df.toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    ph = pev.sort_values(["user_id", "event_id"]).copy()
    ph.loc[ph.event_id % 5 == 0, "value"] = np.nan
    outs = []
    for _uid, g in ph.groupby("user_id"):
        s = (
            g.set_index("ts")["value"]
            .ewm(halflife=pd.Timedelta("2 days"), times=g["ts"].values)
            .mean()
        )
        outs.append(
            pd.DataFrame({"event_id": g["event_id"].to_numpy(), "want": s.to_numpy()})
        )
    want = pd.concat(outs).sort_values("event_id").reset_index(drop=True)
    m = got.merge(want, on="event_id")
    a = m["value_ewm"].to_numpy(dtype=float)
    b = m["want"].to_numpy(dtype=float)
    ok = np.isclose(a, b, rtol=1e-9, atol=1e-12) | (np.isnan(a) & np.isnan(b))
    assert ok.all(), m[~ok].head()


def test_sanitize_specials_matches_pandas_missing_model(spark, ev):
    """sanitize_specials: NaN/±Inf -> NULL, so a rolling mean over a
    sanitized Spark-native frame matches pandas (where the same rows
    would be NaN = missing and skipped)."""
    dirty = ev.withColumn(
        "value",
        F.when(F.col("event_id") % 7 == 0, F.lit(float("nan")))
        .when(F.col("event_id") % 11 == 0, F.lit(float("inf")))
        .otherwise(F.col("value")),
    )
    tf = TsFrame(dirty, ts_col="ts", by="user_id", order_col="event_id")
    got = _sorted(
        tf.sanitize_specials()
        .rolling(3, min_periods=1)
        .mean("value", out="m")
        .to_pandas()
    )
    pdirty = dirty.toPandas().sort_values(["user_id", "event_id"])
    # toPandas maps the injected NaN/Inf faithfully; emulate the
    # contract (specials are missing), then pandas rolling-skipna
    pdirty["value"] = pdirty["value"].where(np.isfinite(pdirty["value"]))
    exp = (
        pdirty.groupby("user_id")["value"]
        .rolling(3, min_periods=1).mean()
        .reset_index(level=0, drop=True)
    )
    exp = pdirty.assign(m=exp).sort_values("event_id").reset_index(drop=True)
    assert _eq(got["m"], exp["m"])


def test_sanitize_specials_named_columns_only(spark, ev):
    dirty = ev.withColumn("v2", F.lit(float("inf")))
    tf = TsFrame(dirty, ts_col="ts", by="user_id", order_col="event_id")
    out = tf.sanitize_specials("v2").to_pandas()
    assert out["v2"].isna().all()
    assert np.isfinite(out["value"].to_numpy()).all()
