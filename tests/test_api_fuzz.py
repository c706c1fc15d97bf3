"""Hypothesis differential fuzzing: TsFrame vs real pandas on
randomized small frames (SURVEY §5 strategy beyond fixed fixtures).

Each drawn frame has adversarial structure the events fixture lacks by
construction: singleton series, duplicate timestamps within a series,
null runs at the head/tail, constant series. One draw builds the
Spark/pandas twins ONCE and checks the whole method matrix on them,
amortizing the JVM round-trip.

Known, documented divergences handled here:
- pct_change where the previous value is exactly 0 — pandas yields
  ±inf, TsFrame yields NULL (ANSI-safe NULLIF design, api.py); inf is
  mapped to NaN on both sides before equating (subnormal previous
  values overflow to inf in BOTH engines).
- interpolate('time') at sub-millisecond gaps: pandas converts the ns
  epoch index to FLOAT64 (spacing 256 ns at 2024 epochs), so its lerp
  fraction for a 1µs/6µs gap is 1024/5888 = 4/23 instead of the true
  1/6 — a pandas precision artifact; TsFrame's µs-integer arithmetic
  is exact. Timestamps here are drawn at SECOND granularity, where
  the float64 error (~2.6e-7 relative) sits below the tolerance.
- zscore in the CANCELLATION BAND (7th-soak find): when the true
  std is at rounding scale relative to the mean (two ~1e6 values
  differing in the last ulp -> std <= |mean|*1e-7), pandas' two-pass
  std and Spark's moment-based stddev_samp return DIFFERENT noise and
  the z-scores are numerically meaningless in any engine; the window
  matrix masks that band (exact-zero std agrees as NULL on both).
- time-based rolling at DUPLICATE timestamps: SQL RANGE frames treat
  equal-ts rows as window PEERS (all included — the deterministic,
  order-independent semantics, matching DuckDB), while pandas
  includes only rows up to the current row position, an artifact of
  its positional evaluation. The time-rolling comparison masks
  intra-series duplicate-ts rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

pytestmark = pytest.mark.sweep
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from pandas_tsdb_spark.api import TsFrame

_BASE_US = 1_704_067_200_000_000  # 2024-01-01 UTC in µs


@st.composite
def frames(draw):
    n = draw(st.integers(min_value=1, max_value=50))
    users = draw(
        st.lists(st.integers(0, 3), min_size=n, max_size=n)
    )
    # SECOND-granularity offsets over ~30 days; duplicates allowed
    # (ties + zero-width interpolation gaps exercised). Sub-ms offsets
    # would hit pandas' float64-ns index artifact (module docstring).
    offs = draw(
        st.lists(
            st.integers(0, 30 * 86_400).map(lambda s: s * 1_000_000),
            min_size=n,
            max_size=n,
        )
    )
    vals = draw(
        st.lists(
            st.one_of(
                st.none(),
                st.floats(
                    min_value=-1e6,
                    max_value=1e6,
                    allow_nan=False,
                    allow_infinity=False,
                ),
            ),
            min_size=n,
            max_size=n,
        )
    )
    return pd.DataFrame(
        {
            "rid": np.arange(n, dtype=np.int64),
            "ts": pd.to_datetime(
                [(_BASE_US + o) * 1000 for o in offs], utc=False
            ),
            "user_id": np.array(users, dtype=np.int64),
            "value": pd.array(vals, dtype="float64"),
        }
    )


def _eq(a, b, tol=1e-6):
    a = np.asarray(a, dtype=float)
    b = np.asarray(b, dtype=float)
    both_nan = np.isnan(a) & np.isnan(b)
    return bool((both_nan | np.isclose(a, b, rtol=tol, atol=tol)).all())


def _sorted_pd(pdf):
    return pdf.sort_values("rid").reset_index(drop=True)


@pytest.fixture(scope="module")
def fuzz_spark(spark):
    return spark


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pdf=frames())
def test_tsframe_matches_pandas_on_random_frames(fuzz_spark, pdf):
    spark = fuzz_spark
    sdf = spark.createDataFrame(pdf)
    tf = TsFrame(sdf, ts_col="ts", by="user_id", order_col="rid")

    chained = (
        tf.shift("value")
        .diff("value")
        .pct_change("value")
        .cumsum("value")
        .ffill("value", limit=1)
        .bfill("value", limit=1)
        .rolling(3).mean("value", out="roll3")
        .interpolate("value", method="time", out="interp_t")
    )
    got = _sorted_pd(chained.to_pandas())

    p = pdf.sort_values(["user_id", "ts", "rid"]).copy()
    g = p.groupby("user_id")["value"]
    p["shift"] = g.shift(1)
    p["diff"] = g.diff(1)
    pc = g.pct_change(1, fill_method=None)
    p["pct"] = pc.replace([np.inf, -np.inf], np.nan)
    p["cum"] = g.cumsum()  # pandas skips NaN in cumsum, like F.sum
    p["ff"] = g.ffill(limit=1)
    p["bf"] = g.bfill(limit=1)
    p["roll3"] = (
        p.groupby("user_id")["value"]
        .rolling(3)
        .mean()
        .reset_index(level=0, drop=True)
    )

    def interp(grp):
        grp = grp.sort_values(["ts", "rid"]).set_index("ts")
        grp["it"] = grp["value"].interpolate("time")
        return grp.reset_index()

    p = (
        p.groupby("user_id", group_keys=False)[p.columns.tolist()]
        .apply(interp)
    )
    want = _sorted_pd(p)

    assert _eq(got["value_shift"], want["shift"])
    assert _eq(got["value_diff"], want["diff"])
    # pct_change: exact-zero prev -> NULL here vs inf in pandas
    # (documented NULLIF design); SUBNORMAL prev overflows to inf in
    # BOTH engines — map inf to NaN on both sides before equating
    got_pct = got["value_pct"].replace([np.inf, -np.inf], np.nan)
    assert _eq(got_pct, want["pct"])
    assert _eq(got["value_cumsum"], want["cum"])
    assert _eq(got["value_ffill"], want["ff"])
    assert _eq(got["value_bfill"], want["bf"])
    assert _eq(got["roll3"], want["roll3"])
    assert _eq(got["interp_t"], want["it"])


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pdf=frames())
def test_tsframe_windows_match_pandas_on_random_frames(fuzz_spark, pdf):
    """Second matrix: rolling stats (count/time windows), expanding,
    zscore, rank, sessionize — same amortized one-draw shape."""
    spark = fuzz_spark
    sdf = spark.createDataFrame(pdf)
    tf = TsFrame(sdf, ts_col="ts", by="user_id", order_col="rid")

    chained = (
        tf.rolling(4, min_periods=2).sum("value", out="rsum")
        .rolling("1d").mean("value", out="tmean")
        .rolling(3, center=True).mean("value", out="cmean")
        .expanding().max("value", out="emax")
        .zscore("value", out="z")
        .rank("value", method="average", out="rnk")
        .sessionize("6h", out="sess")
    )
    got = _sorted_pd(chained.to_pandas())

    p = pdf.sort_values(["user_id", "ts", "rid"]).copy()
    g = p.groupby("user_id")["value"]
    p["rsum"] = (
        g.rolling(4, min_periods=2).sum().reset_index(level=0, drop=True)
    )
    tm = (
        p.set_index("ts")
        .groupby("user_id")["value"]
        .rolling("1d")
        .mean()
        .reset_index()
    )
    # align time-rolling result back by position within each group
    # (ts collides, so positional alignment is the only safe join)
    p["tmean"] = tm["value"].to_numpy()
    p["cmean"] = (
        g.rolling(3, center=True, min_periods=3)
        .mean()
        .reset_index(level=0, drop=True)
    )
    p["emax"] = g.expanding().max().reset_index(level=0, drop=True)
    grp = p.groupby("user_id")["value"]
    # subnormal-range series underflow the squared-deviation sum to 0
    # in BOTH engines; pandas then divides to +-inf where the NULLIF
    # design yields NULL — same documented divergence as pct_change
    p["z"] = (
        (p["value"] - grp.transform("mean")) / grp.transform("std")
    ).replace([np.inf, -np.inf], np.nan)
    # CANCELLATION BAND (soak-run find): when the true std sits at
    # rounding scale relative to the mean (std <= |mean|*1e-7, e.g.
    # two 1e6 values differing in the last ulp), pandas' two-pass std
    # and Spark's moment formula return DIFFERENT noise and the
    # z-scores are numerically meaningless in any engine — mask them
    # (exact zero std stays: both engines agree on NULL there)
    _cv_noise = (grp.transform("std") > 0) & (
        grp.transform("std") <= grp.transform("mean").abs() * 1e-7
    )
    p["_cv_noise_mask"] = _cv_noise
    p["rnk"] = grp.rank(method="average")
    gap = p.groupby("user_id")["ts"].diff() > pd.Timedelta("6h")
    p["sess"] = gap.astype(int).groupby(p.user_id).cumsum() + 1
    want = _sorted_pd(p)

    assert _eq(got["rsum"], want["rsum"])
    # mask duplicate-ts rows: RANGE-peers vs positional divergence
    # (module docstring)
    uniq = (~want.duplicated(["user_id", "ts"], keep=False)).to_numpy()
    assert _eq(got["tmean"][uniq], want["tmean"][uniq])
    assert _eq(got["cmean"], want["cmean"])
    assert _eq(got["emax"], want["emax"])
    z_ok = ~want["_cv_noise_mask"].to_numpy()
    assert _eq(got["z"][z_ok], want["z"][z_ok])
    assert _eq(got["rnk"], want["rnk"])
    assert (got["sess"].to_numpy() == want["sess"].to_numpy()).all()


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pdf=frames())
def test_merge_asof_fuzz_vs_pandas(fuzz_spark, pdf):
    """merge_asof against a derived right side (even rids with non-null
    values) across direction x exact-match, on adversarial frames."""
    spark = fuzz_spark
    right_pd = pdf[(pdf.rid % 2 == 0) & pdf.value.notna()][
        ["ts", "user_id", "value"]
    ].rename(columns={"value": "rv"})
    sdf = spark.createDataFrame(pdf)
    rdf = (
        spark.createDataFrame(right_pd)
        if len(right_pd)
        else spark.createDataFrame(right_pd, "ts timestamp, user_id long, rv double")
    )
    tf = TsFrame(sdf, ts_col="ts", by="user_id", order_col="rid")
    for direction in ["backward", "forward", "nearest"]:
        for exact in [True, False]:
            for tol in [None, "1d"]:
                got = _sorted_pd(
                    tf.merge_asof(
                        rdf,
                        ["rv"],
                        direction=direction,
                        allow_exact_matches=exact,
                        tolerance=tol,
                    ).to_pandas()
                )
                want = _sorted_pd(
                    pd.merge_asof(
                        pdf.sort_values(["ts", "rid"], kind="stable"),
                        right_pd.sort_values("ts", kind="stable"),
                        on="ts",
                        by="user_id",
                        direction=direction,
                        allow_exact_matches=exact,
                        tolerance=pd.Timedelta("1D") if tol else None,
                    )
                )
                assert _eq(got["rv_r"], want["rv"]), (direction, exact, tol)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pdf=frames())
def test_tsframe_order_stats_match_pandas_on_random_frames(fuzz_spark, pdf):
    """Third matrix: rolling order statistics (median/quantile), std
    with min_periods=1, cummax/cummin null masks, seasonal adjust,
    grouped describe. (skew/kurt stay on the fixture differential:
    power-sum cancellation on adversarial 1e6-scale constants is
    engine-noise, not semantics.)"""
    spark = fuzz_spark
    sdf = spark.createDataFrame(pdf)
    tf = TsFrame(sdf, ts_col="ts", by="user_id", order_col="rid")

    chained = (
        tf.rolling(5, min_periods=1).std("value", out="rstd")
        .rolling(5).median("value", out="rmed")
        .rolling(5).quantile("value", 0.3, out="rq30")
        .cummax("value")
        .cummin("value")
        .seasonal_adjust("value", out="deseason")
    )
    got = _sorted_pd(chained.to_pandas())

    p = pdf.sort_values(["user_id", "ts", "rid"]).copy()
    g = p.groupby("user_id")["value"]
    p["rstd"] = (
        g.rolling(5, min_periods=1).std().reset_index(level=0, drop=True)
    )
    p["rmed"] = g.rolling(5).median().reset_index(level=0, drop=True)
    p["rq30"] = (
        g.rolling(5)
        .quantile(0.3, interpolation="linear")
        .reset_index(level=0, drop=True)
    )
    p["cmax"] = g.cummax()
    p["cmin"] = g.cummin()
    dow = p["ts"].dt.dayofweek
    p["deseason"] = p["value"] - p.groupby(["user_id", dow])[
        "value"
    ].transform("mean")
    want = _sorted_pd(p)

    # pandas rolling.std uses an ONLINE add/remove kernel that drifts
    # after large values leave the window (observed: 0.353548 vs the
    # exact 1/(2*sqrt(2)) = 0.353553 after a 1.9e5 value left); Spark
    # evaluates each frame fresh. Compare with an absolute tolerance
    # sized to the drift, not to our engine.
    a = np.asarray(got["rstd"], dtype=float)
    b = np.asarray(want["rstd"], dtype=float)
    nn = np.isnan(a) & np.isnan(b)
    # atol bounds pandas' worst drift for 1e6-scale windows (~1e-2);
    # a real semantic bug (wrong frame/guard) moves rstd by >> 0.05
    ok = nn | np.isclose(a, b, rtol=1e-5, atol=5e-2)
    assert ok.all(), list(zip(a[~ok], b[~ok]))
    assert _eq(got["rmed"], want["rmed"])
    assert _eq(got["rq30"], want["rq30"])
    assert _eq(got["value_cummax"], want["cmax"])
    assert _eq(got["value_cummin"], want["cmin"])
    assert _eq(got["deseason"], want["deseason"])

    gotd = (
        tf.describe("value")
        .toPandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    wantd = (
        pdf.groupby("user_id")["value"]
        .describe()
        .reset_index()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert (gotd["count"].to_numpy() == wantd["count"].to_numpy()).all()
    for sc, pc in [("mean", "mean"), ("std", "std"), ("min", "min"),
                   ("p25", "25%"), ("p50", "50%"), ("p75", "75%"),
                   ("max", "max")]:
        assert _eq(gotd[sc], wantd[pc]), sc


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pdf=frames())
def test_resample_calendar_fuzz_vs_pandas(fuzz_spark, pdf):
    """Calendar frequencies over random frames: bucket labels and
    per-bucket counts/sums equal pandas resample defaults for every
    supported anchor (populated bins only — groupBy emits no empties)."""
    spark = fuzz_spark
    sdf = spark.createDataFrame(pdf)
    ser = pdf.set_index("ts")["value"].astype(float)
    for spark_freq, pd_freq in [
        ("W", "W"), ("W-WED", "W-WED"), ("M", "ME"), ("Q", "QE"), ("B", "B")
    ]:
        got = (
            TsFrame(sdf, by=None)
            .resample(spark_freq)
            .agg(
                F.count("value").alias("n"),
                F.round(F.sum("value"), 6).alias("tot"),
            )
            .toPandas()
            .sort_values("bucket")
            .reset_index(drop=True)
        )
        want = (
            ser.resample(pd_freq)
            .agg(["count", "sum"])
            .reset_index()
        )
        # drop bins with zero rows present (groupBy semantics); pandas
        # 'count' counts non-null, so align on bins having ANY row:
        # rebuild presence from the raw index
        present = (
            pd.Series(1, index=pdf["ts"]).resample(pd_freq).count() > 0
        ).reset_index(drop=True)
        want = want[present.to_numpy()].reset_index(drop=True)
        assert (
            got["bucket"].to_numpy() == want["ts"].to_numpy()
        ).all(), spark_freq
        assert (got["n"].to_numpy() == want["count"].to_numpy()).all(), spark_freq
        w = want["sum"].astype(float).round(6)
        assert _eq(got["tot"].fillna(0.0), w.fillna(0.0), tol=1e-5), spark_freq


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pdf=frames(), cut_day=st.integers(1, 29))
def test_tsstore_fuzz_invariants(fuzz_spark, pdf, cut_day):
    """TsStore laws on random frames: two-batch append round-trips the
    multiset; time-slice fetch == filter; as_of pins to the first
    batch; latest_by and compact agree on keep-latest; refresh_rollup
    equals the batch aggregate and is idempotent."""
    import tempfile

    from pandas_tsdb_spark.store import TsStore

    spark = fuzz_spark
    store = TsStore(spark, tempfile.mkdtemp(prefix="fuzz_store_"))
    cut = pd.Timestamp("2024-01-01") + pd.Timedelta(days=cut_day)
    first = pdf[pdf.ts < cut]
    late = pdf[pdf.ts >= cut]
    sdf_first = spark.createDataFrame(first, "rid long, ts timestamp, user_id long, value double")
    sdf_late = spark.createDataFrame(late, "rid long, ts timestamp, user_id long, value double")
    store.append("s", sdf_first, ingest_ts="2025-01-01 00:00:00")
    store.append("s", sdf_late, ingest_ts="2025-02-01 00:00:00")

    # round-trip multiset
    got = store.fetch("s").toPandas()
    assert sorted(got.rid) == sorted(pdf.rid)

    # slice == filter (inclusive)
    lo, hi = "2024-01-05", "2024-01-20 23:59:59"
    sl = store.fetch("s", lo, hi).toPandas()
    want = pdf[(pdf.ts >= lo) & (pdf.ts <= pd.Timestamp(hi))]
    assert sorted(sl.rid) == sorted(want.rid)

    # as_of pins to the first batch exactly
    snap = store.fetch("s", as_of="2025-01-15 00:00:00").toPandas()
    assert sorted(snap.rid) == sorted(first.rid)

    # duplicate-append then latest_by == compact result
    bump = sdf_first.withColumn("value", F.coalesce(F.col("value"), F.lit(0.0)) + 1e9)
    store.append("s", bump, ingest_ts="2025-03-01 00:00:00")
    latest = store.fetch("s", latest_by=["rid"], order_col="value").toPandas()
    assert sorted(latest.rid) == sorted(pdf.rid)
    bumped = latest[latest.rid.isin(first.rid)].set_index("rid")["value"]
    exp = (first.set_index("rid")["value"].fillna(0.0) + 1e9).reindex(bumped.index)
    assert np.allclose(bumped.to_numpy(), exp.to_numpy()) or len(bumped) == 0
    store.compact("s", key_cols=["rid"], order_col="value")
    compacted = store.fetch("s").toPandas()
    assert sorted(compacted.rid) == sorted(pdf.rid)

    # rollup == batch aggregate; second refresh is a no-op
    def day_agg(day_df):
        return day_df.groupBy().agg(
            F.count("value").alias("n"),
            F.round(F.sum("value"), 4).alias("tot"),
        )

    assert store.refresh_rollup("s", "daily", day_agg) > 0
    assert store.refresh_rollup("s", "daily", day_agg) == 0
    roll_n = (
        store.read_rollup("daily").agg(F.sum("n")).collect()[0][0]
    )
    assert roll_n == int(compacted.value.notna().sum())


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pdf=frames())
def test_clip_var_apply_fuzz_vs_pandas(fuzz_spark, pdf):
    """Fifth matrix: clip bounds (null preservation), rolling var, and
    the generic rolling/expanding .apply on random frames with nulls
    and duplicate timestamps."""
    spark = fuzz_spark
    sdf = spark.createDataFrame(
        pdf, "rid long, ts timestamp, user_id long, value double"
    )
    tf = TsFrame(sdf, ts_col="ts", by="user_id", order_col="rid")
    src = pdf.sort_values(["user_id", "ts", "rid"]).copy()
    g = src.groupby("user_id")["value"]

    got = _sorted_pd(tf.clip("value", lower=-100.0, upper=250.0).to_pandas())
    want = pdf.sort_values("rid").reset_index(drop=True)["value"].clip(-100.0, 250.0)
    assert _eq(got["value_clip"], want)

    got = _sorted_pd(tf.rolling(4, min_periods=2).var("value").to_pandas())
    src["want"] = g.rolling(4, min_periods=2).var().reset_index(level=0, drop=True)
    # both engines' streaming-moment var carries cancellation noise up
    # to ~n*x^2*eps ~ 1e-4 for near-constant windows of +-1e6 values;
    # compare with an absolute floor above that, relative elsewhere
    a = got["value_var"].to_numpy(dtype=float)
    b = _sorted_pd(src)["want"].to_numpy(dtype=float)
    both_nan = np.isnan(a) & np.isnan(b)
    assert bool((both_nan | np.isclose(a, b, rtol=1e-6, atol=0.05)).all())

    fn = lambda a: float(np.nansum(a)) - float(np.nanmin(a))  # noqa: E731
    got = _sorted_pd(
        tf.rolling(5, min_periods=1).apply("value", fn).to_pandas()
    )
    src["want"] = (
        g.rolling(5, min_periods=1).apply(fn, raw=True)
        .reset_index(level=0, drop=True)
    )
    assert _eq(got["value_apply"], _sorted_pd(src)["want"], tol=1e-6)

    got = _sorted_pd(tf.expanding(min_periods=2).apply("value", fn).to_pandas())
    src["want"] = (
        g.expanding(min_periods=2).apply(fn, raw=True)
        .reset_index(level=0, drop=True)
    )
    assert _eq(got["value_apply"], _sorted_pd(src)["want"], tol=1e-6)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pdf=frames())
def test_resampler_fill_fuzz_vs_pandas(fuzz_spark, pdf):
    """Sixth matrix: Resampler ffill / interpolate('linear') / asfreq on
    random frames vs pandas resample().last().ffill() etc. — exercises
    empty buckets, all-null buckets, singleton series."""
    spark = fuzz_spark
    sdf = spark.createDataFrame(
        pdf, "rid long, ts timestamp, user_id long, value double"
    )
    tf = TsFrame(sdf, by="user_id", order_col="rid")

    for mode in ["ffill", "interp", "asfreq"]:
        r = tf.resample("1d")
        if mode == "ffill":
            got = r.ffill("value")
        elif mode == "interp":
            got = r.interpolate("value", method="linear")
        else:
            got = r.asfreq("value")
        got = (
            got.toPandas()
            .sort_values(["user_id", "bucket"])
            .reset_index(drop=True)
        )
        wants = []
        for uid, sub in pdf.sort_values(["ts", "rid"]).groupby("user_id"):
            if mode == "asfreq":
                # our asfreq resolves duplicate grid-point rows by the
                # order_col (pandas raises there) — emulate with a
                # keep-last dedup before pandas' own asfreq
                s = (
                    sub.drop_duplicates(subset="ts", keep="last")
                    .set_index("ts")["value"]
                    .resample("1D")
                    .asfreq()
                )
            else:
                s = sub.set_index("ts")["value"].resample("1D").last()
                if mode == "ffill":
                    s = s.ffill()
                else:
                    s = s.interpolate("linear")
            w = s.reset_index().rename(columns={"ts": "bucket"})
            w["user_id"] = uid
            wants.append(w)
        want = (
            pd.concat(wants)
            .sort_values(["user_id", "bucket"])
            .reset_index(drop=True)
        )
        assert len(got) == len(want), mode
        assert (got["bucket"].to_numpy() == want["bucket"].to_numpy()).all(), mode
        assert _eq(got["value"], want["value"]), mode


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pdf=frames(), cut_day=st.integers(2, 28), victims=st.sets(st.integers(0, 49), max_size=6))
def test_tsstore_maintenance_fuzz(fuzz_spark, pdf, cut_day, victims):
    """Store maintenance laws on random frames: optimize is layout-only
    (multiset preserved, file count shrinks or holds), delete_keys
    removes exactly the victim rows, drop_before removes exactly the
    strictly-older day partitions."""
    import glob
    import tempfile

    from pandas_tsdb_spark.store import TsStore

    spark = fuzz_spark
    store = TsStore(spark, tempfile.mkdtemp(prefix="fuzz_maint_"))
    sdf = spark.createDataFrame(
        pdf, "rid long, ts timestamp, user_id long, value double"
    )
    # two appends -> duplicate files per touched day, so optimize has
    # something to merge
    store.append("s", sdf, ingest_ts="2025-01-01 00:00:00")
    store.append("s", sdf, ingest_ts="2025-01-02 00:00:00")

    before = sorted(store.fetch("s").toPandas().rid)
    files_before = len(glob.glob(store.path("s") + "/*/*.parquet"))
    store.optimize("s", target_file_mb=128, min_files=2)
    after = sorted(store.fetch("s").toPandas().rid)
    files_after = len(glob.glob(store.path("s") + "/*/*.parquet"))
    assert after == before
    assert files_after <= files_before

    got = store.delete_keys("s", "rid", sorted(victims))
    remaining = store.fetch("s").toPandas()
    assert got == 2 * len(set(pdf.rid) & victims)
    assert set(remaining.rid) == set(pdf.rid) - victims

    cutoff = pd.Timestamp("2024-01-01") + pd.Timedelta(days=cut_day)
    store.drop_before("s", cutoff.strftime("%Y-%m-%d"))
    kept = store.fetch("s").toPandas()
    want = remaining[remaining.ts.dt.floor("D") >= cutoff.floor("D")]
    assert sorted(kept.rid) == sorted(want.rid)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pdf=frames())
def test_merge_ordered_fuzz_vs_pandas(fuzz_spark, pdf):
    """Seventh matrix: merge_ordered fill semantics vs pd.merge_ordered
    per series, for fill_method='ffill' AND None. The API contract is a
    unique-ts-per-side index (duplicate join keys cartesian on both
    engines but row order among duplicates is engine-private), so each
    side dedups timestamps keep-last-by-rid first — exactly the
    documented contract in api.py."""
    spark = fuzz_spark
    # left = odd rids, right = even rids: two overlapping event streams
    left = pdf[pdf["rid"] % 2 == 1].drop_duplicates(
        subset=["user_id", "ts"], keep="last"
    )
    right = pdf[pdf["rid"] % 2 == 0].drop_duplicates(
        subset=["user_id", "ts"], keep="last"
    )
    sl = spark.createDataFrame(
        left.rename(columns={"value": "lv"})[["user_id", "ts", "lv"]],
        "user_id long, ts timestamp, lv double",
    )
    sr = spark.createDataFrame(
        right.rename(columns={"value": "rv"})[["user_id", "ts", "rv"]],
        "user_id long, ts timestamp, rv double",
    )
    for fill in ["ffill", None]:
        tf = TsFrame(sl, by="user_id")
        got = (
            tf.merge_ordered(sr, ["lv"], ["rv"], fill_method=fill)
            .to_df()
            .toPandas()
            .sort_values(["user_id", "ts"])
            .reset_index(drop=True)
        )
        wants = []
        users = sorted(
            set(left["user_id"]).union(set(right["user_id"]))
        )
        for uid in users:
            lu = left[left["user_id"] == uid].rename(columns={"value": "lv"})
            ru = right[right["user_id"] == uid].rename(columns={"value": "rv"})
            w = pd.merge_ordered(
                lu[["ts", "lv"]].sort_values("ts"),
                ru[["ts", "rv"]].sort_values("ts"),
                on="ts",
                fill_method=fill,
            )
            w["user_id"] = uid
            wants.append(w)
        want = (
            pd.concat(wants)
            .sort_values(["user_id", "ts"])
            .reset_index(drop=True)
        )
        assert len(got) == len(want), fill
        assert (got["ts"].to_numpy() == want["ts"].to_numpy()).all(), fill
        assert _eq(got["lv"], want["lv"]), fill
        assert _eq(got["rv"], want["rv"]), fill


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pdf=frames())
def test_describe_fuzz_vs_pandas(fuzz_spark, pdf):
    """Eighth matrix: describe() per series AND global (by=None — the
    round-2 literal-column-leak fix) vs pandas describe: count/mean/std/
    min/p25/p50/p75/max on frames with all-null series, singletons, and
    constant runs. Spark's exact percentile and pandas both interpolate
    linearly."""
    spark = fuzz_spark
    sdf = spark.createDataFrame(
        pdf, "rid long, ts timestamp, user_id long, value double"
    )
    cols = ["count", "mean", "std", "min", "p25", "p50", "p75", "max"]
    # grouped
    got = (
        TsFrame(sdf, by="user_id", order_col="rid")
        .describe("value")
        .toPandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    want = (
        pdf.groupby("user_id")["value"]
        .describe()
        .rename(columns={"25%": "p25", "50%": "p50", "75%": "p75"})
        .reset_index()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert (got["user_id"].to_numpy() == want["user_id"].to_numpy()).all()
    for c in cols:
        assert _eq(got[c], want[c]), c
    # global (by=None): schema must be exactly the 8 stats
    gg = TsFrame(sdf, by=None, order_col="rid").describe("value").toPandas()
    assert list(gg.columns) == cols
    wd = pdf["value"].describe()
    for c, pc in zip(cols, ["count", "mean", "std", "min", "25%", "50%", "75%", "max"]):
        assert _eq(gg[c], pd.Series([wd[pc]])), c
