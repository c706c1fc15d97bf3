"""Internal cross-checks for the non-SQL-expressible time-series ops
(SURVEY.md §5.5): two independent implementations must agree.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from pandas_tsdb_spark.registry import load_all

SPECS = load_all()
SMALL = "/root/testdata/sf0.001"


def _sorted_pdf(df, keys):
    return df.toPandas().sort_values(keys).reset_index(drop=True)


def test_asof_cogroup_matches_window_plan(spark, sf_dir):
    # sf0.01 matters: it contains users with zero purchases (empty cogroup side)
    a = _sorted_pdf(
        SPECS["join_asof"].builder(spark, sf_dir).drop("last_purchase_value_3d"),
        ["event_id"],
    )
    b = _sorted_pdf(SPECS["join_asof_cogroup"].builder(spark, sf_dir), ["event_id"])
    pd.testing.assert_frame_equal(a[sorted(a.columns)], b[sorted(b.columns)])


def test_asof_invariant_right_ts_lte_left(spark):
    out = SPECS["join_asof"].builder(spark, SMALL)
    ev = out.sparkSession.read.parquet(f"{SMALL}/events.parquet")
    # matched purchase id must reference an earlier-or-equal event_id's ts
    joined = (
        out.filter(F.col("last_purchase_id").isNotNull())
        .join(
            ev.selectExpr("event_id AS last_purchase_id", "ts AS p_ts_ns"),
            "last_purchase_id",
        )
        .join(ev.selectExpr("event_id", "ts AS e_ts_ns"), "event_id")
    )
    assert joined.filter(F.col("p_ts_ns") > F.col("e_ts_ns")).count() == 0


def test_ewm_matches_closed_form(spark):
    """applyInPandas ewm vs the closed-form two-window-sum formulation."""
    alpha = 0.3
    got = _sorted_pdf(SPECS["win_ewm"].builder(spark, SMALL), ["user_id", "event_id"])

    ev = SPECS["win_ewm"].builder(spark, SMALL).sparkSession  # session handle
    from pandas_tsdb_spark.catalog import Tables

    df = Tables(ev, SMALL).events.select("user_id", "event_id", "value")
    w = W.partitionBy("user_id").orderBy("event_id")
    # ewm_t = sum_i x_i (1-a)^(t-i) / sum_i (1-a)^(t-i), via n = row_number
    n = F.row_number().over(w)
    p = 1 - alpha
    wf = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    num = F.sum(F.col("value") * F.pow(F.lit(1 / p), n)).over(wf)
    den = F.sum(F.pow(F.lit(1 / p), n)).over(wf)
    closed = (
        df.withColumn("n", n)
        .withColumn("ewm_closed", num / den)
        .select("user_id", "event_id", "ewm_closed")
    )
    ref = _sorted_pdf(closed, ["user_id", "event_id"])
    assert np.allclose(got["ewm_value"], ref["ewm_closed"], rtol=1e-8)


def test_ffill_partitions_time_axis(spark):
    out = SPECS["win_resample_ffill"].builder(spark, SMALL)
    pdf = out.toPandas()
    n_users = pdf["user_id"].nunique()
    n_days = pdf["day"].nunique()
    assert len(pdf) == n_users * n_days  # dense grid
    # forward fill: once a user has a value, close_ffill never reverts to null
    pdf = pdf.sort_values(["user_id", "day"])
    for _, g in pdf.groupby("user_id"):
        seen = g["close_ffill"].notna().to_numpy()
        assert not (seen[:-1] & ~seen[1:]).any()


def test_rolling_skew_matches_pandas(spark, sf_dir):
    """win_rolling_skew vs pandas rolling(7).skew(): same null mask,
    values to float tolerance (engine computes on exact integer cents,
    pandas on the raw doubles — identical data, different order)."""
    import numpy as np
    import pandas as pd

    from pandas_tsdb_spark.registry import load_all

    specs = load_all()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet").sort_values(
        ["user_id", "event_id"]
    )
    exp = (
        ev.groupby("user_id")["value"]
        .rolling(7, min_periods=7)
        .skew()
        .reset_index(level=0, drop=True)
    )
    expdf = pd.DataFrame({"event_id": ev.event_id.values, "exp": exp.values})
    out = specs["win_rolling_skew"].builder(spark, sf_dir).toPandas()
    mg = out.merge(expdf, on="event_id")
    assert len(mg) == len(ev)
    assert (mg.roll_skew.isna() == mg.exp.isna()).all()
    both = mg.roll_skew.notna()
    assert float((mg.loc[both, "roll_skew"] - mg.loc[both, "exp"]).abs().max()) < 1e-9


def test_rolling_kurt_matches_pandas(spark, sf_dir):
    """win_rolling_kurt vs pandas rolling(7).kurt(): same null mask,
    values to float tolerance (engine: exact integer-cents power sums;
    pandas: Welford-style on raw doubles)."""
    import pandas as pd

    from pandas_tsdb_spark.registry import load_all

    specs = load_all()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet").sort_values(
        ["user_id", "event_id"]
    )
    exp = (
        ev.groupby("user_id")["value"]
        .rolling(7, min_periods=7)
        .kurt()
        .reset_index(level=0, drop=True)
    )
    expdf = pd.DataFrame({"event_id": ev.event_id.values, "exp": exp.values})
    out = specs["win_rolling_kurt"].builder(spark, sf_dir).toPandas()
    mg = out.merge(expdf, on="event_id")
    assert len(mg) == len(ev)
    assert (mg.roll_kurt.isna() == mg.exp.isna()).all()
    both = mg.roll_kurt.notna()
    assert float((mg.loc[both, "roll_kurt"] - mg.loc[both, "exp"]).abs().max()) < 1e-9


def test_upsample_epoch_counts(spark, sf_dir):
    """pipeline_upsample: per-source epoch multiplicity matches the
    declared weights — every doc of srcN appears exactly `whole` or
    `whole+1` times, the fractional share lands near its target, and
    epoch ordinals are dense 0..reps-1."""
    from pandas_tsdb_spark.operators.pipeline import UPSAMPLE, UPSAMPLE_DEFAULT
    from pandas_tsdb_spark.registry import load_all

    specs = load_all()
    out = specs["pipeline_upsample"].builder(spark, sf_dir).toPandas()
    per_doc = out.groupby(["source", "doc_id"]).epoch.agg(["count", "min", "max"])
    assert (per_doc["min"] == 0).all()
    assert (per_doc["max"] == per_doc["count"] - 1).all()  # dense ordinals
    for src, g in per_doc.groupby(level="source"):
        whole, thr = UPSAMPLE.get(src, UPSAMPLE_DEFAULT)
        assert set(g["count"]).issubset({whole, whole + 1} - {0})
        if thr == "//":
            assert (g["count"] == whole).all()


def test_entropy_invariants(spark, sf_dir):
    """0 <= H <= ln(n_sources); normalized entropy in [0, 1]."""
    import numpy as np

    from pandas_tsdb_spark.registry import load_all

    out = load_all()["agg_entropy"].builder(spark, sf_dir).toPandas()
    assert len(out) > 0
    assert (out.entropy >= 0).all()
    assert (out.entropy <= np.log(out.n_sources) + 1e-9).all()
    assert out.norm_entropy.between(0, 1 + 1e-9).all()


def test_rolling_quantile_matches_pandas(spark, sf_dir):
    """win_rolling_quantile vs pandas rolling(7).quantile(q, 'linear')
    for q=0.25/0.75: same null mask, same lerp values."""
    import pandas as pd

    from pandas_tsdb_spark.registry import load_all

    specs = load_all()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet").sort_values(
        ["user_id", "event_id"]
    )
    out = specs["win_rolling_quantile"].builder(spark, sf_dir).toPandas()
    for q, col in [(0.25, "roll_q25"), (0.75, "roll_q75")]:
        exp = (
            ev.groupby("user_id")["value"]
            .rolling(7, min_periods=7)
            .quantile(q, interpolation="linear")
            .reset_index(level=0, drop=True)
        )
        mg = out.merge(
            pd.DataFrame({"event_id": ev.event_id.values, "exp": exp.values}),
            on="event_id",
        )
        assert (mg[col].isna() == mg.exp.isna()).all()
        both = mg[col].notna()
        assert float((mg.loc[both, col] - mg.loc[both, "exp"]).abs().max()) < 1e-12


def test_rolling_slope_matches_numpy(spark, sf_dir):
    """win_rolling_slope vs numpy polyfit per 20-row frame: same null
    mask, slopes to relative tolerance (engine uses exact integer-cents
    sums; polyfit solves the same least squares in doubles)."""
    specs = load_all()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet").sort_values(
        ["user_id", "event_id"]
    )
    out = specs["win_rolling_slope"].builder(spark, sf_dir).toPandas()
    mg = out.merge(
        ev[["event_id", "user_id", "ts", "value"]], on=["event_id", "user_id"]
    ).sort_values(["user_id", "event_id"])
    assert len(mg) == len(ev)

    checked = 0
    for _, g in mg.groupby("user_id"):
        if len(g) < 20:
            assert g.slope_per_day.isna().all()
            continue
        x_days = (
            g.ts.astype("datetime64[ns]").astype("int64") // 1000
            - 1_704_067_200_000_000
        ).to_numpy() / 86_400_000_000.0
        y = g.value.to_numpy()
        got = g.slope_per_day.to_numpy()
        assert np.isnan(got[:19]).all()
        for i in range(19, min(len(g), 19 + 40)):  # spot-check 40 frames
            sl = np.polyfit(x_days[i - 19 : i + 1], y[i - 19 : i + 1], 1)[0]
            assert got[i] == pytest.approx(sl, rel=1e-6, abs=1e-9)
            checked += 1
    assert checked > 100


def test_cusum_matches_literal_recursion(spark, sf_dir):
    """win_cusum's reflection-identity windows vs the textbook
    recursion S_i = max(0, S_{i-1} + (x_i - mean)) run literally in
    pandas — proves the identity, not just the oracle mirror."""
    specs = load_all()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet").sort_values(
        ["user_id", "event_id"]
    )
    out = specs["win_cusum"].builder(spark, sf_dir).toPandas()
    mg = out.merge(ev[["event_id", "user_id", "value"]], on=["event_id", "user_id"])
    mg = mg.sort_values(["user_id", "event_id"])
    assert len(mg) == len(ev)
    for _, g in mg.groupby("user_id"):
        cents = (g.value * 100).round().astype("int64").to_numpy()
        n = len(cents)
        d = n * cents - cents.sum()  # n*(x - mean), exact ints
        s, exp = 0, []
        for di in d:
            s = max(0, s + int(di))
            exp.append(s / (100.0 * n))
        got = g.cusum.to_numpy()
        assert np.allclose(got, exp, rtol=1e-12, atol=1e-12)


def test_holt_matches_reference_loop(spark, sf_dir):
    """Distributed win_holt (mapInPandas + cross-batch carry) vs a
    single-process reference recurrence over the whole fixture — checks
    ordering, batch-boundary state carry, and the seed convention.
    sf0.01 matters: more users than shuffle partitions, so partitions
    hold many series and Arrow batches split some of them."""
    got = _sorted_pdf(
        SPECS["win_holt"].builder(spark, sf_dir), ["user_id", "event_id"]
    )
    ev = (
        pd.read_parquet(f"{sf_dir}/events.parquet")[
            ["user_id", "event_id", "value"]
        ]
        .sort_values(["user_id", "event_id"])
        .reset_index(drop=True)
    )
    alpha, gamma = 0.5, 0.3
    ref = np.empty(len(ev))
    state: dict[int, tuple[float, float, int, float]] = {}
    for i, (u, x) in enumerate(zip(ev["user_id"].to_numpy(), ev["value"].to_numpy())):
        u, x = int(u), float(x)
        lev, tr, n, x0 = state.get(u, (0.0, 0.0, 0, 0.0))
        if n == 0:
            state[u] = (x, 0.0, 1, x)
            ref[i] = x
        elif n == 1:
            tr = x - x0
            lev = alpha * x + (1.0 - alpha) * (x0 + tr)
            tr = gamma * (lev - x0) + (1.0 - gamma) * tr
            state[u] = (lev, tr, 2, x0)
            ref[i] = lev
        else:
            prev = lev
            lev = alpha * x + (1.0 - alpha) * (lev + tr)
            tr = gamma * (lev - prev) + (1.0 - gamma) * tr
            state[u] = (lev, tr, n + 1, x0)
            ref[i] = lev
    assert np.allclose(got["holt_level"].to_numpy(), ref, rtol=1e-12, atol=1e-12)
    # level tracks the series: correlation with the input is strong
    assert np.corrcoef(got["holt_level"], got["value"])[0, 1] > 0.5


def test_lttb_shape_invariants(spark, sf_dir):
    """LTTB per series: endpoints kept, at most 100 points, exactly the
    input rows (a SELECTION, never synthesized values), one point per
    interior bucket when the series is long enough."""
    got = SPECS["win_downsample_lttb"].builder(spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")[
        ["user_id", "event_id", "value"]
    ]
    merged = got.merge(ev, on=["user_id", "event_id"], suffixes=("", "_src"))
    assert len(merged) == len(got)  # selection only
    assert np.allclose(merged["value"], merged["value_src"])
    per = got.groupby("user_id")["event_id"].agg(["count", "min", "max"])
    src = ev.groupby("user_id")["event_id"].agg(["count", "min", "max"])
    joined = per.join(src, lsuffix="_out", rsuffix="_src")
    assert (joined["count_out"] <= 100).all()
    # endpoints preserved
    assert (joined["min_out"] == joined["min_src"]).all()
    assert (joined["max_out"] == joined["max_src"]).all()
    # long series downsample to exactly 100
    long_series = joined[joined["count_src"] > 100]
    assert (long_series["count_out"] == 100).all()


def test_m4_invariants(spark, sf_dir):
    """M4 bucket stats are internally consistent: vmin <= vfirst,
    vlast <= vmax, extent ordered, at most 100 buckets per series, and
    total n equals the series row count (a partition of the series)."""
    out = SPECS["win_downsample_m4"].builder(spark, sf_dir).toPandas()
    assert (out["vmin"] <= out["vfirst"]).all()
    assert (out["vmin"] <= out["vlast"]).all()
    assert (out["vfirst"] <= out["vmax"]).all()
    assert (out["vlast"] <= out["vmax"]).all()
    assert (out["t_start_us"] <= out["t_end_us"]).all()
    per = out.groupby("user_id").agg(nb=("bucket", "count"), n=("n", "sum"))
    assert (per["nb"] <= 100).all()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    src = ev.groupby("user_id").size()
    assert per["n"].sort_index().equals(src.sort_index())


def test_decompose_reconstruction_identity(spark, sf_dir):
    """Additive decomposition law: wherever trend is defined,
    daily_sum == trend + seasonal + resid to float round-trip, and
    seasonal means sum to ~0 across each series' weekdays."""
    import numpy as np

    from pandas_tsdb_spark.registry import load_all

    out = (
        load_all()["win_decompose"].builder(spark, sf_dir)
        .toPandas()
        .sort_values(["user_id", "day_us"])
    )
    have = out[out.trend.notna()]
    assert len(have) > 0
    recon = have.trend + have.seasonal + have.resid
    assert np.allclose(recon, have.daily_sum, rtol=1e-12, atol=1e-9)
    # trend-null rows still get their weekday's seasonal
    assert out[out.trend.isna()].seasonal.notna().any()


def test_holt_blas_matches_sequential_kernel(spark, sf_dir):
    """win_holt_blas's block-Toeplitz formulation must reproduce the
    sequential Holt kernel to float tolerance (different fold order,
    same recurrence; impulse response decays ~0.707^k so error stays
    at rounding level)."""
    import numpy as np

    from pandas_tsdb_spark.registry import load_all

    specs = load_all()
    a = (
        specs["win_holt"].builder(spark, sf_dir)
        .toPandas().sort_values("event_id").reset_index(drop=True)
    )
    b = (
        specs["win_holt_blas"].builder(spark, sf_dir)
        .toPandas().sort_values("event_id").reset_index(drop=True)
    )
    assert len(a) == len(b)
    assert np.allclose(a.holt_level, b.holt_level, rtol=1e-9, atol=1e-9)


def test_ewm_null_semantics_match_oracle(spark, tmp_path):
    """The round-3 review flagged win_ewm's NaN branch as latent (the
    fixture is null-free): drive the kernel AND the recursive-CTE
    oracle over a null-injected copy of events — nulls must advance the
    decay without contributing (pandas ignore_na=False), all-null
    prefixes must emit NULL, and null input values must round-trip as
    nulls, bit-identically on both engines."""
    import duckdb

    ev = SPECS["win_ewm"].builder(spark, SMALL).sparkSession.read.parquet(
        f"{SMALL}/events.parquet"
    )
    # nulls sprinkled mid-series AND a guaranteed all-null prefix: the
    # lowest event_ids of user 0 (fixture event_ids ascend per user)
    import pyspark.sql.functions as F

    holey = (
        ev.withColumn(
            "value",
            F.when(
                (F.col("event_id") % 7 == 0)
                | ((F.col("user_id") == 0) & (F.col("event_id") < 70)),
                F.lit(None).cast("double"),
            ).otherwise(F.col("value")),
        )
    )
    # builder reads {sf_dir}/events.parquet — stage the holey copy in
    # the single-file fixture layout
    import glob
    import os
    import shutil

    d = str(tmp_path / "holey")
    holey.coalesce(1).write.parquet(d)
    stage = str(tmp_path / "sf_holey")
    os.makedirs(stage)
    part = glob.glob(f"{d}/part-*.parquet")[0]
    shutil.copy(part, f"{stage}/events.parquet")

    spdf = (
        SPECS["win_ewm"].builder(spark, stage)
        .toPandas()
        .sort_values(["user_id", "event_id"])
        .reset_index(drop=True)
        .astype(str)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{stage}/events.parquet')"
    )
    dpdf = (
        con.execute(SPECS["win_ewm"].oracle)
        .fetchdf()
        .sort_values(["user_id", "event_id"])
        .reset_index(drop=True)
        .astype(str)
    )
    assert list(spdf.columns) == list(dpdf.columns) or set(spdf.columns) == set(dpdf.columns)
    for c in ["user_id", "event_id", "value", "ewm_value"]:
        assert (spdf[c] == dpdf[c]).all(), c
    # the all-null prefix really exercised the den==0 path: the Spark
    # result holds true NULLs (not NaN) for user 0's first rows
    prefix_nulls = (
        SPECS["win_ewm"].builder(spark, stage)
        .filter("user_id = 0 AND event_id < 70 AND ewm_value IS NULL")
        .count()
    )
    assert prefix_nulls >= 1


def test_kalman_null_semantics_match_oracle(spark, tmp_path):
    """win_kalman (nonlinear recurrence, recursive-CTE oracle) under
    nulls: missing observations carry the level and grow the
    covariance; all-null prefixes seed at the first real value — the
    kernel and the CTE must agree bit for bit on a holey events copy,
    like the win_ewm law."""
    import duckdb
    import glob
    import os
    import shutil

    import pyspark.sql.functions as F

    ev = spark.read.parquet(f"{SMALL}/events.parquet")
    holey = ev.withColumn(
        "value",
        F.when(
            (F.col("event_id") % 5 == 0)
            | ((F.col("user_id") == 0) & (F.col("event_id") < 70)),
            F.lit(None).cast("double"),
        ).otherwise(F.col("value")),
    )
    d = str(tmp_path / "holey")
    holey.coalesce(1).write.parquet(d)
    stage = str(tmp_path / "sf_holey")
    os.makedirs(stage)
    shutil.copy(glob.glob(f"{d}/part-*.parquet")[0], f"{stage}/events.parquet")
    spdf = (
        SPECS["win_kalman"].builder(spark, stage)
        .toPandas()
        .sort_values(["user_id", "event_id"])
        .reset_index(drop=True)
        .astype(str)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{stage}/events.parquet')"
    )
    dpdf = (
        con.execute(SPECS["win_kalman"].oracle)
        .fetchdf()
        .sort_values(["user_id", "event_id"])
        .reset_index(drop=True)
        .astype(str)
    )
    for c in ["user_id", "event_id", "value", "kalman_level"]:
        assert (spdf[c] == dpdf[c]).all(), c


def _stage_holey_events(spark, tmp_path, every: int):
    """Null-inject the sf0.001 events fixture (every Nth event_id plus an
    all-null prefix for user 0) and stage it in the single-file fixture
    layout the builders read, returning the stage dir."""
    import glob
    import os
    import shutil

    ev = spark.read.parquet(f"{SMALL}/events.parquet")
    holey = ev.withColumn(
        "value",
        F.when(
            (F.col("event_id") % every == 0)
            | ((F.col("user_id") == 0) & (F.col("event_id") < 70)),
            F.lit(None).cast("double"),
        ).otherwise(F.col("value")),
    )
    d = str(tmp_path / "holey")
    holey.coalesce(1).write.parquet(d)
    stage = str(tmp_path / "sf_holey")
    os.makedirs(stage)
    shutil.copy(glob.glob(f"{d}/part-*.parquet")[0], f"{stage}/events.parquet")
    return stage


def _assert_kernel_matches_oracle_on(spark, stage, name, cols):
    import duckdb

    spdf = (
        SPECS[name].builder(spark, stage)
        .toPandas()
        .sort_values(["user_id", "event_id"])
        .reset_index(drop=True)
        .astype(str)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{stage}/events.parquet')"
    )
    dpdf = (
        con.execute(SPECS[name].oracle)
        .fetchdf()
        .sort_values(["user_id", "event_id"])
        .reset_index(drop=True)
        .astype(str)
    )
    assert len(spdf) == len(dpdf)
    for c in cols:
        assert (spdf[c] == dpdf[c]).all(), f"{name}.{c}"
    return spdf


def test_rsi_null_semantics_match_oracle(spark, tmp_path):
    """Round-4 ADVICE fix: a NULL value used to freeze the kernel's
    gain/loss state while the oracle's CASE advanced the decay with
    gain=loss=0. Both now advance (Wilder missing-bar convention);
    only a series' true first row (rn=1) emits NULL. Bit-identical on
    a null-injected events copy."""
    stage = _stage_holey_events(spark, tmp_path, every=7)
    spdf = _assert_kernel_matches_oracle_on(
        spark, stage, "win_rsi",
        ["user_id", "event_id", "avg_gain", "avg_loss", "rsi"],
    )
    # null rows at rn>=2 emit ADVANCED (non-null) averages — the fix
    adv = SPECS["win_rsi"].builder(spark, stage).filter(
        "user_id = 0 AND event_id >= 70 AND avg_gain IS NOT NULL"
    )
    assert adv.count() > 0


def test_holt_null_semantics_match_oracle(spark, tmp_path):
    """win_holt under nulls: the recurrence is POISONED from the first
    null on (NaN kernel-side, NULL CTE-side, same rows) — and the
    round-4 emit fix converts the Arrow NaNs to true SQL nulls so both
    engines agree representation-for-representation."""
    stage = _stage_holey_events(spark, tmp_path, every=11)
    _assert_kernel_matches_oracle_on(
        spark, stage, "win_holt",
        ["user_id", "event_id", "value", "holt_level"],
    )
    # poisoned tail is true SQL NULL (IS NULL), not Arrow NaN
    poisoned = SPECS["win_holt"].builder(spark, stage).filter(
        "user_id = 0 AND holt_level IS NULL"
    )
    assert poisoned.count() > 0


def test_macd_null_semantics_match_oracle(spark, tmp_path):
    """win_macd under nulls: same poison-forward law as win_holt across
    all three output series, emitted as true SQL nulls."""
    stage = _stage_holey_events(spark, tmp_path, every=13)
    _assert_kernel_matches_oracle_on(
        spark, stage, "win_macd",
        ["user_id", "event_id", "macd", "macd_signal", "macd_hist"],
    )
    poisoned = SPECS["win_macd"].builder(spark, stage).filter(
        "user_id = 0 AND macd IS NULL"
    )
    assert poisoned.count() > 0


def test_poison_crosses_arrow_batches(spark, tmp_path):
    """Round-5 ADVICE fix (the cross-batch NaN gate): a null early in a
    series poisons the carried recurrence state, so a LATER Arrow batch
    whose input is all-finite still produces NaN outputs from the carry.
    The emit gate must key on the OUTPUT arrays, not the current batch's
    input — otherwise those rows ship as Arrow NaN doubles (IS NULL
    false) while the oracle yields SQL NULL. Force tiny Arrow batches so
    user 0's poisoned series definitely spans batch boundaries, then
    assert the Spark-side IS NULL count equals the oracle's NULL count
    for every poisoned output column of win_holt and win_macd."""
    import duckdb

    # nulls ONLY in user 0's prefix (every=10**9 disables the modular
    # nulls except event_id 0): later batches of user 0 are all-finite
    # input but NaN-poisoned carry — exactly the latent path.
    stage = _stage_holey_events(spark, tmp_path, every=10**9)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{stage}/events.parquet')"
    )
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "16")
    try:
        # sanity: user 0 has enough rows that 16-row batches split it
        n_u0 = spark.read.parquet(f"{stage}/events.parquet").filter(
            "user_id = 0"
        ).count()
        assert n_u0 > 32

        for name, out_cols in [
            ("win_holt", ["holt_level"]),
            ("win_macd", ["macd", "macd_signal", "macd_hist"]),
        ]:
            sdf = SPECS[name].builder(spark, stage)
            dpdf = con.execute(SPECS[name].oracle).fetchdf()
            for c in out_cols:
                spark_nulls = sdf.filter(f"{c} IS NULL").count()
                oracle_nulls = int(dpdf[c].isna().sum())
                assert spark_nulls == oracle_nulls, (
                    f"{name}.{c}: spark IS NULL {spark_nulls} "
                    f"!= oracle NULL {oracle_nulls}"
                )
                # the poison really spans batches: far more nulls than
                # one 16-row batch could hold
                assert spark_nulls > 16, f"{name}.{c} poison too short"
    finally:
        if old is None:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


_NULL_SWEEP_OPS = [
    # every events-only-oracle op in the window/resample/merge family,
    # run builder-vs-oracle on a null-injected events copy (round-5
    # verdict item: the driver fixture is null-free, so null semantics
    # were latent). Caught and fixed by this sweep: max_by vs arg_max
    # null skipping (resample ffill/interp/ohlc/hour, merge_ordered
    # sides), upsert_cdc's coalesce resurrecting stale base values,
    # merge_ordered's oracle filling last-VALUE instead of last-ROW.
    "win_cusum", "win_drawdown", "win_bollinger", "win_trend", "win_twa",
    "win_decompose", "win_autocorr", "win_xcorr", "win_counter_rate",
    "win_interp_time", "win_resample_interp", "win_resample_ffill",
    "win_resample_ohlc", "win_resample_hour", "win_resample_asfreq",
    # (win_resample_month/wmon read orders, not events — outside the
    # events-injection harness; their value column is TPC-H NOT NULL)
    "win_seasonal_dow",
    "ts_outlier_mad", "win_downsample_m4", "align_series",
    "rollup_continuous", "join_merge_ordered", "upsert_cdc",
    # round-5 broad sweep (all 68 events-only-oracle queries): the ten
    # that diverged, now fixed — argmax struct null-fields (fn_struct),
    # pandas-cumsum poison in the stateful stream kernel, presence-
    # struct as-of fills, rank-family null ordering + rank-among-
    # non-null, and count(value)-based rolling-frame fullness.
    "fn_struct", "stream_stateful", "join_asof", "join_asof_directions",
    "win_rank_avg", "win_rolling_median", "win_rolling_quantile",
    "win_ntile_percent", "win_rolling_rank",
]


@pytest.fixture(scope="module")
def holey_stage(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("holey_sweep")
    return _stage_holey_events(spark, tmp, every=7)


@pytest.mark.parametrize("name", _NULL_SWEEP_OPS)
def test_null_injection_differential(spark, holey_stage, name):
    """Builder vs DuckDB oracle on the null-injected events fixture —
    the same comparison the driver runs, over data the driver never
    feeds it. Any engine-pair null-semantics divergence (SQL NULL vs
    Arrow NaN, skip-vs-propagate, presence-vs-value fills) fails here
    first."""
    import duckdb

    from tests.harness import compare

    spec = SPECS[name]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{holey_stage}/events.parquet')"
    )
    sp = spec.builder(spark, holey_stage).toPandas()
    du = con.execute(spec.oracle).fetchdf()
    errs = compare(sp, du, name)
    assert not errs, errs[:5]
