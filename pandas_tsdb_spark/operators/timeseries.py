"""§2.3 join_asof + §2.5 resample-ffill / ewm + §2.11 UDF surface — the
pandas time-series operations with no native Spark operator.

Key designs:

- ``join_asof`` (pd.merge_asof): union-and-window. Tag right rows, union
  with left rows, one window per series ordered by (ts, side, event_id)
  with ``last(value, ignorenulls=True)``. ONE shuffle on the series key,
  no range explosion, no per-key driver loop — this is the 100 TB path
  (the alternative, range-join + row_number, re-materializes every
  candidate pair). Right rows sort BEFORE left rows at equal ts, giving
  merge_asof's inclusive ``right.ts <= left.ts`` semantics; event_id
  breaks ts ties deterministically (latest wins, matching the oracle's
  ``ORDER BY ts DESC, event_id DESC LIMIT 1``).

- ``win_resample_ffill``: calendar densification. Build the day grid
  with sequence()+explode from the data's own min/max (broadcast 1-row
  agg), cross join the user dimension, left-join the per-day aggregate,
  then forward-fill with last(ignorenulls) over the day order. All
  DataFrame ops; grid size is days x users, shuffled once by user.

- ``win_ewm`` (pandas ewm().mean(): recursive, not frame-expressible):
  ``applyInPandas`` per series — exact pandas semantics, Arrow-batched,
  scales per-key (each user's series is one pandas kernel call). The
  closed-form two-window-sum variant is numerically unstable for long
  series ((1-a)^-n overflows), so it exists only as a test cross-check
  (tests/test_timeseries.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from pandas_tsdb_spark.catalog import Tables, _nn_key
from pandas_tsdb_spark.registry import query

_US_3D = 3 * 86_400 * 1_000_000

ASOF_ORACLE = """
SELECT e.event_id, e.user_id, e.value,
       (SELECT p.value FROM events p
         WHERE p.user_id = e.user_id AND p.event_type = 'purchase'
           AND p.ts <= e.ts
         ORDER BY p.ts DESC, p.event_id DESC LIMIT 1) AS last_purchase_value,
       (SELECT p.event_id FROM events p
         WHERE p.user_id = e.user_id AND p.event_type = 'purchase'
           AND p.ts <= e.ts
         ORDER BY p.ts DESC, p.event_id DESC LIMIT 1) AS last_purchase_id,
       (SELECT p.value FROM events p
         WHERE p.user_id = e.user_id AND p.event_type = 'purchase'
           AND p.ts <= e.ts AND p.ts >= e.ts - INTERVAL 3 DAY
         ORDER BY p.ts DESC, p.event_id DESC LIMIT 1) AS last_purchase_value_3d
FROM events e
"""


@query("join_asof", oracle=ASOF_ORACLE)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pd.merge_asof(events, purchases, on=ts, by=user_id,
    tolerance=3d-variant) via union-and-window (see module docstring)."""
    # ONE spark.sql() call (r9-opt, catalog.Tables.sql_views): 118 ms
    # of per-call plan construction -> ~55 ms; identical union-window
    # tree.
    w = (
        "OVER (PARTITION BY user_id ORDER BY ts, side, event_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    )
    # presence-struct fill (round-5 null sweep): pandas merge_asof
    # matches the last purchase ROW — a matched row whose value is NULL
    # yields NULL. last(r_value, true) would skip null-valued purchases
    # and surface an OLDER purchase's value; wrapping the right row in a
    # struct (non-null whenever the row exists) makes ignorenulls skip
    # only left rows, never null-valued right rows.
    last_st = (
        "last(CASE WHEN side = 0 THEN named_struct("
        "'v', r_value, 'eid', r_event_id, 'tus', r_ts_us) END, true) " + w
    )
    v = Tables(spark, sf_dir).sql_views()
    return spark.sql(f"""
    WITH l AS (SELECT user_id, ts, event_id, value, 1 AS side,
                      cast(null as double) AS r_value,
                      cast(null as bigint) AS r_event_id,
                      cast(null as bigint) AS r_ts_us
               FROM {v}events),
    r AS (SELECT user_id, ts, event_id, cast(null as double) AS value,
                 0 AS side, value AS r_value, event_id AS r_event_id,
                 unix_micros(ts) AS r_ts_us
          FROM {v}events WHERE event_type = 'purchase'),
    u AS (SELECT * FROM l UNION ALL SELECT * FROM r),
    s AS (SELECT event_id, user_id, value, side,
                 ({last_st}).v AS last_purchase_value,
                 ({last_st}).eid AS last_purchase_id,
                 CASE WHEN unix_micros(ts) - ({last_st}).tus <= {_US_3D}
                 THEN ({last_st}).v END AS last_purchase_value_3d
          FROM u)
    SELECT event_id, user_id, value, last_purchase_value,
           last_purchase_id, last_purchase_value_3d
    FROM s WHERE side = 1
    """)


@query(
    "join_asof_cogroup",
    oracle="""
    SELECT e.event_id, e.user_id, e.value,
           (SELECT p.value FROM events p
             WHERE p.user_id = e.user_id AND p.event_type = 'purchase'
               AND p.ts <= e.ts
             ORDER BY p.ts DESC, p.event_id DESC LIMIT 1)
               AS last_purchase_value,
           (SELECT p.event_id FROM events p
             WHERE p.user_id = e.user_id AND p.event_type = 'purchase'
               AND p.ts <= e.ts
             ORDER BY p.ts DESC, p.event_id DESC LIMIT 1)
               AS last_purchase_id
    FROM events e
    """,
)
def join_asof_cogroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same as-of join, implemented with cogrouped applyInPandas calling
    pd.merge_asof per key (§2.11 cogroup surface). Round-3 upgrade from
    rows-only: the op carries join_asof's correlated-subquery oracle
    minus the tolerance column (raw parquet doubles pass through the
    Arrow kernel bit-identically), so the pandas-kernel path is now
    hash-checked directly, not just equal-to-join_asof-tested. The
    union-and-window plan stays the production path (one window vs an
    Arrow round-trip per key)."""
    # The right side gets its OWN scan and uniquely-named columns: when
    # both cogroup children share attribute ids (self-cogroup off one
    # DataFrame), the duplicated `ts` attribute can be deduplicated out
    # of the right child's row — observed with a driver-owned plain
    # session, where the right kernel frame arrived without `ts`.
    left = Tables(spark, sf_dir).events.select("user_id", "ts", "event_id", "value")
    right = (
        Tables(spark, sf_dir)
        .events.filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("ts").alias("r_ts"),
            F.col("value").alias("last_purchase_value"),
            F.col("event_id").alias("last_purchase_id"),
        )
    )

    out_cols = ["event_id", "user_id", "value", "last_purchase_value", "last_purchase_id"]

    def merge(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        # a key missing on one side arrives as a ZERO-COLUMN frame
        if l.shape[1] == 0 or l.empty:
            return pd.DataFrame({c: [] for c in out_cols})
        l = l.sort_values(["ts", "event_id"])
        if r.shape[1] == 0 or r.empty:
            out = l.assign(last_purchase_value=pd.NA, last_purchase_id=pd.NA)
            return out[out_cols]
        # stable sort keeps the highest event_id last within equal ts, so
        # merge_asof's "last matching row" == the oracle's DESC LIMIT 1.
        r = r.sort_values(["r_ts", "last_purchase_id"], kind="stable").drop(columns=["user_id"])
        out = pd.merge_asof(l, r, left_on="ts", right_on="r_ts", direction="backward")
        return out[out_cols]

    return (
        left.groupBy("user_id")
        .cogroup(right.groupBy("user_id"))
        .applyInPandas(
            lambda l, r: merge(l, r),
            "event_id long, user_id long, value double, "
            "last_purchase_value double, last_purchase_id long",
        )
    )


FFILL_ORACLE = """
WITH bounds AS (
    SELECT date_trunc('day', min(ts)) AS d0, date_trunc('day', max(ts)) AS d1
    FROM events
), cal AS (
    SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day FROM bounds
), users AS (
    SELECT DISTINCT user_id FROM events
), daily AS (
    SELECT user_id, date_trunc('day', ts) AS day,
           arg_max(value, event_id) AS day_close, count(*) AS n_events
    FROM events GROUP BY 1, 2
)
SELECT u.user_id, c.day,
       coalesce(d.n_events, 0) AS n_events,
       d.day_close,
       last_value(d.day_close IGNORE NULLS)
           OVER (PARTITION BY u.user_id ORDER BY c.day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS close_ffill
FROM users u
CROSS JOIN cal c
LEFT JOIN daily d ON d.user_id = u.user_id AND d.day = c.day
"""


@query("win_resample_ffill", oracle=FFILL_ORACLE)
def win_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """resample('1D').last().ffill() per series: densify to the calendar,
    forward-fill gaps; days before a user's first event stay null."""
    ev = Tables(spark, sf_dir).events
    bounds = ev.agg(
        F.date_trunc("day", F.min("ts")).alias("d0"),
        F.date_trunc("day", F.max("ts")).alias("d1"),
    )
    cal = bounds.select(
        F.explode(F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))).alias("day")
    )
    users = ev.select("user_id").distinct()
    daily = ev.groupBy(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(
        # pandas resample().last() takes the last NON-null observation,
        # and DuckDB's arg_max(value, event_id) skips null values too —
        # but Spark's max_by returns the value at max event_id even when
        # it is NULL. Nulling the ordering key on null values makes
        # max_by skip those rows (max_by ignores null keys), aligning
        # all three engines (round-5 null-injection sweep catch).
        F.max_by("value", _nn_key("value", "event_id")).alias("day_close"),
        F.count("*").alias("n_events"),
    )
    grid = users.crossJoin(F.broadcast(cal))
    w = (
        W.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        grid.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            "day",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            "day_close",
            F.last("day_close", ignorenulls=True).over(w).alias("close_ffill"),
        )
    )


INTERP_ORACLE = """
WITH bounds AS (
    SELECT date_trunc('day', min(ts)) AS d0, date_trunc('day', max(ts)) AS d1
    FROM events
), cal AS (
    SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day FROM bounds
), users AS (
    SELECT DISTINCT user_id FROM events
), daily AS (
    SELECT user_id, date_trunc('day', ts) AS day,
           arg_max(value, event_id) AS day_close
    FROM events GROUP BY 1, 2
), grid AS (
    SELECT u.user_id, c.day, d.day_close
    FROM users u CROSS JOIN cal c
    LEFT JOIN daily d ON d.user_id = u.user_id AND d.day = c.day
), nb AS (
    SELECT user_id, day, day_close,
        last_value(day_close IGNORE NULLS) OVER wp AS prev_val,
        last_value(CASE WHEN day_close IS NOT NULL THEN day END IGNORE NULLS)
            OVER wp AS prev_day,
        first_value(day_close IGNORE NULLS) OVER wn AS next_val,
        first_value(CASE WHEN day_close IS NOT NULL THEN day END IGNORE NULLS)
            OVER wn AS next_day
    FROM grid
    WINDOW wp AS (PARTITION BY user_id ORDER BY day
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           wn AS (PARTITION BY user_id ORDER BY day
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT user_id, day, day_close,
    round(CASE
        WHEN day_close IS NOT NULL THEN day_close
        WHEN prev_val IS NULL THEN NULL
        WHEN next_val IS NULL THEN prev_val
        ELSE prev_val + (next_val - prev_val)
             * (CAST(date_diff('day', prev_day, day) AS DOUBLE)
                / date_diff('day', prev_day, next_day))
    END, 6) AS close_interp
FROM nb
"""


@query("win_resample_interp", oracle=INTERP_ORACLE)
def win_resample_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """resample('1D').last().interpolate() per series — pandas linear
    interpolation semantics: gaps between known days are linear in
    calendar days, trailing gaps pad the last known value, leading gaps
    stay null. Same one-pass two-window shape as ffill (no extra
    shuffle: both windows share the user_id partitioning)."""
    ev = Tables(spark, sf_dir).events
    bounds = ev.agg(
        F.date_trunc("day", F.min("ts")).alias("d0"),
        F.date_trunc("day", F.max("ts")).alias("d1"),
    )
    cal = bounds.select(
        F.explode(F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))).alias("day")
    )
    users = ev.select("user_id").distinct()
    daily = ev.groupBy(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(  # null-aware last: see win_resample_ffill's daily agg
        F.max_by("value", _nn_key("value", "event_id")).alias("day_close")
    )
    grid = users.crossJoin(F.broadcast(cal)).join(
        daily, ["user_id", "day"], "left"
    )
    wp = (
        W.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wn = (
        W.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    known_day = F.when(F.col("day_close").isNotNull(), F.col("day"))
    prev_val = F.last("day_close", ignorenulls=True).over(wp)
    prev_day = F.last(known_day, ignorenulls=True).over(wp)
    next_val = F.first("day_close", ignorenulls=True).over(wn)
    next_day = F.first(known_day, ignorenulls=True).over(wn)
    frac = F.datediff(F.col("day"), prev_day).cast("double") / F.datediff(
        next_day, prev_day
    )
    interp = (
        F.when(F.col("day_close").isNotNull(), F.col("day_close"))
        .when(prev_val.isNull(), F.lit(None))
        .when(next_val.isNull(), prev_val)
        .otherwise(prev_val + (next_val - prev_val) * frac)
    )
    return grid.select(
        "user_id", "day", "day_close", F.round(interp, 6).alias("close_interp")
    )


INTERP_TIME_ORACLE = """
WITH holey AS (
    SELECT user_id, event_id, ts,
           CASE WHEN event_id % 7 != 0 THEN value END AS v
    FROM events
), nb AS (
    SELECT user_id, event_id, v,
        epoch_us(ts) AS x,
        last_value(v IGNORE NULLS) OVER wp AS prev_v,
        last_value(CASE WHEN v IS NOT NULL THEN epoch_us(ts) END IGNORE NULLS)
            OVER wp AS prev_x,
        first_value(v IGNORE NULLS) OVER wn AS next_v,
        first_value(CASE WHEN v IS NOT NULL THEN epoch_us(ts) END IGNORE NULLS)
            OVER wn AS next_x
    FROM holey
    WINDOW wp AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wn AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT user_id, event_id,
    round(CASE
        WHEN v IS NOT NULL THEN v
        WHEN prev_v IS NULL THEN NULL
        WHEN next_v IS NULL THEN prev_v
        -- zero-width gap (duplicate timestamps around a null): the
        -- engine coalesces the degenerate lerp to the NEXT value;
        -- without this branch DuckDB would emit NULL via 0/0 (a latent
        -- divergence the fixtures don't currently exercise — round-2
        -- ADVICE)
        WHEN next_x = prev_x THEN next_v
        ELSE prev_v + (next_v - prev_v)
             * (CAST(x - prev_x AS DOUBLE) / (next_x - prev_x))
    END, 6) AS v_interp
FROM nb
"""


@query("win_interp_time", oracle=INTERP_TIME_ORACLE)
def win_interp_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """interpolate(method='time') over the RAW irregular series —
    timestamp-distance-weighted fill of synthetic gaps (every 7th
    value nulled), pandas method='time' semantics: leading nulls stay,
    trailing nulls pad. Drives the TsFrame.interpolate user surface so
    the oracle validates the API, not a twin; ONE shuffle on user_id
    (all prev/next frames share the window partitioning)."""
    from pandas_tsdb_spark.api import TsFrame

    ev = Tables(spark, sf_dir).events
    holey = ev.withColumn(
        "value", F.when(F.col("event_id") % 7 != 0, F.col("value"))
    )
    tf = TsFrame(holey, ts_col="ts", by="user_id", order_col="event_id")
    return tf.interpolate("value", method="time", out="vi").to_df().select(
        "user_id", "event_id", F.round("vi", 6).alias("v_interp")
    )


@query(
    "win_ewm",
    oracle="""
    WITH RECURSIVE s AS (
        SELECT user_id, event_id, value,
               row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
        FROM events
    ), r AS (
        -- literals cast to DOUBLE: DuckDB types bare 1.0/0.7 as DECIMAL
        -- and would run the den recurrence in scale-1 decimal arithmetic.
        -- NULL values mirror the kernel's pandas ignore_na=False
        -- semantics (null advances the decay, contributes nothing) —
        -- without the CASE branches one null would poison num to NULL
        -- for the rest of the series (round-3 review catch; latent, the
        -- fixture is null-free)
        SELECT user_id, event_id, value, rn,
               CASE WHEN value IS NULL THEN 0.0::DOUBLE
                    ELSE value + 0.0::DOUBLE END AS num,
               CASE WHEN value IS NULL THEN 0.0::DOUBLE
                    ELSE 1.0::DOUBLE END AS den
        FROM s WHERE rn = 1
        UNION ALL
        SELECT s.user_id, s.event_id, s.value, s.rn,
               CASE WHEN s.value IS NULL THEN 0.7::DOUBLE * r.num
                    ELSE s.value + 0.7::DOUBLE * r.num END AS num,
               CASE WHEN s.value IS NULL THEN 0.7::DOUBLE * r.den
                    ELSE 1.0::DOUBLE + 0.7::DOUBLE * r.den END AS den
        FROM r JOIN s ON s.user_id = r.user_id AND s.rn = r.rn + 1
    )
    SELECT user_id, event_id, value,
           CASE WHEN den = 0 THEN NULL ELSE num / den END AS ewm_value
    FROM r
    """,
)
def win_ewm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ewm(alpha=0.3, adjust=True).mean() per series — partition-batched.

    NOT groupBy().applyInPandas: that pays one Arrow kernel call per
    key (24k calls at 16x scale, 9.2s measured). Instead: one shuffle to
    co-locate each series (repartition by user) + sortWithinPartitions,
    then mapInPandas. The kernel runs the exact recurrence
        num_n = v_n + q·num_{n-1},  den_n = 1 + q·den_{n-1}   (q = 1-α)
    vectorized ACROSS series: a Python loop over within-series POSITION
    (bounded by the longest series per batch, ~100 in the fixtures),
    each step one numpy mult+add over every still-active series. Per
    element the IEEE sequence is mult(q, prev) then add(v, ·) — the same
    two roundings, in the same order, as the DuckDB recursive CTE's
    `value + 0.7 * r.num`, so num/den is BIT-identical and the full
    oracle hashes raw doubles with no rounding at all (round-3 upgrade;
    previously rows-only with a closed-form differential).

    A series may span Arrow batches within a partition, so the kernel
    carries exact per-user (num, den) across batches; a fresh series
    starts from (0.0, 0.0) and v + q·0.0 ≡ v + 0.0 keeps the base case
    identical to the CTE anchor. Scale: one shuffle on user_id, O(rows)
    work, per-batch Python iterations bounded by max series length —
    for very long single series this degrades toward the win_holt
    Python-recurrence class (documented escape hatch)."""
    alpha = 0.3
    ev = Tables(spark, sf_dir).events.select("user_id", "event_id", "value")
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    part = ev.repartition(n_part, "user_id").sortWithinPartitions(
        "user_id", "event_id"
    )

    def kernel(batches):
        q = 1.0 - alpha
        carry: dict[int, tuple[float, float]] = {}  # user -> (num, den)
        for pdf in batches:
            n = len(pdf)
            if not n:
                continue
            uid = pdf["user_id"].to_numpy()
            v = pdf["value"].to_numpy(dtype="float64")
            new = np.r_[True, uid[1:] != uid[:-1]]
            starts = np.flatnonzero(new)
            lens = np.diff(np.r_[starts, n])
            pn = np.array(
                [carry.get(int(uid[s]), (0.0, 0.0))[0] for s in starts]
            )
            pd_ = np.array(
                [carry.get(int(uid[s]), (0.0, 0.0))[1] for s in starts]
            )
            num = np.empty(n)
            den = np.empty(n)
            pos = starts.copy()
            active = np.arange(len(starts))
            miss_any = np.isnan(v).any()
            step = 0
            while len(active):
                sel = pos[active]
                qn = q * pn[active]  # one rounding (mult)
                qd = q * pd_[active]
                if miss_any:  # NaN advances decay, contributes nothing
                    m = np.isnan(v[sel])
                    nn = np.where(m, qn, v[sel] + qn)
                    nd = np.where(m, qd, 1.0 + qd)
                else:
                    nn = v[sel] + qn  # one rounding (add) — CTE order
                    nd = 1.0 + qd
                num[sel] = nn
                den[sel] = nd
                pn[active] = nn
                pd_[active] = nd
                pos[active] += 1
                step += 1
                active = active[lens[active] > step]
            for k, s in enumerate(starts):
                carry[int(uid[s])] = (float(pn[k]), float(pd_[k]))
            out = pdf[["user_id", "event_id", "value"]].copy()
            with np.errstate(invalid="ignore", divide="ignore"):
                ewm = num / den
            if miss_any:
                # null inputs arrive as NaN through Arrow — emit them
                # back as true nulls so the value column round-trips
                # (object columns make Arrow write nulls, not NaN)
                vc = pdf["value"].astype(object)
                vc[np.isnan(v)] = None
                out["value"] = vc
            if (den == 0).any():
                # all-null prefix: no observation yet -> NULL, matching
                # the oracle's CASE WHEN den = 0
                col = ewm.astype(object)
                col[den == 0] = None
                out["ewm_value"] = col
            else:
                out["ewm_value"] = ewm
            yield out

    return part.mapInPandas(
        kernel, "user_id long, event_id long, value double, ewm_value double"
    )


@query(
    "udf_scalar",
    oracle="""
    SELECT doc_id, length(text) AS text_len,
           length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens
    FROM documents
    """,
)
def udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.11 vectorized scalar UDF (Arrow pandas_udf) mirrored in SQL so
    the Python-worker path itself is oracle-checked."""
    from pyspark.sql.functions import pandas_udf

    # nullable Int64, not int64: .str ops yield NaN for null text, and
    # the hard int64 cast CRASHED the Python worker on a null input row
    # (round-5 null-text sweep) where the oracle's length(NULL) is just
    # NULL — nullable Int64 ships true nulls through Arrow instead.
    @pandas_udf("long")
    def text_len(s: pd.Series) -> pd.Series:
        return s.str.len().astype("Int64")

    @pandas_udf("long")
    def n_tokens(s: pd.Series) -> pd.Series:
        return (s.str.count(" ") + 1).astype("Int64")

    docs = Tables(spark, sf_dir).documents
    return docs.select(
        "doc_id",
        text_len("text").alias("text_len"),
        n_tokens("text").alias("n_tokens"),
    )


@query(
    "win_twa",
    oracle="""
    WITH s AS (
        SELECT user_id,
               CAST(round(value * 100) AS BIGINT) AS vc,
               epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY event_id))
                 - epoch_us(ts) AS dt_us
        FROM events
    )
    SELECT user_id,
           round(CAST(sum(vc * dt_us) AS DOUBLE)
                 / (CAST(sum(dt_us) AS DOUBLE) * 100.0), 6) AS twa,
           count(*) AS n_seg
    FROM s WHERE dt_us IS NOT NULL GROUP BY user_id
    """,
)
def win_twa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average per series — the tsdb aggregate that plain
    AVG gets wrong on irregular samples: each value is weighted by how
    long it was current (sum(v_i * Δt_i) / sum(Δt_i), last sample
    carries no weight).

    Float-determinism: the weighted sum is computed in EXACT integer
    arithmetic — value scaled to cents (2-decimal fixture data), Δt in
    µs, so sum(vc·Δt) is a bigint both engines fold identically; one
    cast and one division at the end are then bit-identical. Segment
    order keys on event_id alone (strictly monotone with ts — measured,
    FIXTURES.md) so DuckDB's ns-precision ts can never order segments
    differently from Spark's µs. Plan: one lead() window + one hash-agg
    sharing the user_id exchange."""
    ev = Tables(spark, sf_dir).events
    w = W.partitionBy("user_id").orderBy("event_id")
    s = ev.select(
        "user_id",
        F.round(F.col("value") * 100).cast("long").alias("vc"),
        (F.lead(F.unix_micros("ts")).over(w) - F.unix_micros("ts")).alias("dt_us"),
    ).filter(F.col("dt_us").isNotNull())
    return s.groupBy("user_id").agg(
        F.round(
            F.sum(F.col("vc") * F.col("dt_us")).cast("double")
            / (F.sum("dt_us").cast("double") * 100.0),
            6,
        ).alias("twa"),
        F.count("*").alias("n_seg"),
    )


# nearest is DERIVED from the backward/forward arms — "the backward
# arm's row if its distance <= the forward arm's row's distance" — not
# an independently-ordered third lookup. The round-6 duplicate-ts sweep
# caught the old independent arm (ORDER BY abs(dt), (p.ts > e.ts),
# p.event_id ASC) disagreeing with itself: on a purchase ts carrying
# several rows, nearest could return a DIFFERENT row than the
# bwd_value column shows for the same event (ASC vs DESC event_id
# tie-break). The composable law keeps all three columns consistent
# and is exactly what the one-pass union-window builder computes.
ASOF_DIR_ORACLE = """
WITH x AS (
  SELECT e.event_id, e.user_id, e.value, epoch_us(e.ts) AS tus,
         (SELECT {'v': p.value, 't': epoch_us(p.ts)} FROM events p
           WHERE p.user_id = e.user_id AND p.event_type = 'purchase'
             AND p.ts <= e.ts
           ORDER BY p.ts DESC, p.event_id DESC LIMIT 1) AS b,
         (SELECT {'v': p.value, 't': epoch_us(p.ts)} FROM events p
           WHERE p.user_id = e.user_id AND p.event_type = 'purchase'
             AND p.ts >= e.ts
           ORDER BY p.ts ASC, p.event_id ASC LIMIT 1) AS f
  FROM events e)
SELECT event_id, user_id, value,
       b.v AS bwd_value, f.v AS fwd_value,
       CASE WHEN f IS NULL THEN b.v
            WHEN b IS NULL THEN f.v
            WHEN tus - b.t <= f.t - tus THEN b.v
            ELSE f.v END AS nearest_value
FROM x
"""


@query("join_asof_directions", oracle=ASOF_DIR_ORACLE)
def join_asof_directions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pd.merge_asof direction='backward' / 'forward' / 'nearest' in ONE
    pass. Union-and-window with the right side tagged twice: side=0
    rows feed the backward window (last ignorenulls over
    unboundedPreceding..current — at equal ts they sort BEFORE the left
    row, giving inclusive r.ts <= l.ts), side=2 rows feed the forward
    window (first ignorenulls over current..unboundedFollowing — at
    equal ts they sort AFTER, giving inclusive r.ts >= l.ts).
    'nearest' picks the closer of the two in µs, backward on ties
    (mirrors the oracle's (p.ts > e.ts) sort key). Both windows share
    one partitioning and one sort order, so the whole three-direction
    join costs a single exchange + sort — the same 100 TB shape as
    join_asof, never a range explosion."""
    ev = Tables(spark, sf_dir).events
    left = ev.selectExpr(
        "user_id", "ts", "event_id", "value",
        "1 AS side",
        "cast(null as double) AS b_val", "cast(null as bigint) AS b_tus",
        "cast(null as double) AS f_val", "cast(null as bigint) AS f_tus",
    )
    p = ev.filter("event_type = 'purchase'")
    bwd = p.selectExpr(
        "user_id", "ts", "event_id",
        "cast(null as double) AS value", "0 AS side",
        "value AS b_val", "unix_micros(ts) AS b_tus",
        "cast(null as double) AS f_val", "cast(null as bigint) AS f_tus",
    )
    fwd = p.selectExpr(
        "user_id", "ts", "event_id",
        "cast(null as double) AS value", "2 AS side",
        "cast(null as double) AS b_val", "cast(null as bigint) AS b_tus",
        "value AS f_val", "unix_micros(ts) AS f_tus",
    )
    w_b = (
        "OVER (PARTITION BY user_id ORDER BY ts, side, event_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    )
    w_f = (
        "OVER (PARTITION BY user_id ORDER BY ts, side, event_id "
        "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)"
    )
    # presence-struct fill (round-5 null sweep, same law as join_asof):
    # the matched ROW decides, even when its value is NULL —
    # last/first(ignorenulls) on the bare value column would skip
    # null-valued purchases AND make the nearest-arm's "no row on this
    # side" test (value IS NULL) misfire on a present-but-null match.
    bs = (
        "last(CASE WHEN side = 0 THEN named_struct("
        "'v', b_val, 'tus', b_tus) END, true) " + w_b
    )
    fs = (
        "first(CASE WHEN side = 2 THEN named_struct("
        "'v', f_val, 'tus', f_tus) END, true) " + w_f
    )
    u = left.unionByName(bwd).unionByName(fwd).selectExpr(
        "user_id", "ts", "event_id", "value", "side",
        f"({bs}) AS b_st",
        f"({fs}) AS f_st",
    )
    return u.filter("side = 1").selectExpr(
        "event_id", "user_id", "value",
        "b_st.v AS bwd_value", "f_st.v AS fwd_value",
        "CASE WHEN f_st IS NULL THEN b_st.v"
        " WHEN b_st IS NULL THEN f_st.v"
        " WHEN unix_micros(ts) - b_st.tus <= f_st.tus - unix_micros(ts)"
        " THEN b_st.v ELSE f_st.v END AS nearest_value",
    )


@query(
    "win_autocorr",
    oracle="""
    WITH s AS (
        SELECT user_id, value,
               lag(value, 1) OVER w AS v1,
               lag(value, 7) OVER w AS v7
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
    )
    SELECT user_id,
           round(corr(value, v1), 6) + 0.0 AS acf1,
           round(corr(value, v7), 6) + 0.0 AS acf7,
           count(v7) AS n7
    FROM s GROUP BY user_id
    """,
)
def win_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-k autocorrelation per series (pandas `Series.autocorr(k)` —
    Pearson corr of the series with its own k-shift). One lag window +
    one hash-agg sharing the user_id exchange; corr is a one-pass
    streaming moment with partial merge, so nothing scales with series
    length except the scan. Ordered by event_id (strictly monotone with
    ts — FIXTURES.md) so both engines pair identical rows. Rounded at 6:
    cross-engine moment-fold noise is ~1e-12 relative."""
    ev = Tables(spark, sf_dir).events
    w = W.partitionBy("user_id").orderBy("event_id")
    s = ev.select(
        "user_id",
        "value",
        F.lag("value", 1).over(w).alias("v1"),
        F.lag("value", 7).over(w).alias("v7"),
    )
    return s.groupBy("user_id").agg(
        (F.round(F.corr("value", "v1"), 6) + F.lit(0.0)).alias("acf1"),
        (F.round(F.corr("value", "v7"), 6) + F.lit(0.0)).alias("acf7"),
        F.count("v7").alias("n7"),
    )


@query(
    "align_series",
    oracle="""
    WITH c AS (
        SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
               count(*) AS n_clicks
        FROM events WHERE event_type = 'click' GROUP BY 1, 2
    ), p AS (
        SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
               count(*) AS n_purchases
        FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
    )
    SELECT coalesce(c.user_id, p.user_id) AS user_id,
           coalesce(c.day, p.day) AS day,
           c.n_clicks, p.n_purchases,
           CAST(p.n_purchases AS DOUBLE) / c.n_clicks AS buy_rate
    FROM c FULL OUTER JOIN p
      ON c.user_id = p.user_id AND c.day = p.day
    """,
)
def align_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas index ALIGNMENT: arithmetic between two differently-keyed
    series (`s1 / s2` aligns on the union of both indexes, emitting
    NULL where either side is missing — exactly full-outer-join
    semantics). Two per-(user, day) aggregates share one grouping
    exchange shape; the outer join runs on the already-partitioned
    sides. The division result stays NULL-propagating like pandas NaN
    arithmetic."""
    ev = Tables(spark, sf_dir).events
    day = F.date_trunc("day", F.col("ts")).alias("day")

    def series(etype, out):
        return (
            ev.filter(F.col("event_type") == etype)
            .groupBy("user_id", day)
            .agg(F.count("*").alias(out))
        )

    c = series("click", "n_clicks")
    p = (
        series("purchase", "n_purchases")
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("day").alias("p_day"),
            "n_purchases",
        )
    )
    return c.join(
        p,
        (F.col("user_id") == F.col("p_user_id")) & (F.col("day") == F.col("p_day")),
        "full_outer",
    ).select(
        F.coalesce("user_id", "p_user_id").alias("user_id"),
        F.coalesce("day", "p_day").alias("day"),
        "n_clicks",
        "n_purchases",
        (F.col("n_purchases").cast("double") / F.col("n_clicks")).alias("buy_rate"),
    )


_EPOCH_2024_US = 1_704_067_200_000_000  # 2024-01-01 UTC


@query(
    "win_trend",
    oracle=f"""
    SELECT user_id,
           round(regr_slope(value,
               (epoch_us(ts) - {_EPOCH_2024_US}) / 86400000000.0), 6)
             AS slope_per_day,
           round(regr_intercept(value,
               (epoch_us(ts) - {_EPOCH_2024_US}) / 86400000000.0), 4)
             AS intercept,
           count(*) AS n
    FROM events GROUP BY user_id
    """,
)
def win_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series linear trend (OLS of value on time) — the tsdb
    drift/forecast primitive. regr_slope/regr_intercept are one-pass
    streaming moments with partial merge: one hash-agg, one exchange,
    nothing scales with series length. The regressor is DAYS SINCE
    2024-01-01, not raw epoch — centering the x range keeps the
    moment arithmetic well-conditioned so both engines agree through
    round(6)/round(4) (raw-epoch x puts the intercept at ~-2e4 with
    cancellation noise above the rounding digit)."""
    ev = Tables(spark, sf_dir).events
    x = (F.unix_micros("ts") - F.lit(_EPOCH_2024_US)) / 86_400_000_000.0
    return ev.groupBy("user_id").agg(
        F.round(F.regr_slope(F.col("value"), x), 6).alias("slope_per_day"),
        F.round(F.regr_intercept(F.col("value"), x), 4).alias("intercept"),
        F.count("*").alias("n"),
    )


@query(
    "ts_outlier_mad",
    oracle="""
    WITH med AS (
        SELECT user_id, quantile_cont(value, 0.5) AS med
        FROM events GROUP BY user_id
    ), mad AS (
        SELECT e.user_id, quantile_cont(abs(e.value - m.med), 0.5) AS mad
        FROM events e JOIN med m USING (user_id) GROUP BY e.user_id
    )
    SELECT e.user_id, round(any_value(med.med), 6) AS med,
           round(any_value(mad.mad), 6) AS mad,
           count(*) FILTER (WHERE abs(e.value - med.med) > 5 * mad.mad)
             AS n_outliers,
           count(*) AS n
    FROM events e JOIN med USING (user_id) JOIN mad USING (user_id)
    GROUP BY e.user_id
    """,
)
def ts_outlier_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-series outlier detection: |x − median| > 5·MAD (the
    median-absolute-deviation rule — robust where z-scores break,
    since mean/stddev are themselves dragged by the outliers). Two
    grouped exact medians (Spark `median` == DuckDB quantile_cont(0.5),
    both interpolating) with the per-key median broadcast back between
    them. The plan carries one agg exchange per pass (median is not
    partially-mergeable the way moments are, so each pass re-groups);
    the med/mad sides are tiny post-agg and broadcast back. A manual
    repartition("user_id") was tried and does NOT statically dedupe
    across the three subtrees (ReuseExchange only unifies identical
    physical subtrees at runtime under AQE), so the straightforward
    formulation is kept. Medians round(6): the even-count interpolation
    midpoint can differ in the last ulp across engines."""
    ev = Tables(spark, sf_dir).events
    med = ev.groupBy("user_id").agg(F.median("value").alias("med"))
    with_med = ev.join(med, "user_id")
    mad = with_med.groupBy("user_id").agg(
        F.median(F.abs(F.col("value") - F.col("med"))).alias("mad")
    )
    return (
        with_med.join(mad, "user_id")
        .groupBy("user_id")
        .agg(
            F.round(F.any_value("med"), 6).alias("med"),
            F.round(F.any_value("mad"), 6).alias("mad"),
            F.count_if(
                F.abs(F.col("value") - F.col("med")) > 5 * F.col("mad")
            ).alias("n_outliers"),
            F.count("*").alias("n"),
        )
    )


@query(
    "win_seasonal_dow",
    oracle="""
    SELECT event_id, user_id, dow, value,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER w AS DOUBLE)
             / 100.0 / (count(*) OVER w) AS dow_mean,
           value - CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER w
                        AS DOUBLE) / 100.0 / (count(*) OVER w)
             AS deseasonalized
    FROM (SELECT event_id, user_id, value,
                 dayofweek(ts) + 1 AS dow FROM events)
    WINDOW w AS (PARTITION BY user_id, dow)
    """,
    tags=("timeseries", "windows"),
)
def win_seasonal_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonal adjustment per series: each point minus its
    series' same-weekday mean (the seasonal-naive decomposition a tsdb
    runs before anomaly scoring — pandas idiom
    ``x - x.groupby([uid, dow]).transform('mean')``).

    One UNORDERED window over (user_id, dow): a single hash exchange +
    sort, no join back — at 100 TB this beats the groupBy+rejoin
    formulation because the mean table is |users|x7 (too big to
    broadcast, so the rejoin would shuffle twice). Spark dayofweek is
    1=Sunday; DuckDB dayofweek is 0=Sunday — oracle adds 1. The mean is
    an exact integer-cents sum divided by the count (sum2 idiom —
    bit-identical across engines on ANY data, round-6 boundary sweep),
    so the deseasonalized difference is emitted RAW, no rounding."""
    ev = Tables(spark, sf_dir).events.select(
        "event_id", "user_id", "value", F.dayofweek("ts").alias("dow")
    )
    w = W.partitionBy("user_id", "dow")
    # exact integer-cents window sum (round-6 boundary sweep: the
    # rounded-float-sum mean is noise-unstable when the true total
    # lands on a cents boundary; integer sums cannot be)
    mean = (
        F.sum(F.round(F.col("value") * 100).cast("long")).over(w)
        .cast("double") / F.lit(100.0) / F.count("*").over(w)
    )
    return ev.select(
        "event_id",
        "user_id",
        "dow",
        "value",
        mean.alias("dow_mean"),
        (F.col("value") - mean).alias("deseasonalized"),
    )


@query(
    "win_holt",
    oracle="""
    WITH RECURSIVE s AS (
        SELECT user_id, event_id, value,
               row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
        FROM events
    ), r AS (
        SELECT user_id, event_id, value, rn,
               value AS lev, 0.0::DOUBLE AS tr
        FROM s WHERE rn = 1
        UNION ALL
        SELECT user_id, event_id, value, rn, lev_new, tr_new FROM (
            -- tr_in: seeded trend x1-x0 at rn=2, else the carried trend;
            -- every constant spelled as the kernel computes it
            -- ((1.0 - 0.3) != literal 0.7 in the last bit)
            SELECT s.user_id, s.event_id, s.value, s.rn,
                   CASE WHEN r.rn = 1 THEN s.value - r.lev ELSE r.tr END AS tr_in,
                   0.5::DOUBLE * s.value
                     + (1.0::DOUBLE - 0.5::DOUBLE) * (r.lev + tr_in) AS lev_new,
                   0.3::DOUBLE * (lev_new - r.lev)
                     + (1.0::DOUBLE - 0.3::DOUBLE) * tr_in AS tr_new
            FROM r JOIN s ON s.user_id = r.user_id AND s.rn = r.rn + 1
        )
    )
    SELECT user_id, event_id, value, lev AS holt_level FROM r
    """,
)
def win_holt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear (double exponential) smoothing per series — level
    l_t = a*x_t + (1-a)(l+b), trend b_t = g*(l_t-l) + (1-g)*b, seeded
    l_0=x_0, b_0=x_1-x_0 (the statsmodels Holt convention). Like
    win_ewm this is a true recurrence, not frame-expressible — but it IS
    expressible as a DuckDB recursive CTE over row_number-ordered series
    (round-3 upgrade from rows-only): the CTE mirrors the kernel's IEEE
    operation order step for step, so holt_level hashes RAW with no
    rounding. The cross-batch state carry and distributed ordering are
    additionally differential-tested against a single-partition
    reference loop in tests/test_timeseries.py.

    Same scale shape as win_ewm: ONE shuffle to co-locate each series
    (repartition on user_id) + sortWithinPartitions + mapInPandas, so
    each Arrow batch holds many whole-or-partial series and the exact
    (level, trend, n_seen, first_x) state carries across batch
    boundaries per user. Round-3 rewrite off the per-ROW Python loop
    (the VERDICT-r2 weak-at-scale entry) onto win_ewm's across-series
    position loop: each step is a handful of numpy elementwise ops over
    every still-active series. The n=1 trend-seeding branch folds into
    the steady-state formula exactly (with lev:=x0, tr:=x-x0 the n=1
    equations ARE the n>=2 equations), so one vectorized update serves
    both and the per-element IEEE sequence — sub, add, mult, add /
    sub, mult, mult, add — is unchanged from the scalar loop and the
    recursive CTE. Oracle still hashes RAW doubles. Python iterations
    per batch are bounded by the longest series, not row count
    (measured: the old loop was the ~130k rows/s/core weak spot; this
    kernel sits in win_ewm's multi-M rows/s band)."""
    alpha, gamma = 0.5, 0.3
    ev = Tables(spark, sf_dir).events.select("user_id", "event_id", "value")
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    part = ev.repartition(n_part, "user_id").sortWithinPartitions(
        "user_id", "event_id"
    )

    def kernel(batches):
        # user -> (level, trend, n_seen, first_x)
        carry: dict[int, tuple[float, float, int, float]] = {}
        for pdf in batches:
            nrows = len(pdf)
            if not nrows:
                continue
            uid = pdf["user_id"].to_numpy()
            v = pdf["value"].to_numpy(dtype="float64")
            starts = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
            lens = np.diff(np.r_[starts, nrows])
            st = [carry.get(int(uid[s]), (0.0, 0.0, 0, 0.0)) for s in starts]
            lev = np.array([t[0] for t in st])
            tr = np.array([t[1] for t in st])
            nsee = np.array([t[2] for t in st], dtype=np.int64)
            x0 = np.array([t[3] for t in st])
            out = np.empty(nrows)
            pos = starts.copy()
            active = np.arange(len(starts))
            step = 0
            while len(active):
                sel = pos[active]
                zz = v[sel]
                la, ta, na, xa = lev[active], tr[active], nsee[active], x0[active]
                m0 = na == 0
                m1 = na == 1
                # n=1: the seed IS the steady update with lev=x0, tr=z-x0
                ta = np.where(m1, zz - xa, ta)
                le = np.where(m1, xa, la)
                # steady update (n>=1), scalar op order preserved:
                # alpha*z + (1-alpha)*(lev+tr); gamma*(lev'-lev)+(1-gamma)*tr
                lev_new = alpha * zz + (1.0 - alpha) * (le + ta)
                tr_new = gamma * (lev_new - le) + (1.0 - gamma) * ta
                # n=0: seed level=x, trend=0, remember first_x
                lev[active] = np.where(m0, zz, lev_new)
                tr[active] = np.where(m0, 0.0, tr_new)
                x0[active] = np.where(m0, zz, xa)
                out[sel] = np.where(m0, zz, lev_new)
                nsee[active] = na + 1
                pos[active] += 1
                step += 1
                active = active[lens[active] > step]
            for j, s in enumerate(starts):
                carry[int(uid[s])] = (
                    float(lev[j]), float(tr[j]), int(nsee[j]), float(x0[j])
                )
            res = pdf[["user_id", "event_id", "value"]].copy()
            # null inputs poison the recurrence from the first null on —
            # NaN through every numpy op here, NULL through every CTE op
            # in the oracle, the SAME rows — but Arrow NaN is a VALUE in
            # Spark (IS NULL false) while the oracle's is SQL NULL:
            # round-trip both columns through object dtype so the engine
            # emits true nulls (win_kalman's emit discipline)
            if np.isnan(v).any():
                vc = pdf["value"].astype(object)
                vc[np.isnan(v)] = None
                res["value"] = vc
            # gate OUTPUT conversion on the output, not the input: a null
            # in an earlier batch poisons the carried (lev, tr), so a later
            # all-finite batch still produces NaN outputs from the carry —
            # those must become SQL NULLs too, or the engine emits Arrow
            # NaN doubles (IS NULL false) while the oracle yields NULL
            if np.isnan(out).any():
                oc = out.astype(object)
                oc[np.isnan(out)] = None
                res["holt_level"] = oc
            else:
                res["holt_level"] = out
            yield res

    return part.mapInPandas(
        kernel, "user_id long, event_id long, value double, holt_level double"
    )


@query("win_holt_blas", oracle=None)  # BLAS fold order: rows-only twin
def win_holt_blas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """win_holt's vectorized twin — the scale path for LONG series,
    removing the named per-row-Python weak spot (win_holt stays the
    sequential spec; tests assert the two agree to float tolerance).

    Holt is a LINEAR recurrence: with state s_t = (level, trend),
    s_t = M s_{t-1} + v x_t for fixed 2x2 M (|eigenvalues| =
    sqrt(det M) = sqrt(1-alpha+alpha*gamma...) < 1), so a whole block
    of B outputs is one lower-triangular TOEPLITZ matmul
    out = T x + carry-response, where column j of T is the impulse
    response h_k = (M^k v)[level] shifted down j — and the end-of-block
    state is another small matmul. Per 256-row block that is one BLAS
    dgemv instead of 256 Python iterations (~B x fewer interpreter
    steps; the impulse response decays as |eig|^k ~ 0.707^k here, so
    T is numerically benign). Seeding rows (n<2) run scalar, matching
    win_holt's statsmodels convention exactly; cross-batch and
    cross-block state carries per user. Same one-shuffle plan shape."""
    alpha, gamma = 0.5, 0.3
    B = 256
    ev = Tables(spark, sf_dir).events.select("user_id", "event_id", "value")
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    part = ev.repartition(n_part, "user_id").sortWithinPartitions(
        "user_id", "event_id"
    )

    def kernel(batches):
        M = np.array([[1 - alpha, 1 - alpha],
                      [-alpha * gamma, gamma * (1 - alpha) + 1 - gamma]])
        v = np.array([alpha, alpha * gamma])
        # impulse response h[k] = M^k v, and powers P[k] = M^(k+1)
        h = np.empty((B, 2))
        P = np.empty((B, 2, 2))
        acc_v, acc_M = v.copy(), M.copy()
        for k in range(B):
            h[k] = acc_v
            P[k] = acc_M
            acc_v = M @ acc_v
            acc_M = M @ acc_M
        # T[t, j] = h[t-j][0] for t >= j: level response to x_j at t
        idx = np.subtract.outer(np.arange(B), np.arange(B))
        T = np.where(idx >= 0, h[np.clip(idx, 0, B - 1), 0], 0.0)
        carry: dict[int, tuple[int, float, np.ndarray]] = {}

        def run_series(u, x, out):
            n, x0, s = carry.get(u, (0, 0.0, np.zeros(2)))
            i = 0
            m = len(x)
            # scalar seeding (statsmodels Holt convention)
            while i < m and n < 2:
                xi = float(x[i])
                if n == 0:
                    x0, s = xi, np.array([xi, 0.0])
                    out[i] = xi
                    n = 1
                else:
                    tr = xi - x0
                    lev = alpha * xi + (1 - alpha) * (x0 + tr)
                    tr = gamma * (lev - x0) + (1 - gamma) * tr
                    s = np.array([lev, tr])
                    out[i] = lev
                    n = 2
                i += 1
            while i < m:
                j = min(B, m - i)
                xb = x[i:i + j]
                # block outputs: Toeplitz response + carry response
                out[i:i + j] = T[:j, :j] @ xb + P[:j, :, :] @ s @ np.array([1.0, 0.0])
                # end-of-block state: M^j s + sum M^(j-1-k) v x_k
                s = P[j - 1] @ s + h[:j][::-1].T @ xb
                i += j
                n += j
            carry[u] = (n, x0, s)

        for pdf in batches:
            users = pdf["user_id"].to_numpy()
            vals = pdf["value"].to_numpy(dtype=np.float64)
            out = np.empty(len(vals))
            starts = np.flatnonzero(np.r_[True, users[1:] != users[:-1]])
            for a, b in zip(starts, np.r_[starts[1:], len(users)]):
                run_series(int(users[a]), vals[a:b], out[a:b])
            res = pdf[["user_id", "event_id", "value"]].copy()
            res["holt_level"] = out
            yield res

    return part.mapInPandas(
        kernel, "user_id long, event_id long, value double, holt_level double"
    )


_M4_BUCKETS = 100


@query(
    "win_downsample_m4",
    oracle=f"""
    WITH ext AS (
      SELECT user_id,
             min(epoch_us(ts)) AS t0,
             max(epoch_us(ts)) AS t1
      FROM events GROUP BY user_id
    ),
    b AS (
      SELECT e.user_id, e.value, e.event_id, epoch_us(e.ts) AS ts_us,
             least({_M4_BUCKETS} - 1,
                  (epoch_us(e.ts) - x.t0) * {_M4_BUCKETS} // (x.t1 - x.t0 + 1))
                  AS bucket
      FROM events e JOIN ext x ON e.user_id = x.user_id
    ),
    w AS (
      SELECT *,
             row_number() OVER (PARTITION BY user_id, bucket
                                ORDER BY ts_us, event_id) AS rn_a,
             row_number() OVER (PARTITION BY user_id, bucket
                                ORDER BY ts_us DESC, event_id DESC) AS rn_z
      FROM b
    )
    SELECT user_id, bucket,
           count(*) AS n,
           min(value) AS vmin, max(value) AS vmax,
           min(CASE WHEN rn_a = 1 THEN value END) AS vfirst,
           min(CASE WHEN rn_z = 1 THEN value END) AS vlast,
           min(ts_us) AS t_start_us, max(ts_us) AS t_end_us
    FROM w GROUP BY user_id, bucket
    """,
    tags=("timeseries", "windows"),
)
def win_downsample_m4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 time-series downsampling — the standard tsdb visualization
    reduction (min/max/first/last per time bucket preserves the exact
    rendered line shape at pixel resolution; VLDB'14 'M4: A
    Visualization-Oriented Time Series Data Aggregation').

    Each series' extent splits into 100 equal-width buckets; per
    bucket the four anchor values + count + extent come out of ONE
    grouped aggregate. Plan: per-series extent via a grouped agg,
    co-located join back (both sides hash on user_id — exchange
    reused), two row_number windows (ascending/descending, sharing
    the (user_id, bucket) sort) feed conditional first/last picks into
    the final aggregate on the same partitioning. At 100 TB the output
    is |series| x buckets regardless of input rows — the whole point
    of the operator. Values emitted raw (selection, not arithmetic:
    min/max/first/last are exact row values on both engines)."""
    # ONE spark.sql() call (r9-opt, catalog.Tables.sql_views): 190 ms
    # of per-call plan construction -> ~70 ms; identical trees.
    # bucket index via pure INTEGER division on both engines: a
    # double-quotient cast differs cross-engine (Spark truncates,
    # DuckDB rounds) — `div`/`//` sidestep the tie entirely.
    t = Tables(spark, sf_dir)
    v = t.sql_views()
    return spark.sql(f"""
    WITH ev AS (SELECT user_id, event_id, value, unix_micros(ts) AS ts_us
                FROM {v}events),
    ext AS (SELECT user_id, min(ts_us) AS t0, max(ts_us) AS t1
            FROM ev GROUP BY user_id),
    b AS (SELECT ev.user_id, ev.event_id, ev.value, ev.ts_us,
                 least(cast({_M4_BUCKETS - 1} as bigint),
                       (ts_us - t0) * {_M4_BUCKETS} div (t1 - t0 + 1))
                   AS bucket
          FROM ev JOIN ext USING (user_id)),
    w AS (SELECT *,
                 row_number() OVER (PARTITION BY user_id, bucket
                                    ORDER BY ts_us, event_id) AS rn_a,
                 row_number() OVER (PARTITION BY user_id, bucket
                                    ORDER BY ts_us DESC, event_id DESC)
                   AS rn_z
          FROM b)
    SELECT user_id, bucket, count(*) AS n,
           min(value) AS vmin, max(value) AS vmax,
           min(CASE WHEN rn_a = 1 THEN value END) AS vfirst,
           min(CASE WHEN rn_z = 1 THEN value END) AS vlast,
           min(ts_us) AS t_start_us, max(ts_us) AS t_end_us
    FROM w GROUP BY user_id, bucket
    """)


@query("win_downsample_lttb", oracle=None)  # sequential selection: rows-only
def win_downsample_lttb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-Triangle-Three-Buckets downsampling per series to ~100
    points — the Grafana/Timescale decimation algorithm. TRUE LTTB is
    sequential (each bucket's pick maximizes triangle area against the
    PREVIOUS pick and the next bucket's centroid), so like ewm/holt it
    is a per-series Arrow kernel, not a window expression — rows-only,
    with shape invariants (endpoints kept, one point per bucket,
    output ⊆ input) asserted in tests. Same partition-batched
    mapInPandas shape as win_ewm: one shuffle to co-locate series.

    Round-3 rewrite off the per-SERIES bucket loop (the second
    VERDICT-r2 weak-at-scale entry) onto the across-series position
    loop: completed series flush in GROUPS and the ~98 bucket
    iterations run once per group, each step a handful of 2-D numpy
    ops over every long series at once (ragged candidate windows via
    masked gather; next-bucket centroids via add.reduceat segment
    sums — sequential-order, so picks are deterministic regardless of
    how series group into batches). Selection is pick-identical to the
    per-series reference loop (asserted offline across 300 random
    series incl. the n=101 minimal-long edge; measured 1.8M -> 4.3M
    rows/s/core). For n > n_out the integer bucket edges are strictly
    increasing (linspace step (n-2)/98 > 1), so no bucket is empty."""
    n_out = 100
    ev = Tables(spark, sf_dir).events.select("user_id", "event_id", "value")
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    part = ev.repartition(n_part, "user_id").sortWithinPartitions(
        "user_id", "event_id"
    )

    def kernel(batches):
        import numpy as _np

        buf: dict[int, list[pd.DataFrame]] = {}

        def lttb_group(frames: list[pd.DataFrame]) -> pd.DataFrame | None:
            out, longs = [], []
            for pdf in frames:
                (out if len(pdf) <= n_out else longs).append(pdf)
            if longs:
                ns = len(longs)
                n = _np.array([len(p) for p in longs], dtype=_np.int64)
                off = _np.concatenate([[0], _np.cumsum(n)])[:-1]
                eid = _np.concatenate(
                    [p["event_id"].to_numpy() for p in longs]
                )
                x = eid.astype(float)
                y = _np.concatenate(
                    [p["value"].to_numpy(dtype=float) for p in longs]
                )
                # integer bucket edges == np.linspace(1, n-1, 99).astype(int)
                k = _np.arange(n_out - 1, dtype=float)
                step = (n - 2) / float(n_out - 2)
                E = 1.0 + k[None, :] * step[:, None]
                E[:, -1] = (n - 1).astype(float)
                edges = E.astype(_np.int64)
                sel = _np.empty((ns, n_out), dtype=_np.int64)
                sel[:, 0] = 0
                sel[:, -1] = n - 1
                xp = _np.append(x, 0.0)  # reduceat end index may be len
                yp = _np.append(y, 0.0)
                two = _np.empty(2 * ns, dtype=_np.int64)
                for bi in range(n_out - 2):
                    lo, hi = edges[:, bi], edges[:, bi + 1]
                    nxt_lo = edges[:, bi + 1]
                    nxt_hi = edges[:, bi + 2] if bi + 2 < n_out - 1 else n
                    prev = off + sel[:, bi]
                    ax, ay = x[prev], y[prev]
                    two[0::2] = off + nxt_lo
                    two[1::2] = off + nxt_hi
                    cw = (nxt_hi - nxt_lo).astype(float)
                    cx = _np.add.reduceat(xp, two)[0::2] / cw
                    cy = _np.add.reduceat(yp, two)[0::2] / cw
                    w = hi - lo
                    col = _np.arange(int(w.max()), dtype=_np.int64)[None, :]
                    valid = col < w[:, None]
                    gidx = (off + lo)[:, None] + _np.where(valid, col, 0)
                    xg, yg = x[gidx], y[gidx]
                    area = _np.abs(
                        (ax - cx)[:, None] * (yg - ay[:, None])
                        - (ax[:, None] - xg) * (cy - ay)[:, None]
                    )
                    area = _np.where(valid, area, -1.0)
                    sel[:, bi + 1] = lo + _np.argmax(area, axis=1)
                rows = (off[:, None] + sel).ravel()
                uid = _np.repeat(
                    _np.array([int(p["user_id"].iloc[0]) for p in longs]),
                    n_out,
                )
                out.append(
                    pd.DataFrame(
                        {"user_id": uid, "event_id": eid[rows], "value": y[rows]}
                    )
                )
            if not out:
                return None
            return pd.concat(out, ignore_index=True)

        last_user = None
        for pdf in batches:
            for uid, grp in pdf.groupby("user_id", sort=False):
                buf.setdefault(int(uid), []).append(grp)
            # a series can span batches within the partition; flush only
            # users that cannot continue (everything except the last seen)
            last_user = int(pdf["user_id"].iloc[-1])
            done = [u for u in buf if u != last_user]
            if done:
                res = lttb_group(
                    [pd.concat(buf.pop(u)) for u in done]
                )
                if res is not None:
                    yield res
        if buf:
            res = lttb_group([pd.concat(buf.pop(u)) for u in list(buf)])
            if res is not None:
                yield res

    return part.mapInPandas(kernel, "user_id long, event_id long, value double")


COUNTER_RATE_ORACLE = """
WITH c AS (
    SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        CAST(sum(CAST(round(abs(value) * 100) AS BIGINT))
             OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             % 100000 AS BIGINT) AS ctr
    FROM events
), d AS (
    SELECT user_id, event_id, ctr,
        ctr - lag(ctr) OVER w AS delta,
        CAST(ts_us - lag(ts_us) OVER w AS DOUBLE) / 1000000.0 AS dt_s
    FROM c
    WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
)
SELECT user_id, event_id, ctr,
    CASE WHEN delta IS NULL THEN NULL
         WHEN delta >= 0 THEN delta ELSE ctr END AS increase_c,
    round(CASE WHEN delta IS NULL OR dt_s <= 0 THEN NULL
          WHEN delta >= 0 THEN (delta / 100.0) / dt_s
          ELSE (ctr / 100.0) / dt_s END, 6) AS rate
FROM d
"""


@query("win_counter_rate", oracle=COUNTER_RATE_ORACLE)
def win_counter_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Counter rate()/increase() with reset detection — the monitoring
    tsdb staple (Prometheus semantics: a negative delta means the
    counter reset, so the post-reset value counts as the increase from
    zero). The fixture has no native counter, so one is MODELED
    deterministically: running sum of |value| in exact integer cents,
    wrapped modulo 1e5 — a sawtooth with genuine resets, identical on
    both engines. All three frames (running sum, lag of counter, lag
    of ts) share ONE series-key window partitioning — a single
    shuffle; rate arithmetic is the same double ops in both engines,
    rounded at 6 for hygiene."""
    ev = Tables(spark, sf_dir).events
    us = F.unix_micros(F.col("ts"))
    w = W.partitionBy("user_id").orderBy(us, "event_id")
    wcum = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    cents = F.round(F.abs(F.col("value")) * 100).cast("long")
    ctr = (F.sum(cents).over(wcum) % F.lit(100000)).cast("long")
    d = ev.select(
        "user_id",
        "event_id",
        us.alias("_us"),
        ctr.alias("ctr"),
    )
    w2 = W.partitionBy("user_id").orderBy("_us", "event_id")
    delta = F.col("ctr") - F.lag("ctr").over(w2)
    dt_s = (F.col("_us") - F.lag("_us").over(w2)).cast("double") / F.lit(
        1000000.0
    )
    increase = F.when(delta.isNull(), F.lit(None)).when(
        delta >= 0, delta
    ).otherwise(F.col("ctr"))
    rate = F.when(delta.isNull() | (dt_s <= 0), F.lit(None)).otherwise(
        (increase.cast("double") / F.lit(100.0)) / dt_s
    )
    return d.select(
        "user_id",
        "event_id",
        "ctr",
        increase.alias("increase_c"),
        F.round(rate, 6).alias("rate"),
    )


@query(
    "win_xcorr",
    oracle="""
    WITH d AS (
      SELECT epoch_us(ts) // 86400000000 AS day_idx,
             CAST(sum(CAST(round(value * 100) AS BIGINT))
                  FILTER (event_type = 'click') AS DOUBLE) / 100.0 AS a_v,
             CAST(sum(CAST(round(value * 100) AS BIGINT))
                  FILTER (event_type = 'purchase') AS DOUBLE) / 100.0 AS b_v
      FROM events WHERE event_type IN ('click', 'purchase')
      GROUP BY 1
    ),
    l AS (SELECT unnest(range(0, 8)) AS lag_days)
    SELECT l.lag_days,
           round(corr(a.a_v, b.b_v), 6) + 0.0 AS xcorr,
           count(CASE WHEN a.a_v IS NOT NULL AND b.b_v IS NOT NULL
                      THEN 1 END) AS n_days
    FROM l
    JOIN d b ON TRUE
    JOIN d a ON a.day_idx = b.day_idx + l.lag_days
    GROUP BY l.lag_days
    """,
    tags=("timeseries", "windows"),
)
def win_xcorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead-lag cross-correlation between two series (does `purchase`
    volume predict `click` volume k days later?) — the tsdb causal-
    screening primitive (pandas idiom: ``a.corr(b.shift(k))`` per k).

    Shape: the fact table is scanned ONCE — a conditional daily
    aggregate puts both series in one row per day (map-side combined;
    the only exchange that scales with data). The lag alignment then
    runs entirely on the tiny daily table WITHOUT self-joining it
    (a self-join would re-execute the corpus aggregate per side —
    the duplicated-subtree trap): each daily row role-explodes into
    |lags| a-records keyed at its own day and |lags| b-records keyed
    at day + lag; grouping on (lag, pair day) reassembles each lagged
    pair, and a second tiny agg computes corr per lag. corr() is a
    one-pass streaming moment with partial merge; n_days counts only
    complete pairs (matches SQL corr's null-pair skipping). Daily sums
    are exact integer-cents totals (sum2 idiom — engine-identical on
    ANY data, round-6 boundary sweep) so corr sees bit-identical
    inputs; the result is
    round(6) + 0.0 (canonical -0) against ~1e-12 moment-fold noise."""
    ev = Tables(spark, sf_dir).events
    daily = (
        ev.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy(
            (F.unix_micros("ts") / F.lit(86_400_000_000))
            .cast("long")
            .alias("day_idx")
        )
        .agg(
            # exact integer-cents daily totals (round-6 boundary sweep:
            # rounded float sums are noise-unstable on cents boundaries,
            # and corr amplifies any input mismatch) — sum2 idiom
            (
                F.sum(
                    F.round(
                        F.when(
                            F.col("event_type") == "click", F.col("value")
                        )
                        * 100
                    ).cast("long")
                ).cast("double")
                / F.lit(100.0)
            ).alias("a_v"),
            (
                F.sum(
                    F.round(
                        F.when(
                            F.col("event_type") == "purchase", F.col("value")
                        )
                        * 100
                    ).cast("long")
                ).cast("double")
                / F.lit(100.0)
            ).alias("b_v"),
        )
    )
    lags = F.sequence(F.lit(0), F.lit(7))
    roles = daily.select(
        F.explode(
            F.flatten(
                F.array(
                    F.transform(
                        lags,
                        lambda k: F.struct(
                            k.alias("lag_days"),
                            F.col("day_idx").alias("pair_day"),
                            F.col("a_v").alias("av"),
                            F.lit(None).cast("double").alias("bv"),
                        ),
                    ),
                    F.transform(
                        lags,
                        lambda k: F.struct(
                            k.alias("lag_days"),
                            (F.col("day_idx") + k).alias("pair_day"),
                            F.lit(None).cast("double").alias("av"),
                            F.col("b_v").alias("bv"),
                        ),
                    ),
                )
            )
        ).alias("r")
    ).select("r.*")
    pairs = roles.groupBy("lag_days", "pair_day").agg(
        F.max("av").alias("av"), F.max("bv").alias("bv")
    )
    return pairs.groupBy("lag_days").agg(
        (F.round(F.corr("av", "bv"), 6) + F.lit(0.0)).alias("xcorr"),
        F.count(
            F.when(F.col("av").isNotNull() & F.col("bv").isNotNull(), 1)
        ).alias("n_days"),
    )


_DAY_US_INT = 86_400_000_000
_3D_US = 3 * _DAY_US_INT


@query(
    "win_decompose",
    oracle=f"""
    WITH d AS (
      SELECT user_id, (epoch_us(ts) // {_DAY_US_INT}) * {_DAY_US_INT} AS day_us,
             sum(CAST(round(value * 100) AS BIGINT)) AS c
      FROM events GROUP BY 1, 2
    ),
    t AS (
      SELECT *,
             CASE WHEN count(*) OVER w7 = 7
                  THEN sum(c) OVER w7 END AS s7
      FROM d
      WINDOW w7 AS (PARTITION BY user_id ORDER BY day_us
                    RANGE BETWEEN {_3D_US} PRECEDING
                          AND {_3D_US} FOLLOWING)
    ),
    s AS (
      SELECT *, 7 * c - s7 AS detr_s,
             (day_us // {_DAY_US_INT} + 4) % 7 AS dow
      FROM t
    ),
    z AS (
      SELECT *,
             sum(detr_s) OVER wd AS ssum,
             count(detr_s) OVER wd AS ng
      FROM s
      WINDOW wd AS (PARTITION BY user_id, dow)
    )
    SELECT user_id, day_us,
           CAST(c AS DOUBLE) / 100.0 AS daily_sum,
           CAST(s7 AS DOUBLE) / 700.0 AS trend,
           CASE WHEN ng > 0
                THEN CAST(ssum AS DOUBLE) / (700.0 * ng) END AS seasonal,
           CASE WHEN detr_s IS NOT NULL AND ng > 0
                THEN CAST(detr_s * ng - ssum AS DOUBLE) / (700.0 * ng)
           END AS resid
    FROM z
    """,
    tags=("timeseries", "windows"),
)
def win_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive seasonal decomposition per series (the
    statsmodels `seasonal_decompose(model='additive')` recipe a pandas
    user runs before anomaly scoring), on each user's daily-total
    series: trend = 7-day CENTERED moving average (null unless the
    +-3-day range holds a full 7 days — the classical edge behavior),
    seasonal = per-weekday mean of the detrended series, residual =
    detrended - seasonal.

    One exchange serves everything: the daily aggregate, the centered
    RANGE window, and the weekday window all partition by user_id, so
    after one hash exchange every step is a local sort/scan — the
    decomposition costs one shuffle regardless of series length.

    Determinism: the whole chain runs on EXACT BIGINT CENTS — daily
    total c (integer cents, the oracle_sum2 pattern), 7-day sum s7,
    detrended 7c - s7 (x700 scale), weekday sums of that — and every
    emitted double is ONE exact-integer-to-double division. No float
    accumulates anywhere, so there is no fold-order noise and no
    round-half tie to disagree on (the first cut of this op rounded a
    float windowed mean at digit 6 and hit 12 half-ties at sf0.01).
    Weekday from integer epoch-day arithmetic ((days+4)%7) — no
    timezone/locale in the key."""
    ev = Tables(spark, sf_dir).events
    d = ev.groupBy(
        "user_id",
        ((F.unix_micros("ts") / F.lit(_DAY_US_INT)).cast("long")
         * F.lit(_DAY_US_INT)).alias("day_us"),
    ).agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("c"))
    w7 = (
        W.partitionBy("user_id")
        .orderBy("day_us")
        .rangeBetween(-_3D_US, _3D_US)
    )
    t = d.withColumn(
        "s7", F.when(F.count("*").over(w7) == 7, F.sum("c").over(w7))
    )
    s = t.withColumn("detr_s", 7 * F.col("c") - F.col("s7")).withColumn(
        "dow",
        ((F.col("day_us") / F.lit(_DAY_US_INT)).cast("long") + 4) % 7,
    )
    wd = W.partitionBy("user_id", "dow")
    z = s.withColumn("ssum", F.sum("detr_s").over(wd)).withColumn(
        "ng", F.count("detr_s").over(wd)
    )
    return z.select(
        "user_id",
        "day_us",
        (F.col("c").cast("double") / 100.0).alias("daily_sum"),
        (F.col("s7").cast("double") / 700.0).alias("trend"),
        F.when(
            F.col("ng") > 0, F.col("ssum").cast("double") / (700.0 * F.col("ng"))
        ).alias("seasonal"),
        F.when(
            F.col("detr_s").isNotNull() & (F.col("ng") > 0),
            (F.col("detr_s") * F.col("ng") - F.col("ssum")).cast("double")
            / (700.0 * F.col("ng")),
        ).alias("resid"),
    )


@query(
    "win_kalman",
    oracle="""
    WITH RECURSIVE s AS (
        SELECT user_id, event_id, value,
               row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
        FROM events
    ), r AS (
        -- seed: x0 = z0, P0 = 1 (null z0 -> no information: x NULL, P
        -- grows by Q each missing step via the recursive CASE below).
        -- Every literal ::DOUBLE (bare literals are DECIMAL in DuckDB).
        SELECT user_id, event_id, value, rn,
               value AS x, 1.0::DOUBLE AS p
        FROM s WHERE rn = 1
        UNION ALL
        SELECT user_id, event_id, value, rn, x_new, p_new FROM (
            SELECT s.user_id, s.event_id, s.value, s.rn,
                   r.p + 0.001::DOUBLE AS pp,
                   pp / (pp + 0.04::DOUBLE) AS k,
                   CASE WHEN s.value IS NULL OR r.x IS NULL
                        THEN coalesce(r.x, s.value)
                        ELSE r.x + k * (s.value - r.x) END AS x_new,
                   CASE WHEN s.value IS NULL OR r.x IS NULL
                        THEN CASE WHEN s.value IS NULL THEN pp
                                  ELSE 1.0::DOUBLE END
                        ELSE (1.0::DOUBLE - k) * pp END AS p_new
            FROM r JOIN s ON s.user_id = r.user_id AND s.rn = r.rn + 1
        )
    )
    SELECT user_id, event_id, value, x AS kalman_level FROM r
    """,
    tags=("timeseries",),
)
def win_kalman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-D Kalman filter (local-level model, Q=0.001, R=0.04) per
    series — unlike ewm/holt this recurrence is NONLINEAR in its state
    (the gain K_t = P_t/(P_t+R) depends on the evolving covariance), so
    no closed-form window expression exists even in principle; it is
    the third member of the recursive-CTE-oracle family (round-3
    pattern: ewm's num/den, holt's level/trend, now x/P).

        predict:  Pp = P + Q
        gain:     K  = Pp / (Pp + R)
        update:   x  = x + K (z - x);  P = (1-K) Pp
        missing z: x carries forward, P = Pp (uncertainty grows);
        a series seeded by nulls takes the first real z as x0, P0 = 1.

    Kernel: win_ewm's across-series vectorized position loop — each
    step is a handful of numpy elementwise ops over all still-active
    series, and the per-element IEEE sequence (add, div, sub-mul-add,
    sub-mul) is exactly the CTE's, so kalman_level hashes RAW with no
    rounding. One user_id shuffle; cross-batch (x, P, seeded) state
    carries per user."""
    Q, R = 0.001, 0.04
    ev = Tables(spark, sf_dir).events.select("user_id", "event_id", "value")
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    part = ev.repartition(n_part, "user_id").sortWithinPartitions(
        "user_id", "event_id"
    )

    def kernel(batches):
        # user -> (x, P, seeded); unseeded series have x=nan
        carry: dict[int, tuple[float, float, bool]] = {}
        for pdf in batches:
            n = len(pdf)
            if not n:
                continue
            uid = pdf["user_id"].to_numpy()
            z = pdf["value"].to_numpy(dtype="float64")
            new = np.r_[True, uid[1:] != uid[:-1]]
            starts = np.flatnonzero(new)
            lens = np.diff(np.r_[starts, n])
            x = np.array(
                [carry.get(int(uid[s]), (np.nan, 1.0, False))[0] for s in starts]
            )
            P = np.array(
                [carry.get(int(uid[s]), (np.nan, 1.0, False))[1] for s in starts]
            )
            seeded = np.array(
                [carry.get(int(uid[s]), (np.nan, 1.0, False))[2] for s in starts]
            )
            out = np.empty(n)
            pos = starts.copy()
            active = np.arange(len(starts))
            step = 0
            while len(active):
                sel = pos[active]
                zz = z[sel]
                miss = np.isnan(zz)
                sd = seeded[active]
                xa = x[active]
                Pa = P[active]
                first = ~sd
                # seed branch: first real observation -> x=z, P=1
                xa = np.where(first & ~miss, zz, xa)
                Pa = np.where(first & ~miss, 1.0, Pa)
                # steady branch (seeded, z present): the CTE's exact order
                pp = Pa + Q
                k = pp / (pp + R)
                upd = sd & ~miss
                xa = np.where(upd, x[active] + k * (zz - x[active]), xa)
                Pa = np.where(upd, (1.0 - k) * pp, Pa)
                # missing z on a seeded series: carry x, grow P
                grow = sd & miss
                Pa = np.where(grow, pp, Pa)
                seeded[active] = sd | ~miss
                x[active] = xa
                P[active] = Pa
                out[sel] = xa
                pos[active] += 1
                step += 1
                active = active[lens[active] > step]
            for j, s in enumerate(starts):
                carry[int(uid[s])] = (float(x[j]), float(P[j]), bool(seeded[j]))
            res = pdf[["user_id", "event_id", "value"]].copy()
            if np.isnan(z).any():
                vc = pdf["value"].astype(object)
                vc[np.isnan(z)] = None
                res["value"] = vc
            # output gate keys on the OUTPUT array (cross-batch carry
            # discipline — see win_holt). For kalman the carry x is NaN
            # only while unseeded, which implies a missing z in THIS
            # batch at those rows, but gating on `out` is the invariant
            # that stays correct if the emit logic ever changes.
            if np.isnan(out).any():
                oc = out.astype(object)
                oc[np.isnan(out)] = None
                res["kalman_level"] = oc
            else:
                res["kalman_level"] = out
            yield res

    return part.mapInPandas(
        kernel, "user_id long, event_id long, value double, kalman_level double"
    )


@query("win_ewm_time", oracle=None)  # libm pow differs per engine: rows-only
def win_ewm_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-decayed EWM over irregular samples — weight 0.5^(dt/halflife)
    per OBSERVED gap (halflife 2 days), the pandas
    ewm(halflife=Timedelta, times=...) semantics; the sampling-rate-
    robust smoother (a fixed-alpha EWM over irregular data decays per
    ROW, so densely sampled regions smooth differently than sparse
    ones). Rows-only BY DESIGN: the decay needs pow/exp, and Spark
    (Java Math.pow), numpy (SIMD pow), and DuckDB (libm) each round
    within 1 ulp but not identically, so a recursive-CTE oracle would
    be one tie away from flaky — the check is the pandas differential
    behind TsFrame.ewm (tests/test_api.py::test_ewm_time_halflife) and
    this builder IS that API surface (dogfooding). Plan shape: the
    per-key Arrow kernel family (one user_id exchange)."""
    from pandas_tsdb_spark.api import TsFrame

    ev = Tables(spark, sf_dir).events.select("user_id", "ts", "event_id", "value")
    tf = TsFrame(ev, ts_col="ts", by="user_id", order_col="event_id")
    out = tf.ewm(halflife="2d").mean("value").to_df()
    return out.select(
        "user_id", "event_id", F.round("value_ewm", 6).alias("ewm_time")
    )


@query(
    "win_rsi",
    # Recursive-CTE oracle family (win_ewm/win_holt/win_kalman), here a
    # TWO-track recurrence: Wilder-style RSI-14 = ewm(alpha=1/14,
    # adjust=False) over the gain and loss series, anchored at the
    # first diff (rn=2, pandas drops the first NaN diff). Literals:
    # every constant spelled ::DOUBLE (DuckDB types bare decimals as
    # DECIMAL) and q spelled 1.0 - 1.0/14.0 exactly as the kernel
    # computes it. The diff d = value - lag(value) has identical
    # operands in both engines (one IEEE subtract); the recurrence
    # a*g + q*prev is mult, mult, add in both, so avg_gain/avg_loss
    # and the final rsi hash bit-identical RAW. Series of length 1
    # surface via the LEFT JOIN with NULL rsi.
    oracle="""
    WITH RECURSIVE s AS (
        SELECT user_id, event_id, value,
               value - lag(value) OVER
                   (PARTITION BY user_id ORDER BY event_id) AS d,
               row_number() OVER
                   (PARTITION BY user_id ORDER BY event_id) AS rn
        FROM events
    ), r AS (
        SELECT user_id, event_id, rn,
               CASE WHEN d > 0.0::DOUBLE THEN d
                    ELSE 0.0::DOUBLE END AS ag,
               CASE WHEN d < 0.0::DOUBLE THEN -d
                    ELSE 0.0::DOUBLE END AS al
        FROM s WHERE rn = 2
        UNION ALL
        SELECT s.user_id, s.event_id, s.rn,
               (1.0::DOUBLE / 14.0::DOUBLE)
                 * (CASE WHEN s.d > 0.0::DOUBLE THEN s.d
                         ELSE 0.0::DOUBLE END)
                 + (1.0::DOUBLE - 1.0::DOUBLE / 14.0::DOUBLE) * r.ag,
               (1.0::DOUBLE / 14.0::DOUBLE)
                 * (CASE WHEN s.d < 0.0::DOUBLE THEN -s.d
                         ELSE 0.0::DOUBLE END)
                 + (1.0::DOUBLE - 1.0::DOUBLE / 14.0::DOUBLE) * r.al
        FROM r JOIN s ON s.user_id = r.user_id AND s.rn = r.rn + 1
    )
    SELECT s.user_id, s.event_id, r.ag AS avg_gain, r.al AS avg_loss,
           CASE WHEN r.al = 0.0::DOUBLE THEN NULL
                ELSE 100.0::DOUBLE
                     - 100.0::DOUBLE / (1.0::DOUBLE + r.ag / r.al)
           END AS rsi
    FROM s LEFT JOIN r
      ON r.user_id = s.user_id AND r.event_id = s.event_id
    """,
    tags=("timeseries", "finance"),
)
def win_rsi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RSI-14 per series — the pandas finance idiom
    ``gain.ewm(alpha=1/14, adjust=False).mean()`` over diff gains and
    losses, ``rsi = 100 - 100/(1 + ag/al)`` (all-gain windows -> NULL,
    the deterministic choice both engines agree on).

    Same partition-batched shape as win_ewm: ONE shuffle to co-locate
    each series + sortWithinPartitions, then a mapInPandas kernel that
    runs the two-track recurrence vectorized ACROSS series (Python
    loop bounded by the longest series per batch). The diff is
    vectorized per batch with an exact per-user last-value carry, so
    a series spanning Arrow batches is seamless; per element the IEEE
    sequence (mult alpha·g, mult q·prev, add) matches the CTE exactly
    -> bit-identical raw doubles, full oracle.

    Null semantics (round-4 hardening, matching the oracle's CASE):
    a NULL value yields NULL diffs which count as gain=loss=0 — the
    decay ADVANCES without contribution (Wilder's convention for a
    missing bar), it does not freeze; only a series' true first row
    (oracle rn=1) emits NULL. Differential-tested on a null-injected
    events copy in tests/test_timeseries.py."""
    alpha = 1.0 / 14.0
    q = 1.0 - 1.0 / 14.0
    ev = Tables(spark, sf_dir).events.select("user_id", "event_id", "value")
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    part = ev.repartition(n_part, "user_id").sortWithinPartitions(
        "user_id", "event_id"
    )

    def kernel(batches):
        # user -> (has_state, avg_gain, avg_loss, last_value)
        carry: dict[int, tuple[bool, float, float, float]] = {}
        for pdf in batches:
            n = len(pdf)
            if not n:
                continue
            uid = pdf["user_id"].to_numpy()
            v = pdf["value"].to_numpy(dtype="float64")
            new = np.r_[True, uid[1:] != uid[:-1]]
            starts = np.flatnonzero(new)
            lens = np.diff(np.r_[starts, n])
            # vectorized diff with cross-batch last-value carry; rn1
            # marks a user's first-EVER row (oracle rn=1, absent from
            # its recursive r) — distinct from a null diff at rn>=2,
            # which the oracle maps to gain=loss=0 and advances
            d = np.empty(n)
            d[1:] = v[1:] - v[:-1]
            rn1 = np.zeros(n, dtype=bool)
            for s in starts:
                prev = carry.get(int(uid[s]))
                if prev is None:
                    d[s] = np.nan
                    rn1[s] = True
                else:
                    d[s] = v[s] - prev[3]
            gain = np.where(d > 0.0, d, 0.0)
            loss = np.where(d < 0.0, -d, 0.0)
            has = np.array(
                [carry.get(int(uid[s]), (False, 0.0, 0.0, 0.0))[0]
                 for s in starts]
            )
            ag = np.array(
                [carry.get(int(uid[s]), (False, 0.0, 0.0, 0.0))[1]
                 for s in starts]
            )
            al = np.array(
                [carry.get(int(uid[s]), (False, 0.0, 0.0, 0.0))[2]
                 for s in starts]
            )
            out_ag = np.full(n, np.nan)
            out_al = np.full(n, np.nan)
            pos = starts.copy()
            active = np.arange(len(starts))
            step = 0
            while len(active):
                sel = pos[active]
                m1 = rn1[sel]  # true first row of a never-seen series
                # gain/loss are already 0.0 where d is NaN (NaN > 0 is
                # False), matching the oracle's CASE-ELSE-0 on a NULL
                # diff: null values ADVANCE the decay with zero gain
                # instead of freezing the state (null-divergence fix)
                g = gain[sel]
                l = loss[sel]
                # recurrence where state exists (mult, mult, add — CTE
                # order); anchor ag=g at rn=2 (the first diff, null or not)
                nag = np.where(has[active], alpha * g + q * ag[active], g)
                nal = np.where(has[active], alpha * l + q * al[active], l)
                nag = np.where(m1, ag[active], nag)
                nal = np.where(m1, al[active], nal)
                emit = ~m1
                out_ag[sel[emit]] = nag[emit]
                out_al[sel[emit]] = nal[emit]
                ag[active] = nag
                al[active] = nal
                has[active] = has[active] | emit
                pos[active] += 1
                step += 1
                active = active[lens[active] > step]
            for k, s in enumerate(starts):
                e = int(starts[k] + lens[k] - 1)
                carry[int(uid[s])] = (
                    bool(has[k]), float(ag[k]), float(al[k]), float(v[e])
                )
            out = pdf[["user_id", "event_id"]].copy()
            miss_out = np.isnan(out_ag)
            with np.errstate(invalid="ignore", divide="ignore"):
                rsi = 100.0 - 100.0 / (1.0 + out_ag / out_al)
            cols = {"avg_gain": out_ag, "avg_loss": out_al, "rsi": rsi}
            for name, arr in cols.items():
                if name == "rsi":
                    bad = miss_out | (out_al == 0.0)
                else:
                    bad = miss_out
                if bad.any():
                    c = arr.astype(object)
                    c[bad] = None
                    out[name] = c
                else:
                    out[name] = arr
            yield out

    return part.mapInPandas(
        kernel,
        schema="user_id bigint, event_id bigint, avg_gain double, "
        "avg_loss double, rsi double",
    )


@query(
    "win_macd",
    # THREE chained recurrences in one recursive CTE via DuckDB lateral
    # column aliases (the win_kalman recipe): ema12/ema26 over value,
    # then the signal line = ema9 over the macd SERIES itself. Anchors
    # (rn=1) are plain assignments: e12=e26=v -> macd=0, sig=0, hist=0.
    # Every constant is spelled ::DOUBLE and q as 1 - 2/(span+1)
    # exactly as the kernel computes it; each step is mult, mult, add
    # then subtracts of identical operands -> bit-identical raw.
    oracle="""
    WITH RECURSIVE s AS (
        SELECT user_id, event_id, value,
               row_number() OVER
                   (PARTITION BY user_id ORDER BY event_id) AS rn
        FROM events
    ), r AS (
        SELECT user_id, event_id, rn,
               value + 0.0::DOUBLE AS e12,
               value + 0.0::DOUBLE AS e26,
               -- derived from value (not literal 0.0) so a NULL first
               -- observation anchors as NULL, matching the kernel's
               -- NaN poison; exact 0.0 for any finite value
               (value + 0.0::DOUBLE) - (value + 0.0::DOUBLE) AS macd,
               (value + 0.0::DOUBLE) - (value + 0.0::DOUBLE) AS sig
        FROM s WHERE rn = 1
        UNION ALL
        SELECT s.user_id, s.event_id, s.rn,
               (2.0::DOUBLE / 13.0::DOUBLE) * s.value
                 + (1.0::DOUBLE - 2.0::DOUBLE / 13.0::DOUBLE) * r.e12
                 AS e12n,
               (2.0::DOUBLE / 27.0::DOUBLE) * s.value
                 + (1.0::DOUBLE - 2.0::DOUBLE / 27.0::DOUBLE) * r.e26
                 AS e26n,
               e12n - e26n AS macdn,
               (2.0::DOUBLE / 10.0::DOUBLE) * macdn
                 + (1.0::DOUBLE - 2.0::DOUBLE / 10.0::DOUBLE) * r.sig
        FROM r JOIN s ON s.user_id = r.user_id AND s.rn = r.rn + 1
    )
    SELECT user_id, event_id, macd, sig AS macd_signal,
           macd - sig AS macd_hist
    FROM r
    """,
    tags=("timeseries", "finance"),
)
def win_macd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MACD(12, 26, 9) per series — ema12 − ema26 with a 9-span EMA
    signal line and histogram, all ``adjust=False`` (the classic
    charting recurrence), anchored at the first observation.

    Same one-shuffle partition-batched mapInPandas shape as
    win_ewm/win_rsi; the kernel carries THREE floats per series
    (e12, e26, sig) across Arrow batches and runs the recurrences
    vectorized across series. IEEE order per step matches the CTE
    (mult alpha·v, mult q·prev, add; macd/hist are subtracts of
    identical operands) -> full raw-double oracle. At 100 TB: one
    exchange on user_id, O(1) state per series."""
    a12, q12 = 2.0 / 13.0, 1.0 - 2.0 / 13.0
    a26, q26 = 2.0 / 27.0, 1.0 - 2.0 / 27.0
    a9, q9 = 2.0 / 10.0, 1.0 - 2.0 / 10.0
    ev = Tables(spark, sf_dir).events.select("user_id", "event_id", "value")
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    part = ev.repartition(n_part, "user_id").sortWithinPartitions(
        "user_id", "event_id"
    )

    def kernel(batches):
        carry: dict[int, tuple[float, float, float]] = {}
        for pdf in batches:
            n = len(pdf)
            if not n:
                continue
            uid = pdf["user_id"].to_numpy()
            v = pdf["value"].to_numpy(dtype="float64")
            new = np.r_[True, uid[1:] != uid[:-1]]
            starts = np.flatnonzero(new)
            lens = np.diff(np.r_[starts, n])
            has = np.array([int(uid[s]) in carry for s in starts])
            z = (0.0, 0.0, 0.0)
            e12 = np.array([carry.get(int(uid[s]), z)[0] for s in starts])
            e26 = np.array([carry.get(int(uid[s]), z)[1] for s in starts])
            sig = np.array([carry.get(int(uid[s]), z)[2] for s in starts])
            macd = np.empty(n)
            sigo = np.empty(n)
            pos = starts.copy()
            active = np.arange(len(starts))
            step = 0
            while len(active):
                sel = pos[active]
                vv = v[sel]
                h = has[active]
                n12 = np.where(h, a12 * vv + q12 * e12[active], vv)
                n26 = np.where(h, a26 * vv + q26 * e26[active], vv)
                nm = n12 - n26
                nsig = np.where(h, a9 * nm + q9 * sig[active], nm)
                macd[sel] = nm
                sigo[sel] = nsig
                e12[active] = n12
                e26[active] = n26
                sig[active] = nsig
                has[active] = True
                pos[active] += 1
                step += 1
                active = active[lens[active] > step]
            for k, s in enumerate(starts):
                carry[int(uid[s])] = (
                    float(e12[k]), float(e26[k]), float(sig[k])
                )
            out = pdf[["user_id", "event_id"]].copy()
            hist = macd - sigo
            # null inputs poison all three series from the first null on
            # (NaN kernel-side, NULL oracle-side, same rows) — emit the
            # NaNs as true SQL nulls so the representations agree. The
            # gate keys on each OUTPUT array, never on this batch's input:
            # a null in an earlier Arrow batch poisons the carried
            # (e12, e26, sig), so a later all-finite batch still yields
            # NaN outputs that must become SQL NULLs.
            for name, arr in (
                ("macd", macd), ("macd_signal", sigo), ("macd_hist", hist)
            ):
                if np.isnan(arr).any():
                    c = arr.astype(object)
                    c[np.isnan(arr)] = None
                    out[name] = c
                else:
                    out[name] = arr
            yield out

    return part.mapInPandas(
        kernel,
        schema="user_id bigint, event_id bigint, macd double, "
        "macd_signal double, macd_hist double",
    )
