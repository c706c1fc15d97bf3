"""pandas-tsdb-flavored fluent API over Spark DataFrames.

The reference is a pandas extension: users write
``df.rolling('7D').mean()``, ``pd.merge_asof(trades, quotes, by=...)``,
``df.resample('1D').ohlc()``. This module gives a user of that surface
the same verbs over a *distributed* Spark DataFrame — every method
compiles to the scale-shape the registered operators use (one shuffle
on the series key, window frames, union-and-window as-of), never to a
driver-side loop.

Semantics deliberately mirror pandas:

- ``TsFrame(df, ts_col, by)`` — explicit time column replaces the
  DatetimeIndex; ``by`` is the series key (pandas groupby level).
- ``rolling(n)`` (count) defaults ``min_periods=n`` like pandas;
  ``rolling('7D')`` (time) defaults ``min_periods=1`` like pandas.
- ``shift/diff/pct_change`` shift within the series, ordered by time.
- ``resample(freq)`` buckets the time axis (``agg``/``ohlc``/``ffill``).
- ``merge_asof`` supports ``direction='backward'|'forward'|'nearest'``
  and ``tolerance`` — the full pd.merge_asof matrix — via ONE
  union-and-window pass (no range-join pair explosion at scale).
- ``ewm(alpha).mean()`` is exact-recursive via a per-key Arrow kernel.

Ordering discipline: every per-series op orders by ``(ts, order_col)``
where ``order_col`` is a caller-supplied unique tie-break (default: no
tie-break — supply one when timestamps can collide, exactly like
sorting a pandas frame before rolling).
"""

from __future__ import annotations

import re
from collections.abc import Sequence

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

__all__ = ["TsFrame"]

_UNIT_US = {
    "s": 1_000_000,
    "sec": 1_000_000,
    "second": 1_000_000,
    "min": 60_000_000,
    "t": 60_000_000,
    "h": 3_600_000_000,
    "hour": 3_600_000_000,
    "d": 86_400_000_000,
    "day": 86_400_000_000,
}

# fixed-width units only — W/M/Q/Y route through _calendar_bucket with
# pandas end-anchored label semantics instead of a start-of-period trunc
_TRUNC_UNIT = {
    "s": "second",
    "sec": "second",
    "second": "second",
    "min": "minute",
    "t": "minute",
    "h": "hour",
    "hour": "hour",
    "d": "day",
    "day": "day",
}


def _parse_freq(freq: str) -> tuple[int, str]:
    """'7D' -> (7, 'd'); 'h' -> (1, 'h'); '30min' -> (30, 'min')."""
    m = re.fullmatch(r"(\d*)\s*([A-Za-z]+)", freq.strip())
    if not m:
        raise ValueError(f"unparseable frequency: {freq!r}")
    n = int(m.group(1) or 1)
    unit = m.group(2).lower()
    return n, unit


_ANCHOR_DAYS = {
    "mon": "Mon", "tue": "Tue", "wed": "Wed", "thu": "Thu",
    "fri": "Fri", "sat": "Sat", "sun": "Sun",
}


def _calendar_bucket(freq: str, ts_col: str | Column) -> Column | None:
    """pandas calendar/anchored resample labels, or None for fixed-width
    frequencies.

    Supported: 'W' (= 'W-SUN'), 'W-MON'..'W-SUN', 'M'/'ME', 'Q'/'QE',
    'Y'/'A'/'YE', 'B'. Label semantics mirror pandas resample defaults:
    M/Q/Y/W are right-closed-right-labeled period bins — every row of
    the period labels at the period END date (pandas adjusts calendar
    bin edges to end-of-day, so intraday times on the label day stay in
    that period); 'B' is left-labeled — weekend rows label at the
    preceding Friday. Calendar periods are not fixed-width µs spans, so
    these never go through the epoch-floor path; each is a date
    expression Catalyst folds into the groupBy key (plain hash agg,
    same scale shape as date_trunc)."""
    m = re.fullmatch(r"(\d*)\s*([A-Za-z]+)(?:-([A-Za-z]+))?", freq.strip())
    if not m:
        return None
    n = int(m.group(1) or 1)
    unit = m.group(2).lower()
    anchor = (m.group(3) or "").lower()
    d = F.to_date(F.col(ts_col) if isinstance(ts_col, str) else ts_col)
    if unit == "w" or unit == "week":
        day = _ANCHOR_DAYS.get(anchor or "sun")
        if day is None:
            raise ValueError(f"unknown week anchor in {freq!r}")
        # week ending on `day`: same-day-or-next anchor day of ts.date()
        lab = F.next_day(F.date_sub(d, 1), day)
    elif anchor:
        raise ValueError(f"anchor only supported on weekly frequencies: {freq!r}")
    elif unit in ("m", "mon", "month", "me"):
        lab = F.last_day(d)
    elif unit in ("q", "qe", "quarter"):
        lab = F.last_day(F.add_months(F.trunc(d, "quarter"), 2))
    elif unit in ("y", "a", "ye", "year"):
        lab = F.last_day(F.add_months(F.trunc(d, "year"), 11))
    elif unit == "b":
        dow = F.dayofweek(d)  # Sun=1 .. Sat=7
        lab = (
            F.when(dow == 1, F.date_sub(d, 2))
            .when(dow == 7, F.date_sub(d, 1))
            .otherwise(d)
        )
    else:
        return None
    if n != 1:
        raise ValueError(
            f"calendar frequencies support n=1 only (got {freq!r}); "
            "multiples would need data-anchored bins like pandas '3ME'"
        )
    return lab.cast("timestamp")


def _freq_us(freq: str) -> int:
    n, unit = _parse_freq(freq)
    if unit not in _UNIT_US:
        raise ValueError(f"time-window frequency must be sub-month: {freq!r}")
    return n * _UNIT_US[unit]


class TsFrame:
    """A Spark DataFrame with an explicit time axis and series key.

    ``by`` (str | list[str] | None): the per-series partition key. When
    None, series ops run over ONE global series — correct, but a single
    partition at scale; prefer a key.

    TIMEZONE CONTRACT. The engine pins ``spark.sql.session.timeZone``
    to UTC (session.RUNTIME_CONFS) and treats every timestamp column as
    a UTC instant — naive input (the fixtures, pandas naive frames) IS
    UTC. ``tz`` (e.g. ``"America/New_York"``) opts the CALENDAR surface
    into local wall-clock semantics, matching pandas on a tz-aware
    DatetimeIndex:

    - ``resample`` with day/calendar frequencies (D, W/W-MON.., M, Q,
      Y, B) buckets rows by their LOCAL date — a DST spring-forward day
      is a real 23-hour bucket, fall-back 25 — and labels each bucket
      with the UTC INSTANT of its local label midnight (what pandas
      shows after ``.tz_convert("UTC").tz_localize(None)``).
    - Sub-day frequencies keep instant semantics with or without tz,
      exactly like pandas: a tz-aware '1h' resample bins by absolute
      hour, so DST neither merges nor splits sub-day buckets.
    - ``rolling(window="...")`` over a time range is duration-based on
      instants — tz-invariant by definition — and is deliberately NOT
      affected by ``tz`` (pandas behaves the same).
    - The densifying fill paths (``asfreq``/``ffill``/``interpolate``)
      are UTC-only: their calendar grids step fixed widths, which a
      23/25-hour day breaks. They raise under ``tz`` rather than emit
      silently-shifted grids.
    """

    def __init__(
        self,
        df: DataFrame,
        ts_col: str = "ts",
        by: str | Sequence[str] | None = None,
        order_col: str | None = None,
        tz: str | None = None,
    ):
        self.df = df
        self.ts_col = ts_col
        self.by = [by] if isinstance(by, str) else list(by or [])
        self.order_col = order_col
        self.tz = tz

    # -- plumbing ---------------------------------------------------------

    def _wrap(self, df: DataFrame) -> "TsFrame":
        return TsFrame(df, self.ts_col, self.by, self.order_col, self.tz)

    def _order(self) -> list[Column]:
        keys = [F.col(self.ts_col)]
        if self.order_col:
            keys.append(F.col(self.order_col))
        return keys

    def _win(self) -> W:
        return W.partitionBy(*self.by).orderBy(*self._order())

    def to_df(self) -> DataFrame:
        return self.df

    def to_pandas(self) -> pd.DataFrame:
        return self.df.toPandas()

    def sanitize_specials(self, *cols: str) -> "TsFrame":
        """NaN/±Inf -> NULL in the given double columns (every double
        column when none are named) — the engine's measure contract
        (catalog._MEASURE_DOUBLES) applied to a user-supplied frame.

        Frames arriving FROM pandas already get NaN -> NULL at the
        Arrow boundary; Spark-native frames keep IEEE specials, where
        one NaN poisons running aggregates and ±Inf breaks
        integer-exact sums. Call this once at ingest; it is one codegen
        CASE per column, no shuffle, no Python."""
        from pandas_tsdb_spark.catalog import sanitize_special

        targets = list(cols) or [
            f.name
            for f in self.df.schema.fields
            if isinstance(f.dataType, DoubleType)
        ]
        out = self.df
        for c in targets:
            out = out.withColumn(c, sanitize_special(c))
        return self._wrap(out)

    # -- indexing / slicing ----------------------------------------------

    def between(self, start, end) -> "TsFrame":
        """DatetimeIndex slice df[a:b] — inclusive both ends, like
        pandas .loc on a sorted index."""
        c = F.col(self.ts_col)
        return self._wrap(self.df.filter(c.between(F.lit(start), F.lit(end))))

    def between_time(self, start: str, end: str) -> "TsFrame":
        """df.between_time('09:30', '16:00') — inclusive bounds."""

        def mod(hhmm: str) -> int:
            hh, mm = hhmm.split(":")
            return int(hh) * 60 + int(mm)

        c = F.hour(self.ts_col) * 60 + F.minute(self.ts_col)
        return self._wrap(self.df.filter(c.between(mod(start), mod(end))))

    # -- per-series shifts ------------------------------------------------

    def shift(self, col: str, n: int = 1, out: str | None = None) -> "TsFrame":
        fn = F.lag(col, n) if n >= 0 else F.lead(col, -n)
        return self._wrap(
            self.df.withColumn(out or f"{col}_shift", fn.over(self._win()))
        )

    def diff(self, col: str, n: int = 1, out: str | None = None) -> "TsFrame":
        d = F.col(col) - F.lag(col, n).over(self._win())
        return self._wrap(self.df.withColumn(out or f"{col}_diff", d))

    def pct_change(self, col: str, n: int = 1, out: str | None = None) -> "TsFrame":
        # NULLIF: a zero previous value must not throw under ANSI mode
        # (pandas yields inf there; NULL is the deterministic Spark twin)
        prev = F.lag(col, n).over(self._win())
        return self._wrap(
            self.df.withColumn(
                out or f"{col}_pct",
                (F.col(col) - prev) / F.nullif(prev, F.lit(0)),
            )
        )

    def _cum(self, col: str, fn, out: str) -> "TsFrame":
        # pandas cumsum/cummax/cummin skip NaN but PRESERVE it at the
        # null positions (found by tests/test_api_fuzz.py: a bare
        # F.sum().over() emits the running value at null rows)
        w = self._win().rowsBetween(W.unboundedPreceding, W.currentRow)
        expr = F.when(F.col(col).isNotNull(), fn(col).over(w))
        return self._wrap(self.df.withColumn(out, expr))

    def cumsum(self, col: str, out: str | None = None) -> "TsFrame":
        return self._cum(col, F.sum, out or f"{col}_cumsum")

    def cummax(self, col: str, out: str | None = None) -> "TsFrame":
        return self._cum(col, F.max, out or f"{col}_cummax")

    def cummin(self, col: str, out: str | None = None) -> "TsFrame":
        return self._cum(col, F.min, out or f"{col}_cummin")

    def clip(
        self,
        col: str,
        lower: float | None = None,
        upper: float | None = None,
        out: str | None = None,
    ) -> "TsFrame":
        """pandas ``Series.clip(lower, upper)`` — pure map-side
        projection, no shuffle. Nulls stay null (Spark's least/greatest
        skip nulls, which would RESURRECT them as the bound — guarded
        explicitly)."""
        expr = F.col(col)
        if upper is not None:
            expr = F.least(expr, F.lit(upper))
        if lower is not None:
            expr = F.greatest(expr, F.lit(lower))
        expr = F.when(F.col(col).isNotNull(), expr)
        return self._wrap(self.df.withColumn(out or f"{col}_clip", expr))

    def zscore(self, col: str, out: str | None = None) -> "TsFrame":
        # NULLIF: a constant series has std 0 — pandas yields NaN
        # (0/0), ANSI Spark would throw (tests/test_api_fuzz.py)
        w = W.partitionBy(*self.by)
        z = (F.col(col) - F.avg(col).over(w)) / F.nullif(
            F.stddev_samp(col).over(w), F.lit(0.0)
        )
        return self._wrap(self.df.withColumn(out or f"{col}_z", z))

    # -- windows ----------------------------------------------------------

    def rolling(
        self,
        window: int | str,
        min_periods: int | None = None,
        center: bool = False,
    ) -> "Rolling":
        return Rolling(self, window, min_periods, center)

    def expanding(self, min_periods: int = 1) -> "Rolling":
        return Rolling(self, None, min_periods)

    def ewm(
        self,
        alpha: float | None = None,
        adjust: bool = True,
        *,
        com: float | None = None,
        span: float | None = None,
        halflife: float | None = None,
    ) -> "Ewm":
        """pandas decay aliases: exactly one of alpha / com / span /
        halflife (a = 1/(1+com) = 2/(span+1) = 1-exp(ln 0.5/halflife) —
        the same float64 conversions pandas applies, so results match
        the equivalent pandas call bit-for-bit through the kernels)."""
        import math

        given = [v is not None for v in (alpha, com, span, halflife)]
        if sum(given) != 1:
            raise ValueError("exactly one of alpha/com/span/halflife")
        if isinstance(halflife, str):
            # TIME-decayed EWM over irregular samples (pandas
            # ewm(halflife=Timedelta, times=index)): weight 0.5^(dt/hl)
            # per OBSERVED gap, using the frame's ts_col as times.
            # pandas only defines this for adjust=True.
            if not adjust:
                raise ValueError("time halflife requires adjust=True")
            return Ewm(self, None, True, time_halflife=halflife)
        if com is not None:
            if com < 0:
                raise ValueError("com >= 0")
            alpha = 1.0 / (1.0 + com)
        elif span is not None:
            if span < 1:
                raise ValueError("span >= 1")
            alpha = 2.0 / (span + 1.0)
        elif halflife is not None:
            if halflife <= 0:
                raise ValueError("halflife > 0")
            alpha = 1.0 - math.exp(math.log(0.5) / halflife)
        return Ewm(self, alpha, adjust)

    def resample(self, freq: str) -> "Resampler":
        return Resampler(self, freq)

    # -- joins ------------------------------------------------------------

    def merge_asof(
        self,
        right: DataFrame,
        right_cols: Sequence[str],
        direction: str = "backward",
        tolerance: str | None = None,
        suffix: str = "_r",
        allow_exact_matches: bool = True,
        left_by: str | Sequence[str] | None = None,
        right_by: str | Sequence[str] | None = None,
    ) -> "TsFrame":
        """pd.merge_asof(self, right, on=ts_col, by=self.by).

        ``right_cols``: value columns to bring over from ``right`` (each
        lands as ``{col}{suffix}``). Union-and-window: ONE shuffle on
        ``by``, one sort, no candidate-pair materialization — survives
        any right-side density.

        ``allow_exact_matches`` (pandas parity): True matches equal
        timestamps inclusively in the chosen direction; False requires a
        strictly earlier/later right row. Implemented as an ORDER flip,
        not a filter: right rows at an equal timestamp sort after (for
        backward) / before (for forward) the left row, falling outside
        its one-sided window frame — same single shuffle either way.

        ``left_by``/``right_by`` (pandas parity): asymmetric key names —
        ``right_by`` columns are renamed to ``left_by`` before the
        union; ``left_by`` defaults to the frame's ``by``."""
        if direction not in ("backward", "forward", "nearest"):
            raise ValueError(direction)
        tol_us = _freq_us(tolerance) if tolerance else None
        lby = [left_by] if isinstance(left_by, str) else list(left_by or self.by)
        rby = [right_by] if isinstance(right_by, str) else list(right_by or lby)
        if len(lby) != len(rby):
            raise ValueError(
                f"left_by/right_by length mismatch: {lby} vs {rby}"
            )
        if rby != lby:
            right = right.withColumnsRenamed(dict(zip(rby, lby)))
        ts, by = self.ts_col, lby
        val_cols = [c for c in self.df.columns]
        tus = F.unix_micros(F.col(ts))

        sides = []
        need_b = direction in ("backward", "nearest")
        need_f = direction in ("forward", "nearest")
        b_side = 0 if allow_exact_matches else 2
        f_side = 2 if allow_exact_matches else 0
        null_of = {c: F.lit(None).cast(self.df.schema[c].dataType) for c in val_cols}

        def rnulls(prefix):
            out = []
            for c in right_cols:
                out.append(
                    F.lit(None).cast(right.schema[c].dataType).alias(f"_{prefix}_{c}")
                )
            out.append(F.lit(None).cast("long").alias(f"_{prefix}_tus"))
            return out

        left_side = self.df.select(
            *val_cols,
            F.lit(1).alias("_side"),
            *rnulls("b"),
            *rnulls("f"),
        )
        sides.append(left_side)
        # right rows carry NULL left payload except the join keys
        rkeys = set(by) | {ts}
        rsel_common = [
            (F.col(c).alias(c) if c in rkeys else null_of[c].alias(c))
            for c in val_cols
        ]
        if need_b:
            sides.append(
                right.select(
                    *rsel_common,
                    F.lit(b_side).alias("_side"),
                    *[F.col(c).alias(f"_b_{c}") for c in right_cols],
                    F.unix_micros(F.col(ts)).alias("_b_tus"),
                    *rnulls("f"),
                )
            )
        if need_f:
            sides.append(
                right.select(
                    *rsel_common,
                    F.lit(f_side).alias("_side"),
                    *rnulls("b"),
                    *[F.col(c).alias(f"_f_{c}") for c in right_cols],
                    F.unix_micros(F.col(ts)).alias("_f_tus"),
                )
            )
        u = sides[0]
        for s in sides[1:]:
            u = u.unionByName(s)

        order = [F.col(ts), F.col("_side")]
        if self.order_col:
            order.append(F.col(self.order_col))
        w_b = (
            W.partitionBy(*by).orderBy(*order)
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        w_f = (
            W.partitionBy(*by).orderBy(*order)
            .rowsBetween(W.currentRow, W.unboundedFollowing)
        )
        proj = [F.col(c) for c in val_cols] + [F.col("_side")]
        if need_b:
            for c in right_cols:
                proj.append(
                    F.last(f"_b_{c}", ignorenulls=True).over(w_b).alias(f"_bv_{c}")
                )
            proj.append(F.last("_b_tus", ignorenulls=True).over(w_b).alias("_bv_tus"))
        if need_f:
            for c in right_cols:
                proj.append(
                    F.first(f"_f_{c}", ignorenulls=True).over(w_f).alias(f"_fv_{c}")
                )
            proj.append(F.first("_f_tus", ignorenulls=True).over(w_f).alias("_fv_tus"))
        u = u.select(*proj).filter(F.col("_side") == 1)

        b_ok = F.lit(need_b)
        f_ok = F.lit(need_f)
        if need_b:
            b_dist = tus - F.col("_bv_tus")
            b_ok = F.col("_bv_tus").isNotNull() & (
                (b_dist <= tol_us) if tol_us else F.lit(True)
            )
        if need_f:
            f_dist = F.col("_fv_tus") - tus
            f_ok = F.col("_fv_tus").isNotNull() & (
                (f_dist <= tol_us) if tol_us else F.lit(True)
            )
        out = u
        for c in right_cols:
            if direction == "backward":
                v = F.when(b_ok, F.col(f"_bv_{c}"))
            elif direction == "forward":
                v = F.when(f_ok, F.col(f"_fv_{c}"))
            else:
                v = (
                    F.when(b_ok & f_ok & (b_dist <= f_dist), F.col(f"_bv_{c}"))
                    .when(b_ok & f_ok, F.col(f"_fv_{c}"))
                    .when(b_ok, F.col(f"_bv_{c}"))
                    .when(f_ok, F.col(f"_fv_{c}"))
                )
            out = out.withColumn(f"{c}{suffix}", v)
        drop = ["_side"]
        drop += [f"_bv_{c}" for c in right_cols] + ["_bv_tus"] if need_b else []
        drop += [f"_fv_{c}" for c in right_cols] + ["_fv_tus"] if need_f else []
        return self._wrap(out.drop(*drop))

    def merge_ordered(
        self,
        right: DataFrame,
        left_cols: Sequence[str],
        right_cols: Sequence[str],
        fill_method: str | None = "ffill",
    ) -> "TsFrame":
        """pandas ``pd.merge_ordered(left, right, on=ts, left_by=by,
        fill_method='ffill')`` — full ordered outer merge of two event
        streams per series: the output carries every timestamp from
        EITHER side, and each side's value columns are forward-filled
        across the rows the other side contributed (``fill_method=None``
        leaves the join nulls).

        Fill semantics (pinned by the round-3 fuzz matrix): pandas
        repeats each side's last ROW, not its last non-null VALUE — a
        merge-introduced gap after a row whose own value is NaN fills
        with that NaN. Implemented by forward-filling a presence-marked
        STRUCT of the side's columns ("row present" is non-null even
        when every field is null) and unpacking; a plain
        last(ignorenulls=True) on the value column would silently skip
        the null rows (the first draft's bug, caught by hypothesis).

        Full-outer join on (by, ts) + one ordered window for the fills —
        both on the same series key, so the whole merge is one exchange
        per side and one shared sort, never a per-row loop. Rows with
        equal timestamps on both sides merge into one row (outer-join
        key equality), matching merge_ordered on a unique-ts index."""
        ts, by = self.ts_col, self.by
        lf = self.df.select(*by, ts, F.lit(True).alias("_lp"), *left_cols)
        rf = right.select(*by, ts, F.lit(True).alias("_rp"), *right_cols)
        out = lf.join(rf, on=[*by, ts], how="full")
        if fill_method == "ffill":
            w = (
                W.partitionBy(*by)
                .orderBy(ts)
                .rowsBetween(W.unboundedPreceding, W.currentRow)
            )
            ls = F.last(
                F.when(F.col("_lp"), F.struct(*left_cols)), ignorenulls=True
            ).over(w)
            rs = F.last(
                F.when(F.col("_rp"), F.struct(*right_cols)), ignorenulls=True
            ).over(w)
            out = out.select(
                *by,
                ts,
                *[ls.getField(c).alias(c) for c in left_cols],
                *[rs.getField(c).alias(c) for c in right_cols],
            )
        elif fill_method is None:
            out = out.drop("_lp", "_rp")
        else:
            raise ValueError(fill_method)
        return TsFrame(out, ts_col=ts, by=by)

    def interpolate(
        self,
        col: str,
        method: str = "linear",
        out: str | None = None,
        limit: int | None = None,
    ) -> "TsFrame":
        """pandas ``df.interpolate(method=..., limit=...)`` per series
        over the RAW (possibly irregular) time axis.

        - ``linear``: positional — equal weight per row, like pandas on
          any index (its default ignores the index values).
        - ``time``: weighted by timestamp distance (pandas
          method='time' on a DatetimeIndex).
        - ``pad``/``ffill``: carry the previous known value forward.
        - ``nearest``: closer known neighbor by timestamp; exact
          midpoint takes the PREVIOUS value (scipy interp1d
          kind='nearest' rounds half down; pandas delegates to scipy).

        pandas edge semantics throughout (limit_direction='forward'):
        leading nulls stay null, trailing nulls pad the last known
        value, ``limit`` caps consecutive fills counted in rows from
        the previous known value.

        ONE shuffle on the series key: every ingredient (prev/next
        known value and coordinate, row position) is a frame over the
        same (by, ts) window partitioning — no join, no kernel."""
        if method not in ("linear", "time", "pad", "ffill", "nearest"):
            raise ValueError(f"unknown interpolation method: {method!r}")
        out = out or f"{col}_interp"
        v = F.col(col)
        wp = self._win().rowsBetween(W.unboundedPreceding, W.currentRow)
        wn = self._win().rowsBetween(W.currentRow, W.unboundedFollowing)
        pos = F.row_number().over(self._win()).cast("double")
        prev_pos = F.last(F.when(v.isNotNull(), pos), ignorenulls=True).over(wp)
        prev_v = F.last(col, ignorenulls=True).over(wp)
        within_limit = (
            (pos - prev_pos) <= limit if limit is not None else F.lit(True)
        )
        if method in ("pad", "ffill"):
            expr = F.when(v.isNotNull() | within_limit, prev_v)
            return self._wrap(self.df.withColumn(out, expr))
        x = (
            pos
            if method == "linear"
            else F.unix_micros(F.col(self.ts_col)).cast("double")
        )
        known_x = F.when(v.isNotNull(), x)
        prev_x = F.last(known_x, ignorenulls=True).over(wp)
        next_v = F.first(col, ignorenulls=True).over(wn)
        next_x = F.first(known_x, ignorenulls=True).over(wn)
        if method == "nearest":
            mid = F.when((x - prev_x) <= (next_x - x), prev_v).otherwise(next_v)
        else:
            # zero-width gap (duplicate timestamps around the nulls):
            # NULLIF keeps ANSI division from throwing; pandas resolves
            # the degenerate lerp to the NEXT value (np.interp takes
            # the later duplicate) — found by tests/test_api_fuzz.py
            denom = F.nullif(next_x - prev_x, F.lit(0.0))
            mid = F.coalesce(
                prev_v + (next_v - prev_v) * (x - prev_x) / denom, next_v
            )
        expr = (
            F.when(v.isNotNull(), v)
            .when(~within_limit, F.lit(None))
            .when(prev_v.isNull(), F.lit(None))
            .when(next_v.isNull(), prev_v)
            .otherwise(mid)
        )
        return self._wrap(self.df.withColumn(out, expr))

    def ffill(self, col: str, out: str | None = None, limit: int | None = None) -> "TsFrame":
        """pandas ``df.ffill(limit=...)`` per series — carry the
        previous known value forward (same window pass as
        interpolate(method='pad'))."""
        return self.interpolate(
            col, method="pad", out=out or f"{col}_ffill", limit=limit
        )

    def bfill(self, col: str, out: str | None = None, limit: int | None = None) -> "TsFrame":
        """pandas ``df.bfill(limit=...)`` per series — carry the next
        known value backward; ``limit`` counts rows to the next known
        value. Mirror frame of ffill, same single series-key shuffle."""
        out = out or f"{col}_bfill"
        v = F.col(col)
        wn = self._win().rowsBetween(W.currentRow, W.unboundedFollowing)
        next_v = F.first(col, ignorenulls=True).over(wn)
        if limit is None:
            return self._wrap(self.df.withColumn(out, next_v))
        pos = F.row_number().over(self._win()).cast("double")
        next_pos = F.first(F.when(v.isNotNull(), pos), ignorenulls=True).over(wn)
        expr = F.when(v.isNotNull() | ((next_pos - pos) <= limit), next_v)
        return self._wrap(self.df.withColumn(out, expr))

    def fillna(self, value: float, cols: "Sequence[str] | None" = None) -> "TsFrame":
        """pandas ``df.fillna(value)`` — constant fill, map-only."""
        return self._wrap(
            self.df.na.fill(value, subset=list(cols) if cols else None)
        )

    def dropna(self, cols: "Sequence[str] | None" = None) -> "TsFrame":
        """pandas ``df.dropna(subset=...)`` — row filter, map-only."""
        return self._wrap(
            self.df.na.drop(subset=list(cols) if cols else None)
        )

    # -- sessions ---------------------------------------------------------

    def sessionize(self, gap: str, out: str = "session_id") -> "TsFrame":
        """Assign session ids per series: a new session starts when the
        gap to the previous event exceeds ``gap``. One window pass."""
        gap_us = _freq_us(gap)
        w = self._win()
        prev = F.lag(F.unix_micros(F.col(self.ts_col))).over(w)
        new_sess = (
            F.unix_micros(F.col(self.ts_col)) - F.coalesce(prev, F.lit(-(1 << 62)))
            > gap_us
        ).cast("long")
        return self._wrap(
            self.df.withColumn(
                out,
                F.sum(new_sess).over(
                    self._win().rowsBetween(W.unboundedPreceding, W.currentRow)
                ),
            )
        )


class Rolling:
    """rolling(n) / rolling('7D') / expanding() aggregation surface.
    ``center=True`` (count windows only) centers the frame on the
    current row like pandas: rows [i-w//2, i+(w-1)//2]."""

    def __init__(
        self,
        tf: TsFrame,
        window: int | str | None,
        min_periods: int | None,
        center: bool = False,
    ):
        if center and not isinstance(window, int):
            raise ValueError("center=True needs a count window")
        self.tf = tf
        self.window = window
        self.center = center
        if window is None:  # expanding
            self.min_periods = min_periods or 1
        elif isinstance(window, int):
            self.min_periods = window if min_periods is None else min_periods
        else:
            self.min_periods = 1 if min_periods is None else min_periods

    def _frame(self):
        if self.window is None:
            return self.tf._win().rowsBetween(W.unboundedPreceding, W.currentRow)
        if isinstance(self.window, int):
            if self.center:
                # pandas puts the even-window extra row BEFORE the
                # current row: [i - w//2, i + (w-1)//2]
                w = self.window
                return self.tf._win().rowsBetween(-(w // 2), (w - 1) // 2)
            return self.tf._win().rowsBetween(-(self.window - 1), 0)
        span = _freq_us(self.window)
        w = W.partitionBy(*self.tf.by).orderBy(
            F.unix_micros(F.col(self.tf.ts_col))
        )
        return w.rangeBetween(-(span - 1), 0)

    def _apply(self, col: str, fn, out: str) -> TsFrame:
        w = self._frame()
        guarded = F.when(F.count(col).over(w) >= self.min_periods, fn(col).over(w))
        return self.tf._wrap(self.tf.df.withColumn(out, guarded))

    def mean(self, col: str, out: str | None = None) -> TsFrame:
        return self._apply(col, F.avg, out or f"{col}_mean")

    def sum(self, col: str, out: str | None = None) -> TsFrame:
        return self._apply(col, F.sum, out or f"{col}_sum")

    def min(self, col: str, out: str | None = None) -> TsFrame:
        return self._apply(col, F.min, out or f"{col}_min")

    def max(self, col: str, out: str | None = None) -> TsFrame:
        return self._apply(col, F.max, out or f"{col}_max")

    def count(self, col: str, out: str | None = None) -> TsFrame:
        w = self._frame()
        return self.tf._wrap(
            self.tf.df.withColumn(out or f"{col}_count", F.count(col).over(w))
        )

    def std(self, col: str, out: str | None = None) -> TsFrame:
        return self._apply(col, F.stddev_samp, out or f"{col}_std")

    def var(self, col: str, out: str | None = None) -> TsFrame:
        return self._apply(col, F.var_samp, out or f"{col}_var")

    def apply(self, col: str, fn, out: str | None = None) -> TsFrame:
        """pandas ``rolling(...).apply(fn, raw=True)`` — the generic
        escape hatch for window statistics no built-in expresses.

        This is deliberately the SLOW path (fn is Python, evaluated once
        per row over its window): every other Rolling method compiles to
        a JVM window expression and should be preferred. The kernel runs
        per SERIES via one Arrow-batched applyInPandas (one shuffle on
        the series key — the same exchange every Rolling op pays), with
        pandas computing the rolling apply inside the group, so the cost
        is per-core-bounded Python, never a driver loop. Row windows use
        pandas ``rolling(n)``; time windows pass the '7D'/'30min' string
        through (identical (t-span, t] framing to the JVM rangeBetween
        path); expanding() maps to ``expanding(min_periods)``."""
        tf = self.tf
        out = out or f"{col}_apply"
        ddl = ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in tf.df.schema.fields
        ) + f", {out} double"
        ts_col, order_col, by = tf.ts_col, tf.order_col, tf.by
        window, min_periods = self.window, self.min_periods

        def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
            sort_keys = [ts_col] + ([order_col] if order_col else [])
            pdf = pdf.sort_values(sort_keys)
            s = pdf[col]
            if window is None:
                r = s.expanding(min_periods=min_periods)
            elif isinstance(window, int):
                r = s.rolling(window, min_periods=min_periods)
            else:
                r = (
                    s.set_axis(pd.DatetimeIndex(pdf[ts_col]))
                    .rolling(pd.Timedelta(window), min_periods=min_periods)
                )
            vals = r.apply(fn, raw=True)
            pdf[out] = vals.to_numpy()  # drop the time index, keep order
            return pdf

        if by:
            res = tf.df.groupBy(*by).applyInPandas(kernel, ddl)
        else:
            res = tf.df.groupBy(F.lit(1)).applyInPandas(
                lambda pdf: kernel(pdf), ddl
            )
        return tf._wrap(res)

    def _pair_count(self, col_a: str, col_b: str, w) -> Column:
        # pandas min_periods for binary stats counts complete PAIRS:
        # a window where col_b is null (e.g. after shift) must be NaN
        # even when col_a alone has min_periods observations
        return F.count(
            F.when(F.col(col_a).isNotNull() & F.col(col_b).isNotNull(), 1)
        ).over(w)

    def cov(self, col_a: str, col_b: str, out: str | None = None) -> TsFrame:
        """rolling().cov(other) — sample covariance over the frame
        (pandas default ddof=1). One frame window, covar_samp built-in;
        NULL below min_periods complete pairs like pandas."""
        w = self._frame()
        guarded = F.when(
            self._pair_count(col_a, col_b, w) >= self.min_periods,
            F.covar_samp(col_a, col_b).over(w),
        )
        return self.tf._wrap(
            self.tf.df.withColumn(out or f"{col_a}_{col_b}_cov", guarded)
        )

    def corr(self, col_a: str, col_b: str, out: str | None = None) -> TsFrame:
        """rolling().corr(other) — Pearson correlation over the frame
        (the win_rolling_corr registry op is the oracle-checked twin);
        NULL below min_periods complete pairs like pandas."""
        w = self._frame()
        guarded = F.when(
            self._pair_count(col_a, col_b, w) >= self.min_periods,
            F.corr(col_a, col_b).over(w),
        )
        return self.tf._wrap(
            self.tf.df.withColumn(out or f"{col_a}_{col_b}_corr", guarded)
        )

    def skew(self, col: str, out: str | None = None) -> TsFrame:
        """Adjusted Fisher-Pearson sample skewness (pandas semantics:
        NaN below 3 observations or for a constant window). Three power
        sums share the one frame window — same plan shape as mean/std,
        no Python kernel; pandas' own rolling kernel uses the same
        power-sum formulation."""
        w = self._frame()
        x = F.col(col).cast("double")
        n = F.count(col).over(w).cast("double")
        s1, s2, s3 = (
            F.sum(x).over(w),
            F.sum(x * x).over(w),
            F.sum(x * x * x).over(w),
        )
        mean = s1 / n
        m2 = s2 / n - mean * mean
        m3 = s3 / n - F.lit(3.0) * mean * (s2 / n) + F.lit(2.0) * mean * mean * mean
        g = F.sqrt(n * (n - F.lit(1.0))) / (n - F.lit(2.0)) * m3 / (m2 * F.sqrt(m2))
        guarded = F.when(
            (F.count(col).over(w) >= F.greatest(F.lit(self.min_periods), F.lit(3)))
            & (m2 > 0),
            g,
        )
        return self.tf._wrap(self.tf.df.withColumn(out or f"{col}_skew", guarded))

    def kurt(self, col: str, out: str | None = None) -> TsFrame:
        """Unbiased sample excess kurtosis (pandas semantics: NaN below
        4 observations or for a constant window). Four power sums share
        the one frame window — G2 = (n-1)/((n-2)(n-3)) * ((n+1)*g2+6)
        with g2 = m4/m2^2 - 3."""
        w = self._frame()
        x = F.col(col).cast("double")
        n = F.count(col).over(w).cast("double")
        s1, s2, s3, s4 = (
            F.sum(x).over(w),
            F.sum(x * x).over(w),
            F.sum(x * x * x).over(w),
            F.sum(x * x * x * x).over(w),
        )
        mean = s1 / n
        m2 = s2 / n - mean * mean
        m4 = (
            s4 / n
            - F.lit(4.0) * mean * (s3 / n)
            + F.lit(6.0) * mean * mean * (s2 / n)
            - F.lit(3.0) * mean * mean * mean * mean
        )
        g2 = m4 / (m2 * m2) - F.lit(3.0)
        g = (
            (n - F.lit(1.0))
            / ((n - F.lit(2.0)) * (n - F.lit(3.0)))
            * ((n + F.lit(1.0)) * g2 + F.lit(6.0))
        )
        guarded = F.when(
            (F.count(col).over(w) >= F.greatest(F.lit(self.min_periods), F.lit(4)))
            & (m2 > 0),
            g,
        )
        return self.tf._wrap(self.tf.df.withColumn(out or f"{col}_kurt", guarded))

    def quantile(self, col: str, q: float, out: str | None = None) -> TsFrame:
        """pandas rolling(...).quantile(q, interpolation='linear'):
        sort the frame, lerp between the two straddling order
        statistics at pos = (n-1)*q. Variable frame sizes (time-based
        windows, expanding, min_periods < window) are handled by
        computing pos from the actual frame count."""
        if not 0 <= q <= 1:
            raise ValueError(f"q must be in [0, 1], got {q}")
        w = self._frame()
        arr = F.array_sort(F.collect_list(col).over(w))
        n = F.size(arr)
        pos = (n.cast("double") - F.lit(1.0)) * F.lit(float(q))
        lo = F.floor(pos).cast("int")
        frac = pos - lo
        base = F.element_at(arr, lo + 1)
        hi = F.element_at(arr, F.least(lo + 2, n))
        val = base + (hi - base) * frac
        guarded = F.when(F.count(col).over(w) >= self.min_periods, val)
        return self.tf._wrap(
            self.tf.df.withColumn(out or f"{col}_q{int(q * 100)}", guarded)
        )

    def median(self, col: str, out: str | None = None) -> TsFrame:
        w = self._frame()
        arr = F.array_sort(F.collect_list(col).over(w))
        n = F.size(arr)
        mid = (
            F.when(
                n % 2 == 1, F.element_at(arr, ((n + 1) / 2).cast("int"))
            ).otherwise(
                (
                    F.element_at(arr, (n / 2).cast("int"))
                    + F.element_at(arr, (n / 2).cast("int") + 1)
                )
                / 2.0
            )
        )
        guarded = F.when(F.count(col).over(w) >= self.min_periods, mid)
        return self.tf._wrap(self.tf.df.withColumn(out or f"{col}_median", guarded))


class Ewm:
    """ewm(alpha).mean() — exact recursive EWM per series via one Arrow
    kernel per key group. ``adjust`` follows pandas: True (default) is
    the finite-history weighted mean num/den; False is the plain
    recursion y_t = (1-a) y_{t-1} + a x_t."""

    def __init__(
        self,
        tf: TsFrame,
        alpha: float | None,
        adjust: bool = True,
        time_halflife: str | None = None,
    ):
        if time_halflife is None and not 0 < alpha <= 1:
            raise ValueError("alpha in (0, 1]")
        self.tf = tf
        self.alpha = alpha
        self.adjust = adjust
        self.time_halflife = time_halflife

    def mean(self, col: str, out: str | None = None) -> TsFrame:
        tf, alpha, adjust = self.tf, self.alpha, self.adjust
        hl = self.time_halflife
        out = out or f"{col}_ewm"
        # build 'a long, b double, ...' DDL from the existing schema
        ddl = ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in tf.df.schema.fields
        ) + f", {out} double"
        ts_col = tf.ts_col
        order_col = tf.order_col
        by = tf.by

        def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
            sort_keys = [ts_col] + ([order_col] if order_col else [])
            pdf = pdf.sort_values(sort_keys)
            if hl is not None:
                pdf[out] = (
                    pdf[col]
                    .ewm(halflife=pd.Timedelta(hl), times=pdf[ts_col])
                    .mean()
                )
            else:
                pdf[out] = pdf[col].ewm(alpha=alpha, adjust=adjust).mean()
            return pdf

        if by:
            res = tf.df.groupBy(*by).applyInPandas(kernel, ddl)
        else:
            res = tf.df.groupBy(F.lit(1)).applyInPandas(
                lambda pdf: kernel(pdf), ddl
            )
        return tf._wrap(res)

    def _moment(self, col: str, out: str, fn_name: str) -> TsFrame:
        """Shared kernel for var/std: pandas ewm(adjust=True, bias=False)
        per series, same applyInPandas shape as mean()."""
        tf, alpha, adjust = self.tf, self.alpha, self.adjust
        ddl = ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in tf.df.schema.fields
        ) + f", {out} double"
        ts_col, order_col, by = tf.ts_col, tf.order_col, tf.by

        def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
            sort_keys = [ts_col] + ([order_col] if order_col else [])
            pdf = pdf.sort_values(sort_keys)
            pdf[out] = getattr(
                pdf[col].ewm(alpha=alpha, adjust=adjust), fn_name
            )()
            return pdf

        if by:
            res = tf.df.groupBy(*by).applyInPandas(kernel, ddl)
        else:
            res = tf.df.groupBy(F.lit(1)).applyInPandas(
                lambda pdf: kernel(pdf), ddl
            )
        return tf._wrap(res)

    def var(self, col: str, out: str | None = None) -> TsFrame:
        """ewm(alpha).var() — bias-corrected, the pandas default."""
        return self._moment(col, out or f"{col}_ewmvar", "var")

    def std(self, col: str, out: str | None = None) -> TsFrame:
        """ewm(alpha).std() — sqrt of the bias-corrected variance."""
        return self._moment(col, out or f"{col}_ewmstd", "std")


class Resampler:
    """resample(freq): time-bucket aggregation."""

    _CAL_KIND = {
        "w": "w", "week": "w", "m": "m", "mon": "m", "month": "m",
        "me": "m", "q": "q", "qe": "q", "quarter": "q", "y": "y",
        "a": "y", "ye": "y", "year": "y", "b": "b",
    }

    def __init__(self, tf: TsFrame, freq: str):
        self.tf = tf
        self.freq = freq
        self._cal_kind: str | None = None
        # tz wall-clock path (TsFrame docstring "TIMEZONE CONTRACT"):
        # day/calendar buckets are computed on the LOCAL wall time and
        # the label converted back to its UTC instant; sub-day buckets
        # keep instant semantics (pandas parity on tz-aware indexes).
        wall = (
            F.from_utc_timestamp(
                F.col(tf.ts_col).cast("timestamp"), tf.tz
            )
            if tf.tz
            else None
        )

        def _label(expr: Column) -> Column:
            return (
                F.to_utc_timestamp(expr, tf.tz) if tf.tz is not None else expr
            )

        cal = _calendar_bucket(
            freq, wall if wall is not None else tf.ts_col
        )
        if cal is not None:
            # W/W-MON/M/Q/Y/B: pandas-labeled calendar periods
            self.bucket = _label(cal)
            m = re.fullmatch(
                r"(\d*)\s*([A-Za-z]+)(?:-([A-Za-z]+))?", freq.strip()
            )
            self._cal_kind = self._CAL_KIND[m.group(2).lower()]
            return
        n, unit = _parse_freq(freq)
        is_day = _TRUNC_UNIT.get(unit) == "day"
        if tf.tz and is_day and n != 1:
            raise ValueError(
                "tz-aware resample supports calendar frequencies and "
                f"'1D' only (got {freq!r}): multi-day bins over DST "
                "transitions have no fixed width"
            )
        if unit in _TRUNC_UNIT and n == 1:
            src = wall if (wall is not None and is_day) else F.col(tf.ts_col)
            bucket = F.date_trunc(_TRUNC_UNIT[unit], src)
            self.bucket = _label(bucket) if is_day else bucket
        else:
            # n-unit buckets: floor epoch-µs to the bucket width
            # (sub-day: instant semantics, tz-invariant by contract)
            span = _freq_us(freq)
            us = F.unix_micros(F.col(tf.ts_col))
            self.bucket = F.timestamp_micros((us - (us % span)))

    def _calendar_grid(self, bounds: DataFrame) -> DataFrame:
        """Densify calendar-period labels: ``bounds`` carries the series
        key plus lo/hi LABEL timestamps; returns one row per period
        label in [lo, hi]. Variable-width periods can't ride the fixed-
        µs F.sequence, so the sequence runs over period STARTS (month/
        quarter/year truncations stepped by calendar intervals — stepping
        the END labels directly would drift: Feb-28 + 1 month = Mar-28)
        and re-labels each start to its pandas period-end label. Weekly
        labels are exactly 7 days apart (UTC) and business-day labels
        are the weekday subset of the daily grid. Same bounded
        per-series explode shape as the fixed path (round-2 ADVICE:
        resample('M').ffill() previously raised a confusing sub-month
        frequency error)."""
        tf = self.tf
        k = self._cal_kind
        lo_d, hi_d = F.to_date("lo"), F.to_date("hi")
        if k == "m":
            seq = F.sequence(
                F.trunc(lo_d, "month"), F.trunc(hi_d, "month"),
                F.expr("interval 1 month"),
            )
            lab = F.last_day(F.col("_d"))
        elif k == "q":
            seq = F.sequence(
                F.trunc(lo_d, "quarter"), F.trunc(hi_d, "quarter"),
                F.expr("interval 3 months"),
            )
            lab = F.last_day(F.add_months(F.col("_d"), 2))
        elif k == "y":
            seq = F.sequence(
                F.trunc(lo_d, "year"), F.trunc(hi_d, "year"),
                F.expr("interval 12 months"),
            )
            lab = F.last_day(F.add_months(F.col("_d"), 11))
        else:  # 'w' / 'b': fixed 7-day anchors, or weekday subset of days
            step = "interval 7 days" if k == "w" else "interval 1 day"
            seq = F.sequence(lo_d, hi_d, F.expr(step))
            lab = F.col("_d")
        g = bounds.select(*tf.by, F.explode(seq).alias("_d"))
        if k == "b":
            g = g.filter(~F.dayofweek("_d").isin(1, 7))
        return g.select(*tf.by, lab.cast("timestamp").alias("bucket"))

    def _group(self):
        return self.tf.df.groupBy(
            self.bucket.alias("bucket"), *self.tf.by
        )

    def agg(self, *exprs: Column) -> DataFrame:
        return self._group().agg(*exprs)

    def mean(self, col: str) -> DataFrame:
        return self._group().agg(F.avg(col).alias(f"{col}_mean"))

    def sum(self, col: str) -> DataFrame:
        return self._group().agg(F.sum(col).alias(f"{col}_sum"))

    def count(self) -> DataFrame:
        return self._group().agg(F.count("*").alias("n"))

    def _edge(self, col: str, last: bool) -> DataFrame:
        tf = self.tf
        order = [F.unix_micros(F.col(tf.ts_col))] + (
            [F.col(tf.order_col)] if tf.order_col else []
        )
        key = F.when(F.col(col).isNotNull(), F.struct(*order))
        pick = F.max_by(col, key) if last else F.min_by(col, key)
        return self._group().agg(pick.alias(col))

    def first(self, col: str) -> DataFrame:
        """pandas ``resample().first()`` — first NON-null value per
        bucket in time order (order_col breaks timestamp ties)."""
        return self._edge(col, last=False)

    def last(self, col: str) -> DataFrame:
        """pandas ``resample().last()`` — last NON-null value per
        bucket in time order (order_col breaks timestamp ties)."""
        return self._edge(col, last=True)

    def ohlc(self, col: str, order_col: str | None = None) -> DataFrame:
        """Resampler.ohlc — order within the bucket by ``order_col``
        (default: the frame's order_col, else the time column). pandas
        ohlc computes all four edges over the bucket's NON-null values
        (a leading NaN does not become the open), so open/close use the
        null-keyed min_by/max_by guard — max/min skip nulls natively."""
        ok = order_col or self.tf.order_col or self.tf.ts_col
        ok_nn = F.when(F.col(col).isNotNull(), F.col(ok))
        return self._group().agg(
            F.min_by(col, ok_nn).alias("open"),
            F.max(col).alias("high"),
            F.min(col).alias("low"),
            F.max_by(col, ok_nn).alias("close"),
        )

    def _dense_grid(self, col: str):
        """Shared ffill/interpolate plumbing: per-bucket LAST NON-NULL
        value (pandas resample().last() skips nulls — a bucket whose
        final row is null still reports its earlier value; found by
        tests/test_api_fuzz.py), densified to each series' OWN
        [min, max] bucket range (pandas reindexes per group; the first
        cut used one global range, which invents leading buckets for
        late-starting series). Null where a bucket had no rows or only
        null rows. One groupBy for the buckets, one for the bounds,
        both on the series key — no global broadcast."""
        tf = self.tf
        if tf.tz:
            raise ValueError(
                "tz-aware fill paths (asfreq/ffill/interpolate) are not "
                "supported: the densifying grid steps fixed widths, "
                "which 23/25-hour DST days break — resample in UTC or "
                "fill in pandas (TsFrame docstring, TIMEZONE CONTRACT)"
            )
        # "last in bucket" is TIME order with the order_col only as the
        # tie-break for equal timestamps (fuzz matrix 6: ordering by
        # order_col alone lets a later-rid-but-earlier-ts row win where
        # pandas takes the later-ts one); max_by ignores rows whose
        # ordering key is null, making this "last non-null per bucket"
        order = [F.unix_micros(F.col(tf.ts_col))] + (
            [F.col(tf.order_col)] if tf.order_col else []
        )
        ok_nn = F.when(F.col(col).isNotNull(), F.struct(*order))
        per_bucket = self._group().agg(F.max_by(col, ok_nn).alias("_last"))
        if self._cal_kind:
            bounds = per_bucket.groupBy(*tf.by).agg(
                F.min("bucket").alias("lo"), F.max("bucket").alias("hi")
            )
            grid = self._calendar_grid(bounds)
        else:
            span = _freq_us(self.freq)
            grid = (
                per_bucket.groupBy(*tf.by)
                .agg(
                    F.unix_micros(F.min("bucket")).alias("lo"),
                    F.unix_micros(F.max("bucket")).alias("hi"),
                )
                .select(
                    *tf.by,
                    F.explode(
                        F.sequence(F.col("lo"), F.col("hi"), F.lit(span))
                    ).alias("_us"),
                )
                .select(
                    *tf.by, F.timestamp_micros(F.col("_us")).alias("bucket")
                )
            )
        return grid.join(per_bucket, on=[*tf.by, "bucket"], how="left")

    def asfreq(self, col: str) -> DataFrame:
        """pandas ``asfreq(freq)`` — reindex each series to the regular
        bucket grid and take the value present EXACTLY at each grid
        timestamp (null elsewhere; no filling, no aggregation — the
        snapshot semantics, distinct from resample().last()). Duplicate
        rows on a grid point resolve by the frame's order_col (pandas
        raises there; a total tie-break is the distributed-determinism
        requirement). Same plan shape as ffill: bounded grid explode +
        one equi-join. Calendar frequencies snapshot at the period-end
        LABEL instant (midnight of the label day), matching pandas
        asfreq on the resampled index."""
        tf = self.tf
        if tf.tz:
            raise ValueError(
                "tz-aware fill paths (asfreq/ffill/interpolate) are not "
                "supported: the densifying grid steps fixed widths, "
                "which 23/25-hour DST days break — resample in UTC or "
                "fill in pandas (TsFrame docstring, TIMEZONE CONTRACT)"
            )
        ok = tf.order_col or tf.ts_col
        us = F.unix_micros(F.col(tf.ts_col))
        if self._cal_kind:
            snap = (
                tf.df.filter(F.col(tf.ts_col) == self.bucket)
                .groupBy(*tf.by, F.col(tf.ts_col).alias("bucket"))
                .agg(F.max_by(col, ok).alias(col))
            )
            bounds = tf.df.groupBy(*tf.by).agg(
                F.min(self.bucket).alias("lo"),
                F.max(self.bucket).alias("hi"),
            )
            grid = self._calendar_grid(bounds)
            return grid.join(snap, on=[*tf.by, "bucket"], how="left")
        span = _freq_us(self.freq)
        snap = (
            tf.df.filter(us % span == 0)
            .groupBy(*tf.by, F.col(tf.ts_col).alias("bucket"))
            .agg(F.max_by(col, ok).alias(col))
        )
        bounds = tf.df.groupBy(*tf.by).agg(
            (F.floor(F.min(us) / span) * span).cast("long").alias("lo"),
            (F.floor(F.max(us) / span) * span).cast("long").alias("hi"),
        )
        grid = bounds.select(
            *tf.by,
            F.explode(F.sequence("lo", "hi", F.lit(span))).alias("_us"),
        ).select(*tf.by, F.timestamp_micros(F.col("_us")).alias("bucket"))
        return grid.join(snap, on=[*tf.by, "bucket"], how="left")

    def ffill(self, col: str) -> DataFrame:
        """Densify the bucket grid per series and forward-fill the
        bucket aggregate (resample().last().ffill() semantics), grid
        spanning each series' own [min, max] bucket range."""
        tf = self.tf
        joined = self._dense_grid(col)
        w = (
            W.partitionBy(*tf.by)
            .orderBy("bucket")
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        return joined.select(
            *tf.by,
            "bucket",
            F.last("_last", ignorenulls=True).over(w).alias(col),
        )

    def interpolate(
        self, col: str, method: str = "linear", limit: int | None = None
    ) -> DataFrame:
        """resample(freq).last().interpolate(method=...) — densify the
        bucket grid, then fill gaps with TsFrame.interpolate semantics
        (pandas edge behavior: leading nulls stay, trailing pad). On
        the equally-spaced grid 'linear' and 'time' coincide, exactly
        as in pandas. Same single series-key shuffle as ffill — the
        grid window and the interpolation frames share it."""
        tf = self.tf
        joined = self._dense_grid(col)
        out = TsFrame(joined, ts_col="bucket", by=tf.by).interpolate(
            "_last", method=method, out=col, limit=limit
        )
        return out.df.select(*tf.by, "bucket", col)


def _tsframe_rank(
    self,
    col: str,
    method: str = "average",
    out: str | None = None,
    pct: bool = False,
) -> "TsFrame":
    """pandas `groupby().rank(method=...)` — 'average' (the pandas
    default, composed from min-rank + tie count), 'min', 'dense', or
    'first' (row_number over the order_col tie-break). Nulls follow
    pandas na_option='keep': they rank as NULL and do not shift other
    rows' ranks (nulls_last ordering + mask —
    tests/test_api_fuzz.py). ``pct=True`` divides by the series'
    non-null count ('dense': by the distinct non-null count), the
    pandas percentile-rank convention — same windows, no extra
    exchange."""
    out = out or f"{col}_rank"
    w = W.partitionBy(*self.by).orderBy(F.col(col).asc_nulls_last())
    if method == "average":
        ties = W.partitionBy(*self.by, col)
        expr = (2.0 * F.rank().over(w) + F.count("*").over(ties) - 1) / 2.0
    elif method == "min":
        expr = F.rank().over(w).cast("double")
    elif method == "dense":
        expr = F.dense_rank().over(w).cast("double")
    elif method == "first":
        order = [F.col(col).asc_nulls_last()] + (
            [F.col(self.order_col)] if self.order_col else []
        )
        expr = F.row_number().over(
            W.partitionBy(*self.by).orderBy(*order)
        ).cast("double")
    else:
        raise ValueError(method)
    if pct:
        series = W.partitionBy(*self.by)
        denom = (
            F.size(F.collect_set(col).over(series))
            if method == "dense"
            else F.count(col).over(series)
        )
        expr = expr / denom
    return self._wrap(
        self.df.withColumn(out, F.when(F.col(col).isNotNull(), expr))
    )


def _tsframe_topk(self, col: str, k: int, ascending: bool = False) -> "TsFrame":
    """pandas `groupby().nlargest(k)` / `nsmallest(k)` per series —
    row_number over (value, order_col) keeps exactly k rows per key
    with a deterministic tie-break; Spark 4's WindowGroupLimit prunes
    before the exchange."""
    v = F.col(col).asc() if ascending else F.col(col).desc()
    order = [v] + ([F.col(self.order_col)] if self.order_col else [])
    w = W.partitionBy(*self.by).orderBy(*order)
    return self._wrap(
        self.df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


TsFrame.rank = _tsframe_rank
TsFrame.topk = _tsframe_topk


def _tsframe_trend(self, col: str) -> DataFrame:
    """Per-series OLS trend of ``col`` on time (slope per day +
    intercept at the series' epoch) — streaming regression moments,
    one exchange. Returns one row per series key."""
    x = F.unix_micros(F.col(self.ts_col)) / 86_400_000_000.0
    return self.df.groupBy(*self.by).agg(
        F.regr_slope(F.col(col), x).alias(f"{col}_slope_per_day"),
        F.regr_intercept(F.col(col), x).alias(f"{col}_intercept"),
        F.count(col).alias("n"),
    )


def _tsframe_outliers(self, col: str, n_mads: float = 5.0) -> "TsFrame":
    """Robust outlier flag per series: |x − median| > n_mads · MAD
    (median absolute deviation). Adds ``{col}_is_outlier``."""
    med = self.df.groupBy(*self.by).agg(F.median(col).alias("__med"))
    with_med = self.df.join(med, self.by or None)
    mad = with_med.groupBy(*self.by).agg(
        F.median(F.abs(F.col(col) - F.col("__med"))).alias("__mad")
    )
    out = (
        with_med.join(mad, self.by or None)
        .withColumn(
            f"{col}_is_outlier",
            F.abs(F.col(col) - F.col("__med")) > n_mads * F.col("__mad"),
        )
        .drop("__med", "__mad")
    )
    return self._wrap(out)


def _resampler_twa(self, col: str) -> DataFrame:
    """Time-weighted average per bucket: each value weighted by how
    long it was current WITHIN its bucket (last sample of a bucket
    carries weight to the bucket edge). One lead window + one hash-agg
    sharing the series-key exchange."""
    tf = self.tf
    us = F.unix_micros(F.col(tf.ts_col))
    order = [F.col(tf.ts_col)] + (
        [F.col(tf.order_col)] if tf.order_col else []
    )
    w = W.partitionBy(*tf.by).orderBy(*order)
    bucket_end = F.unix_micros(self.bucket) + F.lit(self._width_us())
    nxt = F.lead(us).over(w)
    dt = F.least(F.coalesce(nxt, bucket_end), bucket_end) - us
    s = tf.df.select(
        *tf.by,
        self.bucket.alias("bucket"),
        F.col(col).alias("__v"),
        dt.alias("__dt"),
    ).filter(F.col("__dt") > 0)
    return s.groupBy("bucket", *tf.by).agg(
        (F.sum(F.col("__v") * F.col("__dt")) / F.sum("__dt")).alias(f"{col}_twa")
    )


def _resampler_width_us(self) -> int:
    n, unit = _parse_freq(self.freq)
    if unit in _UNIT_US:
        return n * _UNIT_US[unit]
    raise ValueError(f"twa needs a fixed-width bucket, got {self.freq!r}")


TsFrame.trend = _tsframe_trend
TsFrame.outliers = _tsframe_outliers
Resampler.twa = _resampler_twa
Resampler._width_us = _resampler_width_us


def _tsframe_apply_per_series(self, fn, schema: str) -> DataFrame:
    """pandas ``groupby(by).apply(fn)`` — the generic escape hatch.
    ``fn(pdf) -> pdf`` receives ONE series as a pandas frame, sorted by
    (ts, order_col); runs as an Arrow-batched kernel per key
    (applyInPandas). Use only where window frames can't express the
    semantics — each key's whole series must fit one worker's memory,
    exactly like pandas itself."""
    ts_col, order_col = self.ts_col, self.order_col
    sort_keys = [ts_col] + ([order_col] if order_col else [])

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        return fn(pdf.sort_values(sort_keys))

    if not self.by:
        return self.df.groupBy(F.lit(1)).applyInPandas(
            lambda pdf: kernel(pdf), schema
        )
    return self.df.groupBy(*self.by).applyInPandas(
        lambda pdf: kernel(pdf), schema
    )


TsFrame.apply_per_series = _tsframe_apply_per_series


def _tsframe_combine_first(self, other, keys: "Sequence[str] | None" = None) -> "TsFrame":
    """pandas ``df.combine_first(other)``: align on the key columns,
    prefer self's non-null values, union the column sets and the key
    space. Keys default to (by + order_col) — the TsFrame's identity —
    falling back to (by + ts_col).

    Spark shape: ONE full-outer equi-join on the keys with coalesce
    per shared column — Catalyst picks broadcast/SMJ by size, and at
    100 TB this is the standard two-table reconcile (shuffle both
    sides on the key, or zero-shuffle when both are bucketed on it).
    """
    odf = other.df if isinstance(other, TsFrame) else other
    if keys is None:
        keys = list(self.by) + (
            [self.order_col] if self.order_col else [self.ts_col]
        )
    keys = list(keys)
    shared = [
        c for c in self.df.columns if c in set(odf.columns) and c not in keys
    ]
    self_only = [c for c in self.df.columns if c not in set(odf.columns)]
    other_only = [c for c in odf.columns if c not in set(self.df.columns)]
    a = self.df.select(
        *keys, *[F.col(c).alias(f"__a_{c}") for c in shared], *self_only
    )
    b = odf.select(
        *keys, *[F.col(c).alias(f"__b_{c}") for c in shared], *other_only
    )
    joined = a.join(b, on=keys, how="full")
    return self._wrap(
        joined.select(
            *keys,
            *[
                F.coalesce(f"__a_{c}", f"__b_{c}").alias(c)
                for c in shared
            ],
            *self_only,
            *other_only,
        )
    )


def _tsframe_seasonal_adjust(
    self, col: str, out: str | None = None
) -> "TsFrame":
    """Day-of-week seasonal adjustment: x minus the same-weekday mean
    of its own series (pandas ``x - x.groupby([*by, dow]).transform(
    'mean')``). One unordered window over (by, dow) — a single hash
    exchange, no join back (see win_seasonal_dow in the registry for
    the oracle-checked twin and the scale rationale)."""
    w = W.partitionBy(*self.by, F.dayofweek(self.ts_col))
    adj = F.col(col) - F.avg(col).over(w)
    return self._wrap(self.df.withColumn(out or f"{col}_deseason", adj))


def _tsframe_holt(
    self,
    col: str,
    alpha: float = 0.5,
    beta: float = 0.3,
    out: str | None = None,
) -> DataFrame:
    """Holt's linear (double exponential) smoothing per series — the
    trend-aware counterpart of ewm().mean(). Seeds l0=x0, b0=x1-x0.
    Per-key Arrow kernel (apply_per_series); the registry's win_holt
    shows the high-key-count mapInPandas variant of the same
    recurrence, cross-checked against a reference loop in tests."""
    out = out or f"{col}_holt"
    ts_col, order_col, by = self.ts_col, self.order_col, list(self.by)
    keep = by + [ts_col] + ([order_col] if order_col else []) + [col]
    schema_cols = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in self.df.select(*keep).schema.fields
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf[col].to_numpy(dtype=float)
        res = np.empty(len(x))
        if len(x):
            lev, tr = x[0], 0.0
            res[0] = x[0]
            for i in range(1, len(x)):
                if i == 1:
                    tr = x[1] - x[0]
                prev = lev
                lev = alpha * x[i] + (1.0 - alpha) * (lev + tr)
                tr = beta * (lev - prev) + (1.0 - beta) * tr
                res[i] = lev
        r = pdf[keep].copy()
        r[out] = res
        return r

    return self.apply_per_series(fn, f"{schema_cols}, `{out}` double")


def _tsframe_kalman(
    self,
    col: str,
    q: float = 0.001,
    r: float = 0.04,
    out: str | None = None,
) -> DataFrame:
    """1-D Kalman filter (local-level model) per series — adaptive
    smoothing whose gain tracks the evolving estimate covariance
    (process noise ``q``, observation noise ``r``). Seeds x0 at the
    first non-NaN observation with P0=1; missing observations carry
    the level and grow P. Per-key Arrow kernel (apply_per_series); the
    registry's win_kalman is the high-key-count mapInPandas variant of
    the same recurrence with a recursive-CTE oracle — the two
    implementations are cross-checked in tests."""
    out = out or f"{col}_kalman"
    ts_col, order_col, by = self.ts_col, self.order_col, list(self.by)
    keep = by + [ts_col] + ([order_col] if order_col else []) + [col]
    schema_cols = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in self.df.select(*keep).schema.fields
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        z = pdf[col].to_numpy(dtype=float)
        res = np.full(len(z), np.nan)
        x, P, seeded = np.nan, 1.0, False
        for i in range(len(z)):
            zi = z[i]
            if not seeded:
                if not np.isnan(zi):
                    x, P, seeded = zi, 1.0, True
                res[i] = x
                continue
            pp = P + q
            if np.isnan(zi):
                P = pp
            else:
                k = pp / (pp + r)
                x = x + k * (zi - x)
                P = (1.0 - k) * pp
            res[i] = x
        rdf = pdf[keep].copy()
        rdf[out] = res
        return rdf

    return self.apply_per_series(fn, f"{schema_cols}, `{out}` double")


TsFrame.combine_first = _tsframe_combine_first
TsFrame.seasonal_adjust = _tsframe_seasonal_adjust
TsFrame.holt = _tsframe_holt
TsFrame.kalman = _tsframe_kalman


def _tsframe_describe(self, col: str) -> DataFrame:
    """pandas ``groupby(by)[col].describe()``: count/mean/std/min/25%/
    50%/75%/max per series — one hash aggregate (exact interpolated
    percentiles share the single pass; Spark's percentile == pandas'
    linear interpolation)."""
    qs = F.percentile(col, F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)))
    # by=None: a global .agg — groupBy(F.lit(1)) would leak a literal
    # grouping column named '1' into the output schema
    grouped = self.df.groupBy(*self.by) if self.by else self.df
    return grouped.agg(
        F.count(col).alias("count"),
        F.avg(col).alias("mean"),
        F.stddev_samp(col).alias("std"),
        F.min(col).alias("min"),
        qs.getItem(0).alias("p25"),
        qs.getItem(1).alias("p50"),
        qs.getItem(2).alias("p75"),
        F.max(col).alias("max"),
    )


TsFrame.describe = _tsframe_describe
