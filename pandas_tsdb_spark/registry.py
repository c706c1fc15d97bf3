"""Query/oracle registry.

Every operator from SURVEY.md §2 is registered here as a named
``QuerySpec``: a plan builder ``(spark, sf_dir) -> DataFrame`` plus an
optional DuckDB oracle SQL string over the driver's pre-registered views
(region nation customer supplier part orders lineitem events documents
embeddings). ``__spark_entry__.py`` exposes the registry to the driver;
tests/harness.py runs the same comparison locally.

Determinism discipline (FIXTURES.md pitfalls — every spec must follow):
- alias every computed column identically in Spark and SQL;
- wrap float aggregates in round(x, n) on BOTH sides (Spark and DuckDB
  sum doubles in different orders; raw column values from parquet are
  bit-identical and need no rounding);
- top-k / limit queries carry a total tie-break on a unique key;
- never emit raw events.ts fractional seconds unless both sides are
  µs-truncated (they are — see catalog.py); date-like cols go out as
  DATE casts.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


def oracle_sum2(expr: str) -> str:
    """Exact 2-decimal sum for the oracle side, valid at ANY row count:
    accumulate integer cents (bigint — engines fold identically), emit
    the double quotient once. round(sum(<2dp doubles>), 2) is only
    valid while the float accumulation noise stays under 0.005 — at
    ~38M rows x 5-digit values (the 64x fixture) noise reaches ~0.4 and
    the engines' last-cent disagrees. Spark mirrors with sum2_col."""
    return (
        f"(CAST(sum(CAST(round(({expr}) * 100) AS BIGINT)) AS DOUBLE) / 100.0)"
    )


def oracle_avg2(expr: str, cnt: str = "count(*)") -> str:
    """Exact average built on oracle_sum2 — the any-scale replacement
    for oracle_avg (same bit-identical-quotient argument, but the
    numerator is an exact integer sum instead of a rounded float)."""
    return f"({oracle_sum2(expr)} / ({cnt}))"


def sum2_col(col) -> "Column":
    """Spark twin of oracle_sum2: exact integer-cents accumulation."""
    from pyspark.sql import Column, functions as F

    c = F.col(col) if isinstance(col, str) else col
    return F.sum(F.round(c * 100).cast("long")).cast("double") / F.lit(100.0)


def round_emit_col(col, s: int = 2) -> "Column":
    """Engine-ALIGNED emit rounding: round(x * 10^s) / 10^s.

    Spark's round(double, s>0) rounds HALF_UP on the double's shortest
    DECIMAL REPRESENTATION while DuckDB rounds by a float algorithm —
    they disagree exactly on values like 1.005 (binary
    1.00499999999999989...): Spark 1.01, DuckDB 1.00. Measured rate on
    3-decimal-ish uniform data: 0.27% of values (1341 of 500k) — a
    steady hash-divergence source on real data; the fixtures' coarse
    2-decimal values dodge it, which is why five rounds of driver
    hashes never saw one. ROUND-TO-INTEGER, by contrast, is
    engine-aligned on every probed value and on 500k random samples
    (both resolve repr-half away from zero), so scaling before one
    integer round and dividing after is the cross-engine-stable form
    of scale-s rounding. Oracle twin: oracle_round."""
    from pyspark.sql import Column, functions as F

    c = F.col(col) if isinstance(col, str) else col
    p = 10 ** s
    return F.round(c * p) / F.lit(float(p))


def oracle_round(expr: str, s: int = 2) -> str:
    """DuckDB twin of round_emit_col (see its docstring)."""
    p = 10 ** s
    return f"(round(({expr}) * {p}) / {p}.0)"


def oracle_avg(expr: str, cnt: str = "count(*)") -> str:
    """Cross-engine-stable AVG for the oracle SQL side.

    Rounding an average directly can never be made engine-stable here:
    2-decimal fixture data makes true averages land EXACTLY on decimal
    ties (x.xxxx5), and the two engines' sums differ by ~1e-13, so each
    engine resolves the tie by its own accumulated noise. Instead:
    round(sum, 2) recovers the exact decimal total (noise ≪ 0.005, and a
    sum of 2-decimal data is never a tie at digit 3), both engines land
    on the bit-identical double, and the division by an integer count is
    then bit-identical too — the quotient is emitted RAW, no rounding.

    VALIDITY REGIME: only while accumulation noise < 0.005 — i.e.
    sqrt(n)*ulp(total) small (per-series/per-day groups). For sums over
    whole big tables (global lineitem/orders aggregates) use
    oracle_sum2/oracle_avg2 + sum2_col: exact at any n.
    Spark side mirrors with (F.round(F.sum(x), 2) / F.count(...)).
    """
    return f"(round(sum({expr}), 2) / {cnt})"


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Builder
    oracle: str | None  # None => driver records weaker rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` under ``name``."""

    def deco(fn: Builder) -> Builder:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(
            name=name, builder=fn, oracle=oracle, tags=tuple(tags), doc=fn.__doc__ or ""
        )
        return fn

    return deco


def _register_kernels_by_value() -> None:
    """Make every pandas_tsdb_spark module cloudpickle BY VALUE.

    Python kernels shipped to executors (mapInPandas / applyInPandas
    closures) may call module-level helpers (e.g. llm_vectors._seq_dots);
    cloudpickle serializes such references by MODULE NAME, and executors
    launched by a driver whose cwd is not the repo cannot import
    ``pandas_tsdb_spark`` (the repo is not on worker sys.path) —
    ModuleNotFoundError at task time. Registering the package's modules
    for by-value pickling embeds the helper code in the serialized task
    instead, so the contract works from ANY driver cwd. Idempotent;
    covers modules imported later because load_all() re-runs it after
    the operator imports.
    """
    import sys

    try:
        from pyspark import cloudpickle
    except ImportError:  # pragma: no cover - pyspark always bundles it
        import cloudpickle  # type: ignore[no-redef]
    for mod_name, mod in list(sys.modules.items()):
        if mod is not None and mod_name.split(".")[0] == "pandas_tsdb_spark":
            try:
                cloudpickle.register_pickle_by_value(mod)
            except Exception:
                pass


def load_all() -> dict[str, QuerySpec]:
    """Import every operator module (registration side effects) once."""
    import pandas_tsdb_spark.operators  # noqa: F401

    _register_kernels_by_value()
    return REGISTRY
