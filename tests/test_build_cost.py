"""Construction-cost regression guard (r10-opt, round-9 verdict #7).

The r9/r10 optimization rounds converted ~140 builders to the
monolithic-SQL form because every DataFrame transformation eagerly
re-analyzes its whole logical subtree (~28-46 ms/op on this container;
Column-chain builders paid 100-550 ms of pure driver-side construction
per call). This guard keeps that win locked in two ways:

1. STRUCTURAL: every builder that uses the sql_views() registration is
   asserted to stay a one-spark.sql() builder — a regression back to a
   long Column chain after the sql() call shows up as extra DataFrame
   method calls, counted by monkeypatching the handful of plan-growing
   DataFrame methods.
2. TEMPORAL (coarse): the steady-state construction time of each
   converted builder must stay under a generous bound (min of 3 —
   one-sided container noise filtered). The bound is ~5-10x the
   measured cost of the largest converted builder and ~2-5x below the
   cheapest Column-chain regression, so it trips on a real
   reintroduction without flaking on load.
"""

from __future__ import annotations

import ast
import inspect
import time

import pytest

from pandas_tsdb_spark.registry import load_all

BOUND_MS = 350  # largest converted builder measured ~120 ms (min of 5)
MAX_CHAIN_OPS = 6  # post-sql() DataFrame touch-ups allowed (none today)

# DataFrame methods whose (ab)use reintroduces per-op re-analysis.
_CHAIN_METHODS = (
    "select",
    "selectExpr",
    "filter",
    "where",
    "withColumn",
    "withColumns",
    "join",
    "groupBy",
    "agg",
    "unionByName",
    "union",
    "orderBy",
    "distinct",
)


def _converted_ops() -> list[str]:
    out = []
    for name, spec in load_all().items():
        try:
            src = inspect.getsource(spec.builder)
        except (OSError, TypeError):
            continue
        if "sql_views()" in src:
            out.append(name)
    return out


_CONVERTED = _converted_ops()


def test_converted_inventory_does_not_shrink():
    """The SQL-form inventory only grows: a refactor that silently
    drops a builder back to a Column chain (removing sql_views) must
    update this floor deliberately."""
    assert len(_CONVERTED) >= 130, sorted(_CONVERTED)


def test_sql_form_builders_stay_monolithic(spark, sf_dir):
    """Each converted builder performs its plan construction inside
    ONE spark.sql() call: count plan-growing DataFrame method calls
    during construction (zero/near-zero today)."""
    from pyspark.sql import DataFrame

    counts: dict[str, int] = {}
    current = {"op": None}
    originals = {m: getattr(DataFrame, m) for m in _CHAIN_METHODS}

    def wrap(m, orig):
        def inner(self, *a, **kw):
            if current["op"] is not None:
                counts[current["op"]] = counts.get(current["op"], 0) + 1
            return orig(self, *a, **kw)

        return inner

    specs = load_all()
    # warm the view/scan memos outside the counted region
    from pandas_tsdb_spark.catalog import Tables

    Tables(spark, sf_dir).sql_views()
    try:
        for m, orig in originals.items():
            setattr(DataFrame, m, wrap(m, orig))
        for name in _CONVERTED:
            current["op"] = name
            specs[name].builder(spark, sf_dir)
        current["op"] = None
    finally:
        for m, orig in originals.items():
            setattr(DataFrame, m, orig)
    offenders = {k: v for k, v in counts.items() if v > MAX_CHAIN_OPS}
    assert not offenders, offenders


@pytest.mark.parametrize("name", sorted(_CONVERTED))
@pytest.mark.sweep
def test_build_time_bound(name, spark, sf_dir):
    """min-of-3 steady-state construction under BOUND_MS (sweep tier:
    registry-wide; the fast tier carries the structural guard above)."""
    spec = load_all()[name]
    spec.builder(spark, sf_dir)  # warm memos / first-call JIT
    best = min(
        _timed(spec.builder, spark, sf_dir) for _ in range(3)
    )
    assert best * 1000 < BOUND_MS, f"{name}: {best * 1000:.0f} ms"


def _timed(builder, spark, sf_dir) -> float:
    t0 = time.perf_counter()
    builder(spark, sf_dir)
    return time.perf_counter() - t0
