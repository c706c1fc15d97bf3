"""Round-7 sweep #14: PHYSICAL-CONFIG invariance over the whole registry.

Every driver differential runs under one physical configuration (AQE on,
whole-stage codegen on, 32 shuffle partitions, auto-broadcast on). On a
real cluster none of those are constants: AQE re-plans at runtime,
codegen falls back to interpreted mode on expression-tree size limits,
shuffle parallelism is sized to the data, and broadcast joins flip to
sort-merge when the dim outgrows the threshold. A query whose RESULT
depends on any of those knobs is broken in a way the fixed-config
differential can never see — exactly the class the 614M-row layout A/B
(BASELINE.md round-7) proved out for six queries; this sweep closes it
for all 240.

Four maximally-perturbed profiles, each replaying the full registry
against the UNCHANGED DuckDB oracles:

- ``interpreted``: AQE off + whole-stage codegen off — every operator
  takes the interpreted (Volcano) evaluation path instead of generated
  code, and the plan is the static one Catalyst picked with no runtime
  re-planning. Distinct arithmetic/NULL-handling code paths end to end.
- ``serial_smj``: ONE shuffle partition + auto-broadcast disabled (both
  static and AQE thresholds) — every equi-join becomes sort-merge,
  every aggregation funnels through a single reducer, so partial-agg
  merge ORDER and join strategy both change. Float sums that only agree
  with the oracle under one partial-merge order fire here.
- ``spill``: window / sort-merge-join / session-window buffers forced
  to spill every 128 rows (a RUNTIME spill — the teeth test asserts
  WindowExec's spillSize metric > 0 on a probe), plus
  ObjectHashAggregateExec (typed/collect-style aggs only, e.g.
  collect_list — NOT the common HashAggregateExec) forced into its
  sort-based fallback after 7 keys. The disk-backed window/SMJ/
  session-window implementations only engage under real memory
  pressure; this profile makes them mandatory at fixture scale.
- ``arrow17``: Arrow transfer capped at 17 rows per batch — every
  Python kernel sees its partition as dozens of tiny batches, firing
  the cross-batch carry paths (the round-5 NaN-bug class) at every
  seam instead of only at partition boundaries.

Results must be bit-identical either way: the registry's determinism
doctrine (integer-cents sums, engine-aligned rounding, total
tie-breaks) claims independence from physical execution — this sweep
is that claim, tested.
"""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.sweep

from pandas_tsdb_spark.registry import load_all

SF = "/root/testdata/sf0.01"
SPECS = load_all()
ALL_OPS = sorted(SPECS)

PROFILES: dict[str, dict[str, str]] = {
    "interpreted": {
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.codegen.wholeStage": "false",
    },
    "serial_smj": {
        "spark.sql.shuffle.partitions": "1",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    },
    # the 100 TB memory-pressure paths, forced at fixture scale: window
    # and sort-merge-join buffers spill every 128 rows, hash aggregation
    # falls back to sort-based after 7 distinct keys — the external
    # (disk-backed) implementations of the three stateful operators,
    # which NEVER fire on a 60k-row fixture under default thresholds
    # and ALWAYS fire on a real cluster partition.
    "spill": {
        "spark.sql.windowExec.buffer.spill.threshold": "128",
        "spark.sql.sortMergeJoinExec.buffer.spill.threshold": "128",
        "spark.sql.sessionWindow.buffer.spill.threshold": "128",
        "spark.sql.objectHashAggregate.sortBased.fallbackThreshold": "7",
    },
    # every Python kernel (mapInPandas / applyInPandas / pandas_udf)
    # receives its partition as MANY tiny Arrow batches instead of one:
    # the cross-batch carry contract every kernel docstring claims is
    # exercised at every 17-row boundary. This is the r5 NaN-bug class
    # (state dropped at an Arrow batch boundary) forced registry-wide.
    "arrow17": {
        "spark.sql.execution.arrow.maxRecordsPerBatch": "17",
    },
}


@pytest.fixture(scope="module", params=list(PROFILES))
def config_profile(request, spark):
    """Apply one perturbed profile for the module, restore after.

    Round-8 ADVICE fix: every registry builder constructs
    catalog.Tables, whose __init__ calls session.ensure_conf — which
    RE-PINS any perturbed key that is also in RUNTIME_CONFS (the r7
    "interpreted" sweep actually ran with AQE back ON after the first
    builder call). So the perturbed keys are also POPPED from
    RUNTIME_CONFS for the module, making ensure_conf a no-op for them;
    test_profiles_have_teeth asserts the conf still holds AFTER a
    registry builder runs, so this class of silent un-perturbation
    can't come back.
    """
    import pandas_tsdb_spark.session as session_mod

    name = request.param
    saved: dict[str, str | None] = {}
    popped: dict[str, str] = {}
    for k, v in PROFILES[name].items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
        if k in session_mod.RUNTIME_CONFS:
            popped[k] = session_mod.RUNTIME_CONFS.pop(k)
    yield name
    session_mod.RUNTIME_CONFS.update(popped)
    for k, old in saved.items():
        if old is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, old)


def _plan_str(df) -> str:
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def _iter_executed_nodes(node):
    """Walk an executed SparkPlan through AQE / query-stage wrappers."""
    yield node
    cls = node.getClass().getSimpleName()
    if cls == "AdaptiveSparkPlanExec":
        yield from _iter_executed_nodes(node.executedPlan())
        return
    if cls.endswith("QueryStageExec"):
        yield from _iter_executed_nodes(node.plan())
        return
    ch = node.children()
    for i in range(ch.size()):
        yield from _iter_executed_nodes(ch.apply(i))


def test_profiles_have_teeth(spark, config_profile):
    """Negative control: each profile must actually CHANGE the physical
    execution, or a green differential proves nothing. interpreted:
    whole-stage codegen absent from the plan; serial_smj: the FK join
    that default-plans as broadcast becomes sort-merge; spill: a window
    probe's executed WindowExec reports spillSize > 0 — a RUNTIME spill
    signal, not just a conf echo (the threshold confs are genuinely
    threshold-forcing only for the window / sort-merge-join /
    session-window external buffers; objectHashAggregate's fallback
    touches ObjectHashAggregateExec ops only, e.g. collect_list).

    Second tooth (round-8 ADVICE): the perturbation must SURVIVE a
    registry builder call. catalog.Tables.__init__ calls
    session.ensure_conf, which re-pins anything still present in
    RUNTIME_CONFS — in round 7 that silently flipped AQE back ON under
    the "interpreted" profile after the first builder ran. The fixture
    now pops perturbed keys from RUNTIME_CONFS; this tooth proves it."""
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    o = spark.read.parquet(f"{SF}/orders.parquet")
    j = li.join(o, li.l_orderkey == o.o_orderkey, "inner")
    plan = _plan_str(j)
    if config_profile == "interpreted":
        assert "WholeStageCodegen" not in plan, plan[:2000]
        assert "AdaptiveSparkPlan" not in plan, plan[:2000]
    elif config_profile == "serial_smj":
        assert "SortMergeJoin" in plan, plan[:2000]
        assert "BroadcastHashJoin" not in plan, plan[:2000]
    elif config_profile == "spill":
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        assert spark.conf.get("spark.sql.windowExec.buffer.spill.threshold") == "128"
        # runtime spill signal: 60k rows over 3 partition keys with a
        # 128-row buffer threshold MUST spill inside WindowExec
        w = (
            Window.partitionBy("l_returnflag")
            .orderBy("l_orderkey", "l_linenumber")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        probe = li.select(F.sum("l_quantity").over(w).alias("s"))
        probe.collect()
        spilled = 0
        for n in _iter_executed_nodes(probe._jdf.queryExecution().executedPlan()):
            if n.getClass().getSimpleName() == "WindowExec":
                m = n.metrics()
                if m.contains("spillSize"):
                    spilled += m.apply("spillSize").value()
        assert spilled > 0, "WindowExec did not spill under threshold=128"
    else:  # arrow17 — tiny batches must actually reach Python kernels
        import pandas as pd

        def count_batches(batches):
            sizes = [len(b) for b in batches]
            yield pd.DataFrame({"n_batches": [len(sizes)], "max_rows": [max(sizes or [0])]})

        row = (
            spark.range(100)
            .coalesce(1)
            .mapInPandas(count_batches, "n_batches long, max_rows long")
            .collect()[0]
        )
        assert row.max_rows <= 17 and row.n_batches >= 5, row

    # the perturbation must survive ensure_conf (called by every
    # registry builder via catalog.Tables) — build one real registry
    # query, then re-assert every perturbed conf still holds
    SPECS["agg_groupby"].builder(spark, SF)
    for k, v in PROFILES[config_profile].items():
        assert spark.conf.get(k) == v, (
            f"profile conf {k} was reverted by a registry builder "
            f"(ensure_conf re-pin): {spark.conf.get(k)!r} != {v!r}"
        )


@pytest.mark.parametrize("name", ALL_OPS)
def test_config_differential(spark, config_profile, name):
    """Spark under a perturbed physical config vs DuckDB on the same
    data: deterministic queries must not notice the physical config."""
    from tests.harness import compare, duck_connect

    spec = SPECS[name]
    sp = spec.builder(spark, SF).toPandas()
    if spec.oracle is None:
        assert len(sp) >= 0  # run-only: materialized without crashing
        return
    con = duck_connect(SF)
    du = con.execute(spec.oracle).fetchdf()
    errs = compare(sp, du, name)
    assert not errs, errs[:5]
