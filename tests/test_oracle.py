"""Differential tests: every registered query vs its DuckDB oracle.

This is the same comparison the driver runs at sf0.01 — kept green here
means CORRECTNESS_r{N}.json should be green there.
"""

from __future__ import annotations

import pytest

from pandas_tsdb_spark.registry import load_all
from tests.harness import run_one

SPECS = load_all()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_vs_oracle(name, spark, duck, sf_dir):
    errs = run_one(spark, duck, SPECS[name], sf_dir)
    assert not errs, "\n".join(errs)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0


def test_declared_schemas_match_files(spark, sf_dir):
    from pandas_tsdb_spark.operators.scans import declared_schema_diff

    assert declared_schema_diff(spark, sf_dir) == []


def test_registry_contract():
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)
    assert all(callable(f) for f in q.values())
