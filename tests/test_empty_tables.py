"""Round-6 sweep #7: ZERO-ROW tables over the whole registry.

The r5/r6 null sweeps hardened every family against null VALUES; this
sweep hardens against null VOLUME. At 100 TB an empty input is not an
edge case — it is a partition of every job (a pruned date range with no
files, a tenant with no rows, a filter that eliminates a source, the
first run of an incremental pipeline). The failure classes are exactly
the ones rows-only checks never see:

- driver-side bounded collects (`.collect()[0]`, codebook samples,
  query blocks) that index into an empty result,
- numpy kernels that `np.stack([])` / reduce over an empty batch,
- ratio/normalization math that divides by a zero total,
- in-band `raise_error` recall floors whose truth set is empty
  (recall over zero truth pairs is vacuously satisfied, not a failure),
- TsStore fetch/maintenance over a store with zero partitions.

Contract: on empty inputs every query returns exactly what its oracle
returns (usually 0 rows; global aggregates return their SQL identity
row), and NEVER crashes. Differential for every oracled query; run-only
(crash check) for the ✗-oracle entries.
"""

from __future__ import annotations

import os

import pytest

pytestmark = pytest.mark.sweep

from pandas_tsdb_spark.catalog import TABLE_NAMES
from pandas_tsdb_spark.registry import load_all

SMALL = "/root/testdata/sf0.001"
SPECS = load_all()

ALL_OPS = sorted(SPECS)


@pytest.fixture(scope="module")
def empty_stage(spark, tmp_path_factory):
    """Stage a fixture directory where every table keeps its exact
    schema but has zero rows (limit(0) round-tripped through parquet,
    single file per table — the layout every builder reads)."""
    import glob
    import shutil

    tmp = tmp_path_factory.mktemp("empty_tables")
    stage = str(tmp / "sf_empty")
    os.makedirs(stage)
    for t in TABLE_NAMES:
        df = spark.read.parquet(f"{SMALL}/{t}.parquet").limit(0)
        d = str(tmp / f"empty_{t}")
        df.coalesce(1).write.mode("overwrite").parquet(d)
        shutil.copy(glob.glob(f"{d}/part-*.parquet")[0], f"{stage}/{t}.parquet")
    return stage


@pytest.mark.parametrize("name", ALL_OPS)
def test_empty_tables(spark, empty_stage, name):
    from tests.harness import compare, duck_connect

    spec = SPECS[name]
    sp = spec.builder(spark, empty_stage).toPandas()
    if spec.oracle is None:
        assert len(sp) >= 0  # run-only: materialized without crashing
        return
    con = duck_connect(empty_stage)
    du = con.execute(spec.oracle).fetchdf()
    errs = compare(sp, du, name)
    assert not errs, errs[:5]
