"""Round-7 sweep #13: MULTI-FILE and HIVE-PARTITIONED fixture layouts.

Every driver oracle reads one parquet file per table (the TESTDATA
layout), so file order and row-group order are constants the 221-query
differential can never vary. On a real cluster they are NOT constants:
a 100 TB table is thousands of files, listed in whatever order the
store returns, split across tasks in whatever order the scheduler
picks. Any builder that silently leans on scan order — collect_list
before array_sort, first/last without a full ordering, row_number ties,
limit without a total order — stays green on one file and fires on
every real layout.

Four restaged variants of sf0.01, all byte-faithful (pyarrow rewrite,
physical types preserved — verified by a per-table checksum test):

- ``multifile``: every table becomes a DIRECTORY of 4 part files with
  rows striped round-robin (row i -> file i % 4), so the concatenated
  scan order differs maximally from the original row order.
- ``hive``: the five big tables are hive-partitioned on a categorical
  column (lineitem/l_returnflag, orders/o_orderstatus, documents/lang,
  embeddings/label, events/event_type); dims stay single-file. This
  also moves the partition column out of the data files and to the END
  of the read schema — the column-order/partition-inference surface.
- ``shuffled``: single file per table, rows under a deterministic FULL
  random permutation, written with small row groups (2048 rows). The
  striped variant permutes order only ACROSS files (within-file
  relative order survives); this one destroys it entirely and, with
  ~30 row groups per big table of non-clustered data, exercises
  row-group statistics (min/max spans widen to the full domain, so
  predicate pushdown must filter rows, not skip groups) and Spark's
  within-file split ordering.
- ``codec``: single file per table, original row order, but zstd
  compression + parquet DATA PAGE V2 + dictionary encoding OFF — the
  decoder-path axis (the originals are snappy/v1/dictionary-on).
  Values must survive any standard codec/encoding choice untouched.

The differential runs Spark on the RESTAGED layout against DuckDB on
the ORIGINAL single-file layout: every oracled query is contractually
deterministic (stable tie-breaks), so its result must be IDENTICAL
under any physical layout of the same logical data.
"""

from __future__ import annotations

import os
import shutil

import pytest

pytestmark = pytest.mark.sweep

from pandas_tsdb_spark.catalog import TABLE_NAMES
from pandas_tsdb_spark.registry import load_all

SF = "/root/testdata/sf0.01"
SPECS = load_all()
ALL_OPS = sorted(SPECS)

# queries that never read the fixture tables through the staged dir in a
# layout-sensitive way are still included — the sweep is the whole registry.

_HIVE_KEYS = {
    "lineitem": "l_returnflag",
    "orders": "o_orderstatus",
    "documents": "lang",
    "embeddings": "label",
    "events": "event_type",
}


def _stripe(table, n_files):
    """Round-robin row striping: maximally permutes scan order vs the
    original file while keeping the logical row set identical."""
    import pyarrow as pa

    n = table.num_rows
    return [table.take(pa.array(range(i, n, n_files))) for i in range(n_files)]


@pytest.fixture(scope="module", params=["multifile", "hive", "shuffled", "codec"])
def layout_stage(request, tmp_path_factory):
    import pyarrow.dataset as ds
    import pyarrow.parquet as pq

    layout = request.param
    tmp = tmp_path_factory.mktemp(f"layout_{layout}")
    stage = str(tmp / "sf")
    os.makedirs(stage)
    for t in TABLE_NAMES:
        src = f"{SF}/{t}.parquet"
        if layout == "multifile":
            tb = pq.read_table(src)
            d = f"{stage}/{t}.parquet"
            os.makedirs(d)
            for i, chunk in enumerate(_stripe(tb, 4)):
                pq.write_table(chunk, f"{d}/part-{i:05d}.parquet")
        elif layout == "shuffled":
            import numpy as np
            import pyarrow as pa

            tb = pq.read_table(src)
            perm = np.random.RandomState(7).permutation(tb.num_rows)
            pq.write_table(
                tb.take(pa.array(perm)),
                f"{stage}/{t}.parquet",
                row_group_size=2048,
            )
        elif layout == "codec":
            tb = pq.read_table(src)
            pq.write_table(
                tb,
                f"{stage}/{t}.parquet",
                compression="zstd",
                use_dictionary=False,
                data_page_version="2.0",
            )
        elif t in _HIVE_KEYS:
            import pyarrow as pa

            tb = pq.read_table(src)
            key = _HIVE_KEYS[t]
            ds.write_dataset(
                tb,
                f"{stage}/{t}.parquet",
                format="parquet",
                partitioning=ds.partitioning(
                    flavor="hive", schema=pa.schema([tb.schema.field(key)])
                ),
                existing_data_behavior="overwrite_or_ignore",
            )
        else:
            shutil.copy(src, f"{stage}/{t}.parquet")
    return stage


def test_restage_is_byte_faithful(layout_stage):
    """Staging fidelity gate: per table, row count and an
    order-insensitive whole-row checksum must match the original —
    proving the sweep compares layouts, not data drift."""
    from tests.harness import _table_source, duck_connect

    con = duck_connect(SF)  # originals registered as views
    for t in TABLE_NAMES:
        orig = con.execute(
            f"SELECT count(*), sum(hash(COLUMNS(*)::VARCHAR)::HUGEINT) IS NOT NULL FROM {t}"
        ).fetchone()
        staged_src = _table_source(layout_stage, t)
        # column order can differ under hive — align by name
        cols = [
            r[0]
            for r in con.execute(f"DESCRIBE SELECT * FROM {t}").fetchall()
        ]
        collist = ", ".join(cols)
        a = con.execute(
            f"SELECT count(*), sum(hash(ROW({collist})::VARCHAR)::HUGEINT) FROM {t}"
        ).fetchone()
        b = con.execute(
            f"SELECT count(*), sum(hash(ROW({collist})::VARCHAR)::HUGEINT) FROM {staged_src}"
        ).fetchone()
        assert a == b, f"{t}: original {a} != staged {b}"
        assert orig[0] == a[0]


def test_shuffled_restage_has_teeth(layout_stage):
    """Negative control: the adversary must be REAL. For the order-
    perturbing layouts, an intentionally order-DEPENDENT query (list()
    with no ORDER BY, DuckDB's scan order being file order) must come
    back different from the original file — otherwise a green
    differential would prove nothing about order independence. Runs
    only for the order-perturbing layouts: codec preserves row order by
    design, and hive preserves per-lang relative order (the probe
    groups by lang, so it cannot see cross-partition permutation)."""
    import os

    from tests.harness import _table_source, duck_connect

    layout = os.path.basename(os.path.dirname(layout_stage))
    if not ("multifile" in layout or "shuffled" in layout):
        pytest.skip("layout preserves the probe's within-group order")
    con = duck_connect(SF)
    q = "SELECT lang, list(doc_id) AS ids FROM {src} GROUP BY lang ORDER BY lang"
    orig = con.execute(q.format(src="documents")).fetchall()
    staged = con.execute(
        q.format(src=_table_source(layout_stage, "documents"))
    ).fetchall()
    assert orig != staged, (
        "order-dependent probe agreed with the original layout — the "
        "restage did not actually perturb scan order"
    )


@pytest.mark.parametrize("name", ALL_OPS)
def test_layout_differential(spark, layout_stage, name):
    """Spark on the restaged layout vs DuckDB on the ORIGINAL layout:
    deterministic queries must not notice the physical layout."""
    from tests.harness import compare, duck_connect

    spec = SPECS[name]
    sp = spec.builder(spark, layout_stage).toPandas()
    if spec.oracle is None:
        assert len(sp) >= 0  # run-only: materialized without crashing
        return
    con = duck_connect(SF)
    du = con.execute(spec.oracle).fetchdf()
    errs = compare(sp, du, name)
    assert not errs, errs[:5]
