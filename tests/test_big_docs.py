"""Round-6 sweep #11: MULTI-MEGABYTE documents through the text family.

Fixture docs are ~50 tokens, so nothing ever exercised per-document
asymptotics — and the probe found two operators carrying the WHOLE
token array on every exploded segment/chunk row (O(tokens²/stride)
intermediate per doc): dedup_lines and pipeline_chunk hung outright on
ONE 4 MB web-sized document (600k tokens -> 60k rows x 4 MB array
each). Both now build their per-segment values inside a single
transform() over the array and posexplode only the small result —
O(tokens) per doc, verified back to 1 s on the same document.

Two guards here:
- a DIFFERENTIAL at a 20k-token doc (big enough to catch a revived
  quadratic shape as a timeout at the sweep level, small enough that
  DuckDB's own LATERAL-quadratic oracle still finishes), and
- a SPARK-ONLY scale guard at 600k tokens with closed-form
  expectations (the oracle cannot run there: DuckDB's list_slice
  LATERAL is quadratic — measured 0.26 s at 10k tokens, 5.6 s at 50k,
  extrapolating to ~15 min at 600k — an oracle limitation, not an
  engine one).
"""

from __future__ import annotations

import glob
import math
import os
import random
import shutil
import time

import pytest

pytestmark = pytest.mark.sweep

from pyspark.sql import functions as F

from pandas_tsdb_spark.registry import load_all

SMALL = "/root/testdata/sf0.001"
SPECS = load_all()

_SEGMENT_OPS = ["dedup_lines", "pipeline_chunk", "text_tokenize",
                "text_stats", "text_fingerprint", "text_entropy"]
_SEGMENT_OPS = [n for n in _SEGMENT_OPS if n in SPECS and SPECS[n].oracle]


def _make_stage(spark, tmp, n_tok_varied: int, n_tok_degen: int) -> str:
    stage = os.path.join(tmp, "sf")
    os.makedirs(stage, exist_ok=True)
    rng = random.Random(7)
    varied = " ".join("w%04d" % rng.randrange(3000) for _ in range(n_tok_varied))
    degen = " ".join(["spam"] * n_tok_degen)
    d = spark.read.parquet(f"{SMALL}/documents.parquet")
    bd = spark.createDataFrame(
        [(0, varied), (3, degen)], "doc_id long, big string"
    )
    d = (
        d.join(bd, "doc_id", "left")
        .withColumn("text", F.coalesce("big", "text"))
        .drop("big")
    )
    dd = os.path.join(tmp, "docs")
    d.coalesce(1).write.mode("overwrite").parquet(dd)
    shutil.copy(
        glob.glob(f"{dd}/part-*.parquet")[0], f"{stage}/documents.parquet"
    )
    for table in (
        "region nation customer supplier part orders lineitem "
        "events embeddings"
    ).split():
        dst = f"{stage}/{table}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{SMALL}/{table}.parquet", dst)
    return stage


@pytest.fixture(scope="module")
def bigdoc_stage(spark, tmp_path_factory):
    return _make_stage(
        spark, str(tmp_path_factory.mktemp("bigdoc")), 20_000, 10_000
    )


@pytest.mark.parametrize("name", _SEGMENT_OPS)
def test_bigdoc_differential(spark, bigdoc_stage, name):
    from tests.harness import compare, duck_connect

    spec = SPECS[name]
    con = duck_connect(bigdoc_stage)
    sp = spec.builder(spark, bigdoc_stage).toPandas()
    du = con.execute(spec.oracle).fetchdf()
    errs = compare(sp, du, name)
    assert not errs, errs[:5]


def test_bigdoc_scale_guard(spark, tmp_path_factory):
    """600k-token doc: segment/chunk ops must stay LINEAR per doc.
    Closed-form checks: the degenerate all-'spam' doc's segments are
    identical, so exactly one survives the global first-wins."""
    stage = _make_stage(
        spark, str(tmp_path_factory.mktemp("bigdoc_xl")), 600_000, 300_000
    )
    t0 = time.time()
    dl = (
        SPECS["dedup_lines"].builder(spark, stage).toPandas()
        .set_index("doc_id")
    )
    ck = (
        SPECS["pipeline_chunk"]
        .builder(spark, stage)
        .groupBy("doc_id")
        .count()
        .toPandas()
        .set_index("doc_id")
    )
    elapsed = time.time() - t0
    assert dl.loc[0, "n_segs"] == 60_000
    assert dl.loc[3, "n_segs"] == 30_000
    assert dl.loc[3, "n_kept"] == 1  # all segments identical
    assert ck.loc[0, "count"] == math.ceil((600_000 - 32) / 24.0) + 1
    # the old carried-array shape HANGS here (was >10 min before the
    # fix); generous bound so ambient container drift can't flake it
    assert elapsed < 180, f"segment ops took {elapsed:.0f}s on a 4 MB doc"
