"""Round-7 ADVICE fix: ANN families on TINY non-empty collections.

The zero-row sweep (round 6) hardened the empty case, but collections
of 1..n_cells-1 valid vectors hit a different boundary: the trained
codebooks are shorter than the requested geometry (k-means can only
seed len(sample) centroids), so a probe fan-out or ADC table sized by
the REQUESTED cells/_PQ_K mismatches the REAL codebook — pandas
length-mismatch in probe(), shape-mismatch in the ADC table build.
At 100 TB this is not exotic: a per-tenant or per-day slice of an
embedding collection routinely holds a handful of vectors.

Contract: every ANN family materializes without crashing on any
collection size >= 1, and any neighbors it does return are real rows
(neighbor != query, cos in [-1, 1])."""

from __future__ import annotations

import glob
import os
import shutil

import pytest

pytestmark = pytest.mark.sweep

from pandas_tsdb_spark.catalog import TABLE_NAMES
from pandas_tsdb_spark.registry import load_all

SMALL = "/root/testdata/sf0.001"
SPECS = load_all()

ANN_OPS = ["ann_lsh", "ann_ivf", "ann_pq", "ann_ivf_pq"]
VEC_OPS = ANN_OPS + [
    "sim_topk", "sim_pairs_threshold", "knn_label", "dedup_embedding",
    "vec_quantize_int8", "vec_pca",
]


@pytest.fixture(scope="module", params=[1, 3, 7])
def tiny_stage(request, spark, tmp_path_factory):
    """Fixture dir: all tables copied from sf0.001, embeddings cut to
    the first n valid rows (n below every geometry floor: n_cells>=16,
    nprobe>=8, _PQ_K=16)."""
    n = request.param
    tmp = tmp_path_factory.mktemp(f"tiny_emb_{n}")
    stage = str(tmp / "sf_tiny")
    os.makedirs(stage)
    for t in TABLE_NAMES:
        if t == "embeddings":
            continue
        shutil.copy(f"{SMALL}/{t}.parquet", f"{stage}/{t}.parquet")
    df = (
        spark.read.parquet(f"{SMALL}/embeddings.parquet")
        .orderBy("vec_id")
        .limit(n)
    )
    d = str(tmp / "emb")
    df.coalesce(1).write.mode("overwrite").parquet(d)
    shutil.copy(glob.glob(f"{d}/part-*.parquet")[0], f"{stage}/embeddings.parquet")
    return stage


@pytest.mark.parametrize("name", VEC_OPS)
def test_vector_ops_survive_tiny_collection(spark, tiny_stage, name):
    out = SPECS[name].builder(spark, tiny_stage)
    rows = out.collect()
    cols = set(out.columns)
    if {"query_id", "neighbor_id"} <= cols:
        for r in rows:
            assert r.query_id != r.neighbor_id
            if "cos" in cols and r.cos is not None:
                assert -1.000001 <= r.cos <= 1.000001
