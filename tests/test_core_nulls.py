"""Round-6 null sweep #4: the core-table (TPC-H) query family.

Round 5 swept the events family (68 queries), then the documents family
(35), finding 22 real divergences/crashes at ~1 per 6 queries swept.
This file closes the last unswept family: every oracled query whose
oracle reads lineitem/orders/customer/part/supplier/nation/region.
TPC-H columns are NOT NULL by spec, so the driver fixtures can never
exercise these paths — but TsFrame/TsStore users feed arbitrary frames,
and engine-pair null semantics (SQL NULL vs Arrow NaN, skip-vs-
propagate, null join keys, null group keys, null ordering) only
diverge on data that HAS nulls.

Injection design: deterministic modular predicates on each table's
primary key, a DIFFERENT prime per column so null patterns don't
correlate across columns, covering measures, attributes, dates, group
keys AND equi-join keys (null join keys must drop identically in both
engines). Dims stay mostly intact (nulling a 5-row region would
degenerate many plans to empty, which tests nothing).
"""

from __future__ import annotations

import glob
import os
import shutil

import pytest

pytestmark = pytest.mark.sweep

from pyspark.sql import functions as F

from pandas_tsdb_spark.registry import load_all

SMALL = "/root/testdata/sf0.001"
SPECS = load_all()

# (table, column, prime, cast) — null where (key expr) % prime == 0.
_INJECT: dict[str, list[tuple[str, int]]] = {
    "lineitem": [
        ("l_quantity", 7), ("l_extendedprice", 11), ("l_discount", 13),
        ("l_tax", 17), ("l_returnflag", 19), ("l_linestatus", 23),
        ("l_shipdate", 29), ("l_partkey", 41), ("l_suppkey", 43),
    ],
    "orders": [
        ("o_totalprice", 7), ("o_orderdate", 11), ("o_orderpriority", 13),
        ("o_orderstatus", 17), ("o_custkey", 37),
    ],
    "customer": [
        ("c_acctbal", 7), ("c_mktsegment", 11), ("c_name", 13),
        ("c_nationkey", 31),
    ],
    "part": [
        ("p_retailprice", 7), ("p_brand", 11), ("p_type", 13),
        ("p_size", 17), ("p_name", 19),
    ],
    "supplier": [
        ("s_acctbal", 5), ("s_name", 7),
    ],
    "nation": [
        ("n_name", 7),
    ],
}

_ROW_KEY = {  # SQL exprs: no active SparkContext at import time
    "lineitem": "l_orderkey + l_linenumber",
    "orders": "o_orderkey",
    "customer": "c_custkey",
    "part": "p_partkey",
    "supplier": "s_suppkey",
    "nation": "n_nationkey",
}


def stage_holey_core(spark, tmp: str) -> str:
    """Null-inject the core tables and stage the single-file fixture
    layout the builders read; untouched tables are symlinked."""
    stage = os.path.join(tmp, "sf_core_holey")
    os.makedirs(stage, exist_ok=True)
    for table, cols in _INJECT.items():
        df = spark.read.parquet(f"{SMALL}/{table}.parquet")
        key = F.expr(_ROW_KEY[table])
        for col, prime in cols:
            dt = dict(df.dtypes)[col]
            df = df.withColumn(
                col,
                F.when(key % prime == 0, F.lit(None).cast(dt)).otherwise(
                    F.col(col)
                ),
            )
        d = os.path.join(tmp, f"holey_{table}")
        df.coalesce(1).write.mode("overwrite").parquet(d)
        shutil.copy(
            glob.glob(f"{d}/part-*.parquet")[0], f"{stage}/{table}.parquet"
        )
    for table in ("region", "events", "documents", "embeddings"):
        dst = f"{stage}/{table}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{SMALL}/{table}.parquet", dst)
    return stage


# Every oracled query whose oracle reads a core table (enumerated
# programmatically from the registry; regenerate with
# tools/list_core_oracle_queries.py if the registry grows).
CORE_NULL_OPS = [
    "agg_conditional", "agg_corr", "agg_crosstab", "agg_distinct",
    "agg_gini", "agg_global", "agg_groupby", "agg_grouping_sets",
    "agg_histogram", "agg_quantiles", "agg_skew_kurt", "agg_stats",
    "cohort_retention", "distinct_rows", "filter_null", "filter_pred",
    "fn_array_lambda", "fn_bin_cut", "fn_bin_qcut", "fn_cast", "fn_cond",
    "fn_date", "fn_math", "fn_onehot", "fn_string", "fn_try",
    "graph_pagerank", "graph_triangles", "join_anti", "join_broadcast",
    "join_bucketed", "join_cross", "join_fuzzy_blocked", "join_inner",
    "join_lateral", "join_left", "join_outer", "join_range",
    "join_self_pairs", "join_semi", "limit_n", "project", "reshape_melt",
    "scan_parquet", "scan_schema", "set_except", "set_except_all",
    "set_intersect", "set_union", "set_union_all", "sink_csv_roundtrip",
    "sink_orc_roundtrip", "sink_parquet", "sort_multi", "stream_enrich",
    "topk_per_group", "tpch_q10", "tpch_q11", "tpch_q12", "tpch_q13",
    "tpch_q14", "tpch_q15", "tpch_q16", "tpch_q17", "tpch_q18",
    "tpch_q19", "tpch_q2", "tpch_q20", "tpch_q21", "tpch_q22", "tpch_q3",
    "tpch_q4", "tpch_q5", "tpch_q6", "tpch_q7", "tpch_q8", "tpch_q9",
    "win_rank", "win_resample_month", "win_resample_wmon",
]


@pytest.fixture(scope="module")
def holey_core_stage(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("core_nulls")
    return stage_holey_core(spark, str(tmp))


@pytest.mark.parametrize("name", CORE_NULL_OPS)
def test_core_null_differential(spark, holey_core_stage, name):
    """Builder vs DuckDB oracle on the null-injected core tables — the
    driver's own comparison over data the driver never feeds it.
    Catches wrong answers AND kernel crashes on null inputs."""
    from tests.harness import compare, duck_connect

    spec = SPECS[name]
    con = duck_connect(holey_core_stage)
    sp = spec.builder(spark, holey_core_stage).toPandas()
    du = con.execute(spec.oracle).fetchdf()
    errs = compare(sp, du, name)
    assert not errs, errs[:5]


# ---------------------------------------------------------------------------
# Round-6 sweep #5: the JSON/map surface on dirty props (verdict item 7).
# events.props is the one genuinely nullable fixture column in practice —
# a scraped/ingested property bag serves NULL, empty objects, wrong-typed
# values, and outright malformed JSON.
# ---------------------------------------------------------------------------

_PROPS_OPS = ["fn_map", "fn_json", "stream_kafka_shape"]


@pytest.fixture(scope="module")
def dirty_props_stage(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("dirty_props")
    ev = spark.read.parquet(f"{SMALL}/events.parquet")
    dirty = ev.withColumn(
        "props",
        F.when(F.col("event_id") % 7 == 0, F.lit(None).cast("string"))
        .when(F.col("event_id") % 11 == 0, F.lit("{}"))
        .when(F.col("event_id") % 13 == 0, F.lit('{"k": "oops"}'))
        .when(F.col("event_id") % 17 == 0, F.lit("not json"))
        .otherwise(F.col("props")),
    )
    d = str(tmp / "dirty")
    dirty.coalesce(1).write.parquet(d)
    stage = str(tmp / "sf")
    os.makedirs(stage)
    shutil.copy(glob.glob(f"{d}/part-*.parquet")[0], f"{stage}/events.parquet")
    for table in ("region nation customer supplier part orders lineitem "
                  "documents embeddings").split():
        os.symlink(f"{SMALL}/{table}.parquet", f"{stage}/{table}.parquet")
    return stage


@pytest.mark.parametrize("name", _PROPS_OPS)
def test_dirty_props_differential(spark, dirty_props_stage, name):
    """Builder vs oracle on NULL / empty-object / wrong-typed /
    malformed props. The engine contract is LENIENT extraction
    (get_json_object semantics: NULL on missing key, bad type, or
    malformed document) — the oracle must implement the same totality,
    not crash."""
    from tests.harness import compare, duck_connect

    spec = SPECS[name]
    con = duck_connect(dirty_props_stage)
    sp = spec.builder(spark, dirty_props_stage).toPandas()
    du = con.execute(spec.oracle).fetchdf()
    errs = compare(sp, du, name)
    assert not errs, errs[:5]


# ---------------------------------------------------------------------------
# Round-6 sweep #6: dirty embeddings over the vector surface. A scraped
# corpus's embedding column contains NULLs (failed encoder calls), empty
# arrays, and zero vectors (padding artifacts) — numpy kernels np.stack()
# straight into a hard job failure on any of them, and cosine math turns
# zero vectors into NaN cascades. Engine contract: rows whose embedding
# is NULL, empty, zero-norm, or off the declared dimension (ragged)
# carry no usable direction — they are EXCLUDED
# from vector ops, identically in builder and oracle.
# ---------------------------------------------------------------------------

_DIRTY_EMB_OPS = [
    "multimodal_cols", "sim_topk", "sim_pairs_threshold", "knn_label",
    "vec_quantize_int8", "dedup_embedding", "pipeline_curate", "fn_array",
    # round-9 cluster family: seeds are the k lowest CLEAN vec_ids, so a
    # dirty row in the seed range shrinks k identically in both engines.
    "vec_kmeans", "vec_semdedup", "pipeline_cluster_balance",
    "pipeline_curate_semantic", "pipeline_curate_embedding",
]


@pytest.fixture(scope="module")
def dirty_emb_stage(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("dirty_emb")
    em = spark.read.parquet(f"{SMALL}/embeddings.parquet")
    dirty = em.withColumn(
        "embedding",
        F.when(F.col("vec_id") % 13 == 0, F.lit(None).cast("array<double>"))
        .when(F.col("vec_id") % 17 == 0, F.array().cast("array<double>"))
        .when(
            F.col("vec_id") % 19 == 0,
            F.expr("transform(embedding, x -> CAST(0.0 AS DOUBLE))"),
        )
        # ragged dims (round-6 ragged sweep: 13 of 16 vector ops
        # crashed in np.stack on a 32-dim row in a 64-dim collection;
        # the exclusion contract now also requires the declared dim)
        .when(F.col("vec_id") % 23 == 0, F.expr("slice(embedding, 1, 32)"))
        .when(
            F.col("vec_id") % 29 == 0,
            F.expr("concat(embedding, array(0.1d, 0.2d, 0.3d))"),
        )
        .otherwise(F.col("embedding")),
    )
    d = str(tmp / "dirty")
    dirty.coalesce(1).write.parquet(d)
    stage = str(tmp / "sf")
    os.makedirs(stage)
    shutil.copy(
        glob.glob(f"{d}/part-*.parquet")[0], f"{stage}/embeddings.parquet"
    )
    for table in ("region nation customer supplier part orders lineitem "
                  "events documents").split():
        os.symlink(f"{SMALL}/{table}.parquet", f"{stage}/{table}.parquet")
    return stage


@pytest.mark.parametrize("name", _DIRTY_EMB_OPS)
def test_dirty_embeddings_differential(spark, dirty_emb_stage, name):
    """Builder vs oracle on NULL / empty / zero-norm embeddings —
    catches numpy-kernel crashes (np.stack on None, 0/0 norms) and
    engine-pair NaN-vs-NULL divergence."""
    from tests.harness import compare, duck_connect

    spec = SPECS[name]
    con = duck_connect(dirty_emb_stage)
    sp = spec.builder(spark, dirty_emb_stage).toPandas()
    du = con.execute(spec.oracle).fetchdf()
    errs = compare(sp, du, name)
    assert not errs, errs[:5]
