"""Invariant tests for the training-corpus pipeline family (SURVEY §5.4
style): properties the DuckDB value-hash can't express — determinism
across reruns, partition/subset laws, packing bounds.
"""

from __future__ import annotations

import pandas as pd

from pandas_tsdb_spark.operators.pipeline import DEFAULT_KEEP, MIXTURE, PACK_BUDGET
from pandas_tsdb_spark.registry import load_all

SPECS = load_all()


def _run(name, spark, sf_dir) -> pd.DataFrame:
    return SPECS[name].builder(spark, sf_dir).toPandas()


def test_split_partitions_corpus(spark, sf_dir):
    out = _run("pipeline_split", spark, sf_dir)
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len(out) == n_docs  # every doc gets exactly one split
    assert out.doc_id.is_unique
    frac = out.split.value_counts(normalize=True)
    # 205/25/26 of 256 with binomial noise at n=500
    assert 0.70 <= frac.get("train", 0) <= 0.90
    assert 0.03 <= frac.get("val", 0) <= 0.20
    assert 0.03 <= frac.get("test", 0) <= 0.20
    again = _run("pipeline_split", spark, sf_dir)
    pd.testing.assert_frame_equal(
        out.sort_values("doc_id").reset_index(drop=True),
        again.sort_values("doc_id").reset_index(drop=True),
    )


def test_mixture_is_deterministic_weighted_subset(spark, sf_dir):
    out = _run("pipeline_mixture", spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").toPandas()
    assert set(out.doc_id) <= set(docs.doc_id)
    # 'ff' threshold = keep everything from that source
    full_sources = [s for s, t in MIXTURE.items() if t == "ff"]
    for s in full_sources:
        assert (out.source == s).sum() == (docs.source == s).sum()
    # every unlisted source keeps roughly DEFAULT_KEEP/256 (0x7f ~ 50%)
    unlisted = docs[~docs.source.isin(MIXTURE)]
    kept = out[~out.source.isin(MIXTURE)]
    assert DEFAULT_KEEP == "7f"
    assert 0.3 <= len(kept) / len(unlisted) <= 0.7
    again = _run("pipeline_mixture", spark, sf_dir)
    assert sorted(again.doc_id) == sorted(out.doc_id)


def test_pack_is_contiguous_and_bounded(spark, sf_dir):
    out = _run("pipeline_pack", spark, sf_dir)
    for lang, g in out.groupby("lang"):
        g = g.sort_values("doc_id").reset_index(drop=True)
        # running total rebuilt from scratch matches the emitted cumsum
        assert (g.n_tokens.cumsum() == g.cum_tokens).all()
        # bin id is the closed-form floor-div of the running prefix
        assert (
            ((g.cum_tokens - g.n_tokens) // PACK_BUDGET) == g.pack_id
        ).all()
        # pack ids are monotone non-decreasing in stream order and
        # contiguous from 0
        assert g.pack_id.is_monotonic_increasing
        assert g.pack_id.iloc[0] == 0
        # no pack overshoots the budget by more than one straddling doc
        per_pack = g.groupby("pack_id").n_tokens.sum()
        max_doc = g.groupby("pack_id").n_tokens.max()
        assert (per_pack <= PACK_BUDGET + max_doc).all()


def test_curate_output_is_deduped_quality_gated(spark, sf_dir):
    out = _run("pipeline_curate", spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").toPandas()
    assert out.doc_id.is_unique
    merged = out.merge(docs[["doc_id", "text", "n_chars"]], on="doc_id")
    assert len(merged) == len(out)
    # quality gate held
    assert (merged.n_chars >= 50).all()
    assert (merged.text.str.split(" ").str.len() >= 10).all()
    # exact dedup held: one output row per surviving text, and it's the
    # minimal doc_id of that text's qualifying group
    qual = docs[
        (docs.n_chars >= 50) & (docs.text.str.split(" ").str.len() >= 10)
    ]
    assert not merged.text.duplicated().any()
    winners = qual.groupby("text").doc_id.min()
    assert set(merged.doc_id) <= set(winners)


def test_token_budget_is_maximal_quality_prefix(spark, sf_dir):
    """The selection is (a) within budget per language, (b) MAXIMAL —
    the next-ranked document would overshoot, (c) exactly the prefix of
    the (quality desc, doc_id) order, and (d) deterministic across
    reruns. These are the greedy-selection laws the value hash can't
    see (it only fixes the final set)."""
    from pandas_tsdb_spark.operators.pipeline import _BUDGET_TOKENS

    out = _run("pipeline_token_budget", spark, sf_dir)
    assert out.doc_id.is_unique
    scored = (
        SPECS["text_quality"].builder(spark, sf_dir).toPandas()
        .merge(
            SPECS["text_stats"].builder(spark, sf_dir).toPandas()[
                ["doc_id", "n_tokens"]
            ],
            on="doc_id",
        )
    )
    for lang, sel in out.groupby("lang"):
        assert sel.cum_tokens.max() <= _BUDGET_TOKENS
        pool = scored[scored.lang == lang].sort_values(
            ["quality", "doc_id"], ascending=[False, True]
        )
        k = len(sel)
        prefix = pool.head(k)
        assert set(prefix.doc_id) == set(sel.doc_id)  # (c) exact prefix
        if k < len(pool):  # (b) maximality
            nxt = pool.iloc[k]
            assert sel.cum_tokens.max() + nxt.n_tokens > _BUDGET_TOKENS
    again = _run("pipeline_token_budget", spark, sf_dir)
    assert sorted(out.doc_id) == sorted(again.doc_id)
