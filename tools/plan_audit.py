#!/usr/bin/env python
"""Physical-plan audit: print `.explain("formatted")` highlights for the
headline queries and flag plan smells that would hurt at scale.

Checks per plan:
- scans project only needed columns (ReadSchema width)
- filters reach parquet (PushedFilters non-empty where expected)
- small-dim joins are BroadcastHashJoin, not SortMergeJoin
- WholeStageCodegen covers the relational spine
- counts Exchange (shuffle) nodes — flag when > expected

Usage: python tools/plan_audit.py [query ...]   (default: headline set)
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

# query -> (max expected Exchange nodes, expects broadcast join?)
EXPECTATIONS = {
    "agg_groupby": (1, False),
    "join_inner": (3, False),
    "join_broadcast": (1, True),
    "join_asof": (2, False),
    "win_rolling_time": (1, False),
    "win_resample": (1, False),
    "topk_per_group": (1, False),
    "dedup_exact": (1, False),
    # sim_topk (round 2): scan -> Arrow kernel (map-only, local top-M)
    # -> ONE query_id exchange for the global merge window; the old
    # broadcast-join-per-pair plan is gone.
    "sim_topk": (1, False),
    # round 6: +1 SinglePartition exchange for the in-plan 1-row corpus
    # count (replaces the eager driver-blocking d.count() job); the
    # extra exchange carries exactly one row.
    # r9-opt: the (doc_id, tok, tf) pairs repartition is the shared
    # boundary between the tf and df consumers — statically the pairs
    # subtree prints once per consumer (ReusedExchange at runtime, the
    # tpch_q11 precedent), so 6 static = 4 executed: spread, pairs,
    # df partial, the 1-row n exchange.
    "text_tfidf": (6, True),
    "join_range": (3, False),
    "join_skew_salted": (4, False),
    "win_resample_ffill": (4, True),
    "win_resample_interp": (4, True),
    # round 2: calendar buckets are date expressions folded into the
    # groupBy key — same single-exchange hash-agg shape as date_trunc;
    # interp_time is one user_id window partitioning shared by all four
    # prev/next frames
    "win_resample_month": (1, False),
    "win_resample_wmon": (1, False),
    "win_interp_time": (1, False),
    # stratified sampling is one stratum-key window (WindowGroupLimit
    # prunes pre-exchange — asserted in test below); onehot is a pure
    # map-side projection; the quantile sketch is one hash agg
    "sample_stratified": (1, False),
    "fn_onehot": (0, False),
    "agg_quantiles_approx": (1, False),
    # counter rate(): running sum, counter lag, and ts lag all share
    # the one series-key window partitioning
    "win_counter_rate": (1, False),
    # round 3: scd2's lag + version-cumsum + run agg + interval lead all
    # ride one user_id exchange (subset-key clustering); phash is a
    # map-only Arrow kernel + one groupBy on the 16-bit hash
    "scd2_intervals": (1, False),
    "multimodal_phash_dedup": (1, False),
    "win_kalman": (1, False),  # win_ewm's one-shuffle kernel shape
    "win_ewm_time": (1, False),  # per-key applyInPandas, one exchange
    # continuation-3: line-dedup shuffles (md5(seg), ids) — the _spread
    # fan-out + the seg-hash window + the per-doc rollup; entropy's two
    # groupBys BOTH ride the _spread doc_id partitioning (subset-key
    # clustering — the tpch_q21 trick); mixture-temperature is one
    # source agg + the single-partition window over |sources| rows.
    # round-6 adaptive split: small/big doc branches each fan out via
    # _spread (a no-op exchange on a real many-file table), so the
    # union carries one extra local exchange
    "dedup_lines": (4, False),
    "text_entropy": (1, False),
    "pipeline_mixture_temperature": (2, False),
    # round-2 additions: xcorr is ONE fact scan (conditional daily agg)
    # + two tiny daily-table exchanges — the role-explode alignment,
    # never a self-join of the aggregate subtree; interval overlap is
    # bucket-decomposed (session agg exchange + pair distinct; the
    # day-spans side broadcasts at fixture scale, equi-joins on the
    # bucket at cluster scale — NEVER a nested loop); pca's returned
    # plan is a pure map-only projection (moments were a separate
    # bounded-partial pass).
    "win_xcorr": (3, False),
    "join_interval_overlap": (3, True),
    "vec_pca": (0, False),
    # heavy hitters: exact = key agg + total broadcast; sketch = MG
    # candidate distinct + broadcast semi-join + candidate-only agg —
    # the wide exchange carries candidates, not key cardinality
    # round 3: top-decile rank cut — groupBy(user_id) exchange + the
    # single-partition window over the small counts table; the
    # broadcast-total crossJoin is folded into that window
    "agg_heavy_hitters": (2, False),
    "agg_heavy_hitters_sketch": (3, True),
    # decompose: daily agg exchange + the user_id re-exchange shared by
    # the centered-range and weekday windows
    "win_decompose": (2, False),
    # asfreq: hour-bucket agg + per-user bounds agg; the grid side
    # broadcasts back onto the bucket table
    "win_resample_asfreq": (2, True),
    # merge_ordered: per-side (user, ts) pre-agg exchanges + the full
    # outer join's; the fill window rides the join's partitioning.
    # SMJ is correct here — both sides are comparable size.
    "join_merge_ordered": (3, False),
    # rolling MAD/rank ride the same single window sort as rolling_median
    "win_rolling_mad": (1, False),
    "win_rolling_rank": (1, False),
    # drawdown: cumsum -> cummax -> cummin all share one exchange+sort
    "win_drawdown": (1, False),
    "win_rolling_corr": (1, False),
    "sim_topk_blas": (2, False),
    # continuation-7 additions: quantize/pii/chunk are map-only (zero
    # exchanges, whole-stage codegen scan->project); fuzzy join is
    # distinct-agg + broadcast block join; crosstab joins broadcast then
    # partial-aggregates to |segments|x|statuses| cells; corr_matrix is
    # daily agg + one global moment pass; seasonal is ONE unordered
    # window; holt is the win_ewm shape (one repartition, Python kernel).
    "join_fuzzy_blocked": (2, True),
    "agg_crosstab": (2, True),
    "corr_matrix": (2, False),
    "win_seasonal_dow": (1, False),
    "vec_quantize_int8": (0, False),
    # pii/chunk are map-only AFTER the _spread fan-out (one narrow
    # exchange of raw docs when the scan is a single under-split file —
    # a no-op on any real many-file table)
    "text_pii_scrub": (1, False),
    # round-6 adaptive split (see dedup_lines)
    "pipeline_chunk": (2, False),
    "win_holt": (1, False),
    "win_holt_blas": (1, False),
    # gini: one exchange serves the segment window AND the aggregate;
    # the customer dim broadcasts.
    "agg_gini": (1, True),
    # late continuation-7: lateral decorrelates to window+broadcast;
    # except-all is one counted-join shuffle; fn_try is map-only; m4 is
    # extent-agg + broadcast-back + shared-sort windows; lttb is the
    # one-repartition kernel shape.
    "join_lateral": (2, True),
    "set_except_all": (1, False),
    "fn_try": (0, False),
    "win_downsample_m4": (2, True),
    "win_downsample_lttb": (1, False),
    "dedup_embedding": (3, False),
    # event-analytics family: sessionize/zscore ride ONE user_id
    # exchange; sample_det is map-only (deterministic hash filter);
    # tpch shapes broadcast dims and keep a single data exchange.
    "sessionize": (1, False),
    "gaps_islands": (2, False),
    "funnel": (5, True),
    "cohort_retention": (3, True),
    "sample_det": (0, False),
    "agg_quantiles": (1, False),
    "win_zscore": (1, False),
    "tpch_q3": (1, True),
    "tpch_q5": (1, True),
    # q6 is scan+global agg (1 partial/final exchange); q4/q10/q14/q18/
    # q19 broadcast their small side and keep ONE data exchange (the
    # group-by); mixture/split are map-only; pack is one lang window;
    # curate is the md5 dedup shuffle + broadcast re-joins.
    "tpch_q4": (1, True),
    "tpch_q6": (1, False),
    "tpch_q10": (1, True),
    "tpch_q14": (1, True),
    "tpch_q18": (1, True),
    "tpch_q19": (1, True),
    "pipeline_mixture": (0, True),
    "pipeline_split": (0, False),
    "pipeline_pack": (1, False),
    # curate since r9-opt: scan fan-out (+1, no-op on many-file sources)
    # + the md5 dedup agg whose min(struct) carries the winner's attrs —
    # the old narrow winner re-join (a SECOND corpus scan + spread
    # exchange at runtime; pruning divergence defeated reuse) is gone.
    # Embeddings attach broadcasts via AQE; text never crosses a join.
    "pipeline_curate": (2, True),
    # bucketed co-located join: ZERO exchanges is the whole point;
    # normalize is a narrow map; mode is agg + same-key argmax window.
    "join_bucketed": (0, False),
    "text_normalize": (0, False),
    "agg_mode": (2, False),
    # q8 broadcasts region + both nation sides + supplier (one data
    # exchange for the year group-by); q22 is scalar-agg broadcast +
    # anti join (agg exchange + final group-by); corr is one hash agg.
    "tpch_q8": (1, True),
    "tpch_q22": (2, True),
    "agg_corr": (1, False),
    # q7/q9/q12 broadcast every dim, one group-by exchange; q13 is the
    # custkey agg + tiny histogram re-agg; q15 compiles the rev subtree
    # twice (AQE reuses at runtime) + the scalar-max single-partition
    # agg; q16's COUNT(DISTINCT) expands to two agg exchanges; q17 is
    # partkey agg + partkey join side + final global agg (its SMJ on
    # partkey is the RIGHT plan — both sides fact-sized at scale, so
    # want_bcast stays False to not flag it); q21 rides ONE orderkey
    # repartition through dedup-agg AND both windows + s_name agg.
    "tpch_q7": (1, True),
    "tpch_q9": (1, True),
    "tpch_q12": (1, True),
    "tpch_q13": (2, True),
    "tpch_q15": (3, True),
    "tpch_q16": (2, True),
    "tpch_q17": (3, False),
    "tpch_q21": (2, True),
    # shuffle is ONE hash exchange on the 256-way shard key + in-shard
    # sort; resize is a map-only Arrow kernel (zero exchanges).
    "pipeline_shuffle": (1, False),
    "multimodal_resize": (0, False),
    # ohlc = one partial+final hash agg; twa's user_id group-by reuses
    # the lead-window exchange; asof_directions folds both frames into
    # ONE Window node over one union exchange; fn_struct is a
    # partial+final sort-agg (struct max is not hash-aggregable).
    "win_resample_ohlc": (1, False),
    "win_twa": (1, False),
    "join_asof_directions": (1, False),
    "fn_struct": (1, False),
    # rolling-median rides one user_id window exchange; bool aggs are a
    # plain partial+final hash agg; time-of-day filter and bitwise are
    # map-only; sketch rollup = day-cell agg + countDistinct expand +
    # final merge (3 — the exact-nunique companion costs the extra one).
    "win_rolling_median": (1, False),
    "agg_bool": (1, False),
    "filter_time_of_day": (0, False),
    "fn_bitwise": (0, False),
    "agg_sketch_rollup": (3, False),
    # autocorr: lag window + hash agg share the user_id exchange.
    "win_autocorr": (1, False),
    # partition-prune read-back: one group-by over the pruned scan;
    # upsert: each side's compaction window exchange feeds the
    # full-outer SMJ directly (no third exchange — full outer can't
    # broadcast, SMJ is the right plan); python datasource: distinct
    # expand + final agg.
    "sink_partition_prune": (1, False),
    "upsert_cdc": (2, False),
    "source_python_datasource": (2, False),
    # store-ingest fetch: pruned scan + map-only projection.
    "stream_store_ingest": (0, False),
    # histogram: map-side bucket + one hash agg.
    "agg_histogram": (1, False),
    # alignment: two keyed aggs feed the full-outer SMJ directly;
    # trend: one moments hash-agg; MAD: one agg exchange per median
    # pass (exact medians aren't partially mergeable) + broadcasts;
    # BLAS twins: one kernel/bucket exchange + tiny merge window.
    "align_series": (2, False),
    "win_trend": (1, False),
    "ts_outlier_mad": (4, True),
    "dedup_embedding_blas": (1, False),
    "knn_label_blas": (1, False),
    # skew: three power sums share ONE window (one exchange+sort);
    # entropy: (lang,source) agg + lang window/agg (tiny post-agg rows).
    "win_rolling_skew": (1, False),
    "agg_entropy": (2, False),
    # +1 exchange each: the _spread fan-out of an under-split source
    # before the CPU-heavy per-doc stage (no-op on many-file tables).
    "lang_id": (4, True),
    "pipeline_decontaminate": (3, True),
    # lm_score r2: +1 single-partition window exchange over the
    # |V|-bounded vocab agg (replaced the eager corpus-total collect;
    # one fewer corpus scan). r9-opt: monolithic SQL, same shape (the
    # pairs-sharing rewrite was tried and reverted — A/B in
    # OPTIMIZATION_r09.md).
    "text_lm_score": (4, True),
    # derived-partsupp TPC-H trio: one lineitem aggregation each, dims
    # broadcast; q11's 5 counts the statically-duplicated byp subtree
    # (scalar-subquery total), reused at runtime under AQE.
    "tpch_q2": (2, True),
    "tpch_q11": (5, True),
    "tpch_q20": (4, True),
    # one narrow doc_id-keyed fan-out serves both aggregation levels.
    "text_repetition": (1, False),
    # four exact sums share one frame: one exchange, one sort.
    "win_rolling_slope": (1, False),
    # reflection identity: prefix sum + running min on one partition;
    # 2 static exchanges = the user_id repartition compiled once per
    # consumer (stats agg + co-located join), reused at runtime.
    "win_cusum": (2, False),
    # vocab-bounded model tables (uni/bigram aggs + prob assembly)
    # broadcast into one map-side probe; per-doc agg is the last one.
    # r2: +1 vocab-window exchange (same corpus-total rewrite as
    # text_lm_score).
    "text_lm_bigram": (8, True),
    # bollinger: the exact-moments rolling family — two integer sums
    # share ONE frame (one exchange, one sort).
    "win_bollinger": (1, False),
    # rsi/macd: the win_ewm one-shuffle mapInPandas kernel shape.
    "win_rsi": (1, False),
    "win_macd": (1, False),
    # triangles: order-group collect + pair distinct + degree agg +
    # orientation joins + wedge self-join; small dims (deg) broadcast
    # under AQE. Budget is the static-plan exchange count.
    "graph_triangles": (12, False),
    # round 9: tz calendar buckets over the staged DST tables — the
    # wall-clock conversion chain (UTC instant -> local date -> anchor
    # -> local-midnight UTC instant) folds entirely into the groupBy
    # key, so every tz resample stays a single-exchange hash agg with
    # no Python.
    "win_resample_tz_wmon": (1, False),
    "win_resample_tz_month": (1, False),
    "win_resample_tz_dst_day": (1, False),
    "win_resample_tz_sydney": (1, False),
    "win_resample_tz_quarter": (1, False),
    "win_resample_tz_year": (1, False),
    # round 9 cluster-curation family: kmeans assignment is zero-shuffle
    # codegen (centroids are driver-side literals), so the registered
    # plan pays only the final groupBy(cid) + the 8-row orderBy; semdedup
    # is the cid-bucketed pair join (broadcast-picked at fixture size,
    # SMJ at scale — want_bcast False so the scale plan doesn't flag)
    # plus the vec_id anti-join; token_budget is _spread + the per-lang
    # ordered window.
    "vec_kmeans": (2, False),
    "vec_semdedup": (2, False),
    "pipeline_token_budget": (2, False),
    # dup_ngrams: ONE scan -> (sh, doc_id) pair agg -> min/max window
    # by sh over the deduped pairs -> per-doc agg; three exchanges, no
    # join, ZERO broadcasts. The prior join-back shape was rewritten
    # after AQE re-planned it at 256x into a broadcast that collected
    # the 40M-row PAIR SET through the driver (9.5 GiB hashed
    # relation); a broadcast appearing in this plan again is that
    # regression. cluster_balance: pruned (vec_id, cid) pairs through
    # one cid window exchange with WindowGroupLimit pre-pruning
    # (asserted in test_plans).
    "text_dup_ngrams": (3, False),
    "pipeline_cluster_balance": (1, False),
    # end-to-end curation recipe: semdedup's two exchanges + the
    # balance window exchange + the per-lang budget window exchange.
    # want_bcast stays False because semdedup's interior anti-join is
    # legitimately SMJ-able and the blanket no-SMJ check would flag
    # it; the property that MATTERS — the <= k*m selection reaching
    # documents as an explicit broadcast so the corpus never shuffles
    # — is asserted surgically in
    # tests/test_plans.py::test_curate_semantic_doc_join_broadcasts.
    "pipeline_curate_semantic": (4, False),
    # linear-interior twin: dedup_embedding's 3 exchanges + the
    # (label, sbucket) balance window + the per-lang budget window
    # collapse to 4 because the balance window reuses the anti-join's
    # distribution; doc attach is the explicit broadcast (surgical
    # test, same as the semantic recipe).
    "pipeline_curate_embedding": (4, False),
}


def audit(name: str, plan: str) -> list[str]:
    flags = []
    # formatted explain = tree, blank line, then per-node details that
    # repeat every node name — count shuffles in the tree only, and not
    # BroadcastExchange (broadcast is the cheap path, not a shuffle).
    tree = plan.split("\n\n")[0]
    n_exchange = len(re.findall(r"\+- Exchange|:- Exchange", tree))
    max_ex, want_bcast = EXPECTATIONS.get(name, (None, False))
    if max_ex is not None and n_exchange > max_ex:
        flags.append(f"{n_exchange} Exchange nodes (expected <= {max_ex})")
    if want_bcast and not re.search(
        r"BroadcastHashJoin|BroadcastNestedLoopJoin", tree
    ):
        flags.append("no broadcast join (small side should broadcast)")
    if "SortMergeJoin" in tree and want_bcast:
        flags.append("SortMergeJoin present where broadcast expected")
    # InferFiltersFromGenerate trap: exploding a MATERIALIZED array
    # column makes Catalyst infer `size(col) > 0 AND isnotnull(col)`,
    # and pushdown re-substitutes the alias so the whole higher-order
    # expression is re-evaluated inside a Filter below the project that
    # defined it (measured 65x on lang_id). Signature: a Filter node
    # whose condition evaluates a lambda over a COMPUTED expression —
    # a HOF over a bare scan attribute (`exists(embedding#1, ...)`,
    # the round-6 dirty-embeddings validity predicate) is a sanctioned
    # constant-work-per-row scan filter, not the trap. Fix for real
    # hits: explode the expression directly inside the Generate.
    for seg in re.split(r"\n\(\d+\) ", plan):
        if not (seg.startswith("Filter") and "lambdafunction" in seg):
            continue
        cond = "".join(l for l in seg.split("\n") if "Condition" in l)
        # strip sanctioned `hof(attr#id, lambdafunction(...))` calls
        # (lambda body may nest parens — consume up to the HOF's
        # closing paren by balancing from the lambdafunction start)
        residue = re.sub(
            r"\w+\(\w+#\d+, lambdafunction\(", "SANCTIONED_HOF((", cond
        )
        if "lambdafunction" in residue:
            flags.append(
                "higher-order function evaluated in a Filter "
                "(InferFiltersFromGenerate trap: explode the expression, "
                "not a materialized array column)"
            )
    if "InMemoryTableScan" not in plan and "Scan parquet" in plan:
        pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
        read = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
        for rs in read:
            ncols = len(rs.split(",")) if rs else 0
            if ncols > 12:
                flags.append(f"wide scan: {ncols} columns read")
        _ = pushed
    return flags


def main() -> None:
    from pandas_tsdb_spark.registry import load_all
    from pandas_tsdb_spark.session import get_spark

    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()
    if "--all" in sys.argv:
        # registry-wide smell sweep: no per-query exchange budgets, but
        # the structural checks (lambda-in-Filter, wide scans) apply to
        # every registered op. Streaming builders are skipped — their
        # plans only exist inside a query execution.
        names = [n for n in sorted(specs) if not n.startswith("stream_")]
    else:
        names = [a for a in sys.argv[1:] if not a.startswith("-")] or list(
            EXPECTATIONS
        )
    bad = 0
    for name in names:
        df = specs[name].builder(spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        flags = audit(name, plan)
        status = "OK " if not flags else "FLAG"
        print(f"[{status}] {name}: " + ("; ".join(flags) if flags else "clean"))
        if flags:
            bad += 1
            if "-v" in sys.argv:
                print(plan)
    print(f"{len(names) - bad}/{len(names)} clean")


if __name__ == "__main__":
    main()
