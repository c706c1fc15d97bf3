#!/usr/bin/env python
"""Headline benchmark: representative queries from every operator family
at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).

Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": 0.1}

Protocol (BASELINE.md §M7): per query, 1 discarded warm-up then median
of 3 timed runs. Each run fully materializes the result through the
`noop` sink (executes the whole plan, pays no write cost, collects
nothing to the driver — the same discipline as benching on a cluster).

`--duckdb` times each query's oracle SQL in DuckDB on the same parquet
(result fully fetched) — the single-node upper-bound column.
`--pandas` times reference-model implementations (single-node eager
pandas, the reference's execution model) — the BASELINE column
BASELINE.md calls for.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# name -> registry key; one representative per family, weighted toward
# the scale-critical paths (joins, windows, LLM ops, streaming).
HEADLINE = {
    "q1_lineitem_agg": "agg_groupby",
    "q2_join_inner": "join_inner",
    "q3_join_broadcast": "join_broadcast",
    "q4_join_asof": "join_asof",
    "q5_rolling_time": "win_rolling_time",
    "q6_resample": "win_resample",
    "q7_ewm": "win_ewm",
    "q8_topk_per_group": "topk_per_group",
    "q9_dedup_exact": "dedup_exact",
    "q10_dedup_minhash": "dedup_minhash",
    "q11_sim_topk": "sim_topk",
    "q12_text_tfidf": "text_tfidf",
    "q13_lang_id": "lang_id",
    "q14_stream_tumbling": "stream_tumbling",
    "q15_sim_topk_blas": "sim_topk_blas",
    "q16_tpch_q6": "tpch_q6",
    "q17_curate": "pipeline_curate",
    # continuation-3 families: tsdb bars, CDC merge, partitioned-store
    # write+pruned-read (the sink/scan loop), 3-direction as-of.
    "q18_ohlc": "win_resample_ohlc",
    "q19_upsert_cdc": "upsert_cdc",
    "q20_partition_prune": "sink_partition_prune",
    "q21_asof_directions": "join_asof_directions",
    # training-pipeline curation additions: benchmark decontamination
    # (broadcast n-gram probe) and unigram-LM quality scoring.
    "q22_decontaminate": "pipeline_decontaminate",
    "q23_lm_score": "text_lm_score",
    # continuation-6: rolling OLS drift via prefix-difference frames,
    # bigram-LM scoring over a broadcast vocab-bounded model.
    "q24_rolling_slope": "win_rolling_slope",
    "q25_lm_bigram": "text_lm_bigram",
    # continuation-7: the compliance scrub (pure regex scan, fan-out
    # spread) and int8 embedding quantization (zero-exchange map-only).
    "q26_pii_scrub": "text_pii_scrub",
    "q27_quantize": "vec_quantize_int8",
    # the flagship tsdb visualization reduction: output bounded at
    # |series| x buckets regardless of input rows.
    "q28_m4_downsample": "win_downsample_m4",
    # continuation-3: cross-doc segment dedup (the CCNet/RefinedWeb
    # boilerplate-removal pass — the third dedup granularity after
    # whole-doc exact and near-dup).
    "q29_dedup_lines": "dedup_lines",
}

WARMUP, RUNS = 1, 3


def _sf(sf_dir: str) -> float:
    tail = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(tail.removeprefix("sf"))
    except ValueError:
        return -1.0


def _size_shuffle_to_data(spark) -> None:
    """Size spark.sql.shuffle.partitions to the benchmark data volume
    (~64 MB target per shuffle partition, floor 8, ceiling 4x cores) —
    the round-1 1024x lesson ("the fifth doubling is where 32 stops
    being enough") applied in both directions: at sf0.1 (~17 MB total)
    32 reduce tasks are pure scheduling overhead (measured 0.74 -> 0.48 s
    on the bigram-LM query just from starting at 8), while the 100 TB
    direction raises the count with the bytes. AQE stays ON and can
    still coalesce below this start. SPARK_GRAFT_SHUFFLE_PARTITIONS
    overrides."""
    # recursive walk: scaled fixtures may be directory-backed parquet
    # datasets (part-files under <table>.parquet/), which a flat listdir
    # would size at 0 bytes and silently pin partitions to the floor
    total = 0
    for dirpath, _dirnames, filenames in os.walk(SF_DIR):
        for f in filenames:
            total += os.path.getsize(os.path.join(dirpath, f))
    # stream state-store default: it must apply even when the BATCH
    # shuffle count is explicitly overridden (review catch — the early
    # return below used to skip it). Round-5 note: 4 -> 2 instances and
    # AQE-off both LOOKED like wins in isolated runs (1.20 -> 0.78 s /
    # -17%) but an interleaved same-process A/B over the full headline
    # showed both are session-warmth artifacts (AQE on 12.71 s vs off
    # 12.92 s; stream 4 = 0.822 s vs 2 = 0.820 s). Keep AQE on (it is
    # load-bearing at the 64x-1024x scales) and 4 state stores; only
    # interleaved A/Bs are trustworthy on this container (±25% ambient
    # drift measured within one hour).
    os.environ.setdefault("SPARK_GRAFT_STREAM_SHUFFLE", "4")
    if os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS"):
        return  # explicit override wins
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n = max(8, min(4 * cpus, total // (64 * 1024 * 1024) + 1))
    spark.conf.set("spark.sql.shuffle.partitions", str(n))


def bench_spark() -> dict[str, float]:
    from pandas_tsdb_spark.registry import load_all
    from pandas_tsdb_spark.session import get_spark

    spark = get_spark("pandas-tsdb-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    _size_shuffle_to_data(spark)
    specs = load_all()
    times: dict[str, float] = {}
    for label, key in HEADLINE.items():
        builder = specs[key].builder
        # JVM GC between queries: accumulated broadcast/shuffle garbage
        # from earlier queries otherwise degrades later sort-heavy ones
        # (measured at 64x: join_asof 11.1 s dirty vs 2.3 s clean — a
        # 5x distortion that has nothing to do with the query itself).
        spark._jvm.System.gc()
        samples = []
        for i in range(WARMUP + RUNS):
            t0 = time.perf_counter()
            builder(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            if i >= WARMUP:
                samples.append(dt)
        times[label] = round(statistics.median(samples), 3)
    return times


def bench_duckdb() -> dict[str, float]:
    import duckdb

    from pandas_tsdb_spark.registry import load_all

    specs = load_all()
    con = duckdb.connect()
    con.execute(f"SET threads={os.environ.get('SPARK_GRAFT_CPUS', '32')}")
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    times: dict[str, float] = {}
    for label, key in HEADLINE.items():
        sql = specs[key].oracle
        if sql is None:
            continue  # engine-internal op: no SQL twin
        samples = []
        for i in range(WARMUP + RUNS):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            dt = time.perf_counter() - t0
            if i >= WARMUP:
                samples.append(dt)
        times[label] = round(statistics.median(samples), 3)
    return times


def bench_pandas() -> dict[str, float]:
    from tools.bench_pandas import PANDAS_QUERIES

    times: dict[str, float] = {}
    for label, fn in PANDAS_QUERIES.items():
        samples = []
        for i in range(WARMUP + RUNS):
            t0 = time.perf_counter()
            fn(SF_DIR)
            dt = time.perf_counter() - t0
            if i >= WARMUP:
                samples.append(dt)
        times[label] = round(statistics.median(samples), 3)
    return times


def main() -> None:
    engine = "spark"
    if "--duckdb" in sys.argv:
        engine = "duckdb"
    elif "--pandas" in sys.argv:
        engine = "pandas"
    times = {"spark": bench_spark, "duckdb": bench_duckdb, "pandas": bench_pandas}[
        engine
    ]()
    print(
        json.dumps(
            {
                "metric": f"headline_total_{engine}",
                "value": round(sum(times.values()), 3),
                "unit": "sec",
                "queries": times,
                "sf": _sf(SF_DIR),
            }
        )
    )


if __name__ == "__main__":
    main()
