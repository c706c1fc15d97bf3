#!/usr/bin/env python
"""Headline benchmark: representative queries from every operator family
at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).

Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": 0.1,
   "calibration": {...}, "paired": {...}, "protocol": "interleaved_v2"}

Protocol ``interleaved_v2`` (round-8 verdict item #1 — the
self-normalizing artifact). Motivation: every round since r4 the raw
Spark headline swung ±40-70 % on unchanged code while single-node
engines moved ±20 %, and each judge burned an hour proving "measurement,
not code". The artifact now carries its own calibration so any reader
can normalize without re-measuring:

- Per query, the three engines run INTERLEAVED in one process
  (spark -> pandas -> duckdb within each rep), so the container's
  ambient drift hits all three identically — the only protocol
  BASELINE.md's floor decomposition found trustworthy on this box.
  1 warm-up pass + 1 discarded first timed rep + median of 3.
- ``calibration.null_job_interspersed_sec`` (r9): the median of one
  noop-sink probe per query slot (first discarded) — the scheduling
  floor sampled AT the moments the queries paid it. The endpoint
  pre/post probes remain as diagnostics only (r8 judge measured them
  5x apart within one session; this session 59x at 256x).
- ``calibration.jvm_probe_sec``: a fixed pure-JVM codegen loop
  (2e8-row range -> hash -> sum through the noop sink; no I/O, no
  Python, no shuffle) — the container's JVM compute throughput at
  measurement time.

REGRESSION RULE (r9 revision — also stated in BASELINE.md §M7 and
NOTES.md): cross-session "regression" claims use
``paired.ratio_vs_pandas`` / ``paired.ratio_vs_duckdb`` ONLY
(interleaved, ambient-cancelling; at >=1 GB fixtures the duckdb ratio
comes from the fixed AT_SCALE_DUCK subset). Every ``calibration.*``
number, including ``spark_total_over_null_job``, is diagnostic — the
probe floor itself drifts across sessions. The raw ``value`` is a
point sample inside a documented ±25-30 % container band and is NOT
comparable across sessions on its own.

ARTIFACT DELIVERY (r9): the final stdout line is compact (contract
fields + calibration + paired totals/ratios; hard-asserted <=1900
chars against the driver's 2000-char tail capture that truncated the
r8 record); the full payload, including the per-query pandas/duckdb
maps, is written to ``BENCH_full_<fixture>.json`` and named on the
line as ``full_record``.

`--duckdb` / `--pandas` still emit standalone single-engine artifacts
(consecutive protocol, kept for tooling compatibility).
"""

from __future__ import annotations

import json
import math
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

# At-scale paired column (round-9 verdict #3): the >=1 GB artifact used
# to carry spark + calibration only (a full pandas pass is ~20 min at
# 256x), leaving the at-scale gate resting on the noisy null-job
# quotient alone. This fixed subset is seconds in DuckDB even at 256x
# (pure scan+agg over lineitem/events), so it runs interleaved with its
# Spark twins and gives the at-scale record an ambient-cancelling
# ratio_vs_duckdb.
AT_SCALE_DUCK = ("q1_lineitem_agg", "q6_resample", "q16_tpch_q6", "q18_ohlc")


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


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _duck_connect():
    import duckdb

    con = duckdb.connect()
    con.execute(f"SET threads={os.environ.get('SPARK_GRAFT_CPUS', '32')}")
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        p = f"{SF_DIR}/{t}.parquet"
        # scaled fixtures are directory-backed parquet datasets
        # (part-files under <table>.parquet/): bind via recursive glob
        # so the at-scale paired subset (round-9 verdict #3) can run
        src = f"'{p}/**/*.parquet'" if os.path.isdir(p) else f"'{p}'"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet({src})")
    return con


def _calibrate(spark, reps: int = 5) -> dict[str, float]:
    """The two in-band calibration probes (module docstring). First rep
    of each discarded; medians returned."""
    # two discarded leading reps on the null probe: the very first
    # jobs of a session still pay JIT/classload (measured pre 0.107 s
    # vs post 0.048 s with only one discard)
    null_samples, jvm_samples = [], []
    for i in range(reps + 2):
        t0 = time.perf_counter()
        _noop(spark.range(1))
        if i > 1:
            null_samples.append(time.perf_counter() - t0)
    for i in range(3 + 1):
        spark._jvm.System.gc()
        t0 = time.perf_counter()
        # fixed pure-JVM codegen loop: integer hash + sum over 2e8 rows,
        # no I/O / Python / shuffle — the container's JVM throughput now
        _noop(
            spark.range(200_000_000).selectExpr(
                "sum(id * 2654435761 % 1000003) AS s"
            )
        )
        if i > 0:
            jvm_samples.append(time.perf_counter() - t0)
    return {
        "null_job_sec": round(statistics.median(null_samples), 4),
        "jvm_probe_sec": round(statistics.median(jvm_samples), 4),
    }


def bench_spark() -> dict:
    """Interleaved three-engine headline + in-band calibration."""
    from pandas_tsdb_spark.registry import load_all
    from pandas_tsdb_spark.session import get_spark
    from tools.bench_pandas import PANDAS_QUERIES

    spark = get_spark("pandas-tsdb-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    _size_shuffle_to_data(spark)
    specs = load_all()
    fixture_bytes = 0
    for dirpath, _d, fnames in os.walk(SF_DIR):
        for f in fnames:
            fixture_bytes += os.path.getsize(os.path.join(dirpath, f))
    at_scale = fixture_bytes > 1 << 30
    # the pandas column only exists off-scale (a 256x pandas pass is
    # ~20 min); DuckDB now binds at every scale (directory-backed
    # fixtures via recursive glob) so the AT_SCALE_DUCK subset can give
    # the scaled record a paired column too
    con = _duck_connect()

    cal_pre = _calibrate(spark)

    sp: dict[str, list[float]] = {k: [] for k in HEADLINE}
    pdn: dict[str, list[float]] = {k: [] for k in HEADLINE}
    dk: dict[str, list[float]] = {k: [] for k in HEADLINE}

    def run_spark(label: str) -> float:
        t0 = time.perf_counter()
        _noop(specs[HEADLINE[label]].builder(spark, SF_DIR))
        return time.perf_counter() - t0

    def run_pandas(label: str) -> float | None:
        fn = PANDAS_QUERIES.get(label)
        if fn is None:
            return None
        t0 = time.perf_counter()
        fn(SF_DIR)
        return time.perf_counter() - t0

    def run_duck(label: str) -> float | None:
        sql = specs[HEADLINE[label]].oracle
        if sql is None:
            return None
        t0 = time.perf_counter()
        con.execute(sql).fetchall()
        return time.perf_counter() - t0

    # LONG-SESSION FENCE (round-8 verdict #2, probe-established at
    # 256x): a hot session's FIRST encounter with a string-heavy query
    # can stall 10-30x for several consecutive runs (q17_curate 52 s
    # median vs 1.75 s on the second pass; q13/q22/q29 similar) — JVM
    # memory churn from millions of long strings, NOT monotone aging
    # (the second full pass measured 43% FASTER than the first).
    # Mitigation: at scale factors >= ~64x (fixture > 1 GB), run one
    # full DISCARDED warm pass over every query before measuring — the
    # per-query warm-up below does not fence it (the stalls survive 4
    # consecutive runs of the same query). Evidence + 3-pass validation
    # in BASELINE.md "Long-session degradation".
    if at_scale:
        for label in HEADLINE:
            spark._jvm.System.gc()
            run_spark(label)

    # interleaved per query: 1 warm-up pass over all engines, then
    # 1 discarded first timed rep + RUNS timed reps, engines alternating
    # WITHIN each rep so ambient drift cancels in the ratios. JVM GC
    # before each spark rep: accumulated broadcast/shuffle garbage from
    # earlier queries otherwise degrades later sort-heavy ones (measured
    # at 64x: join_asof 11.1 s dirty vs 2.3 s clean).
    # the paired single-node columns only run on sub-GB fixtures: at
    # 256x a single pandas pass is ~20 minutes (BASELINE.md: 1,182.8 s
    # total), so the at-scale artifact is spark + calibration only —
    # cross-session comparability at scale comes from the null-job
    # normalization and the fresh-session re-measure rule.
    # interspersed null-job probes (round-9 verdict #2): the pre/post
    # probe pair measured 5x apart within one session (0.289 vs 0.059)
    # because the scheduling floor itself drifts with JVM state; one
    # probe per query slot, median with the first discarded, tracks the
    # floor the headline queries actually paid.
    null_probes: list[float] = []
    for label in HEADLINE:
        t0 = time.perf_counter()
        _noop(spark.range(1))
        null_probes.append(time.perf_counter() - t0)
        duck_here = (not at_scale) or label in AT_SCALE_DUCK
        run_spark(label)
        if not at_scale:
            run_pandas(label)
        if duck_here:
            run_duck(label)
        for rep in range(RUNS + 1):
            spark._jvm.System.gc()
            s = run_spark(label)
            p = run_pandas(label) if not at_scale else None
            d = run_duck(label) if duck_here else None
            if rep == 0:
                continue
            sp[label].append(s)
            if p is not None:
                pdn[label].append(p)
            if d is not None:
                dk[label].append(d)

    cal_post = _calibrate(spark)

    q_sp = {k: round(statistics.median(v), 3) for k, v in sp.items()}
    q_pd = {k: round(statistics.median(v), 3) for k, v in pdn.items() if v}
    q_dk = {k: round(statistics.median(v), 3) for k, v in dk.items() if v}
    tot_sp = round(sum(q_sp.values()), 3)
    # ratios on the comparable subsets (pandas/duckdb may skip queries)
    sub_pd = round(sum(q_sp[k] for k in q_pd), 3)
    sub_dk = round(sum(q_sp[k] for k in q_dk), 3)
    tot_pd = round(sum(q_pd.values()), 3)
    tot_dk = round(sum(q_dk.values()), 3)

    # normalize by the MEDIAN of the interspersed probes (first
    # discarded): the pre/post pair proved 5x apart within a single r8
    # session, so any constant built from endpoint probes inherits that
    # noise; the interspersed median samples the floor 29 times AT the
    # moments the queries paid it. The quotient is DIAGNOSTIC-ONLY
    # (BASELINE.md §M7 r9): cross-session regression claims use the
    # paired ratios, never this number.
    null_const = statistics.median(null_probes[1:])
    calibration = {
        **cal_pre,
        "null_job_sec_post": cal_post["null_job_sec"],
        "jvm_probe_sec_post": cal_post["jvm_probe_sec"],
        "null_job_interspersed_sec": round(null_const, 4),
        "null_job_interspersed_n": len(null_probes) - 1,
        "spark_total_over_null_job": round(tot_sp / null_const, 1),
    }
    # r10 (round-9 verdict #4): the totals ratio is hostage to ONE
    # unstable denominator query (DuckDB q7_ewm swung 1.5 s vs 10.9 s
    # across driver sessions — a 9 s denominator move on a ~10-16 s
    # total). The GEOMEAN of per-query ratios is robust to a single
    # blowup (one 7x outlier moves a 29-query geomean ~7%, not ~2x),
    # so cross-session gates use the geomean first, totals as backup.
    def _geomean(ratios: list[float]) -> float | None:
        if not ratios:
            return None
        return round(math.exp(sum(math.log(r) for r in ratios) / len(ratios)), 3)

    paired = {
        "pandas_total": tot_pd,
        "duckdb_total": tot_dk,
        "spark_total_on_pandas_subset": sub_pd,
        "spark_total_on_duckdb_subset": sub_dk,
        "ratio_vs_pandas": round(sub_pd / tot_pd, 3) if tot_pd else None,
        "ratio_vs_duckdb": round(sub_dk / tot_dk, 3) if tot_dk else None,
        "ratio_geomean_vs_pandas": _geomean(
            [q_sp[k] / v for k, v in q_pd.items() if v > 0]
        ),
        "ratio_geomean_vs_duckdb": _geomean(
            [q_sp[k] / v for k, v in q_dk.items() if v > 0]
        ),
        "pandas": q_pd,
        "duckdb": q_dk,
    }
    return {
        "metric": "headline_total_spark",
        "value": tot_sp,
        "unit": "sec",
        "queries": q_sp,
        "sf": _sf(SF_DIR),
        "protocol": "interleaved_v2",
        "at_scale": at_scale,
        "calibration": calibration,
        "paired": paired,
        "regression_rule": (
            "cross-session claims use paired.ratio_vs_pandas / "
            "paired.ratio_vs_duckdb ONLY; calibration.* (incl. "
            "spark_total_over_null_job) is diagnostic, not a gate — "
            "the probe floor itself drifts 2-5x across sessions; raw "
            "value is a point sample in a ±25-30% container band "
            "(BASELINE.md §M7)"
        ),
    }


def bench_duckdb() -> dict:
    from pandas_tsdb_spark.registry import load_all

    specs = load_all()
    con = _duck_connect()
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
    return {
        "metric": "headline_total_duckdb",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "sf": _sf(SF_DIR),
    }


def bench_pandas() -> dict:
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
    return {
        "metric": "headline_total_pandas",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "sf": _sf(SF_DIR),
    }


def compact_line(payload: dict, full_name: str) -> str:
    """The driver-facing final line. The driver captures the LAST 2000
    chars of stdout and json-parses them; r8's full payload (per-query
    pandas/duckdb maps) outgrew that and arrived truncated
    (BENCH_r08.json parsed:null — round-9 verdict #1). The printed line
    keeps the contract fields (metric/value/unit/queries/sf) plus
    calibration and the paired TOTALS+RATIOS; the per-query single-node
    maps live in the full record file named by ``full_record``."""
    compact = {k: v for k, v in payload.items() if k != "regression_rule"}
    if isinstance(compact.get("paired"), dict):
        compact["paired"] = {
            k: v
            for k, v in compact["paired"].items()
            if k not in ("pandas", "duckdb")
        }
    compact["full_record"] = full_name
    line = json.dumps(compact)
    if len(line) > 1900:  # hard-fail HERE, not as parsed:null in the artifact
        raise AssertionError(
            f"driver line {len(line)} chars exceeds the 2000-char stdout "
            "tail capture budget — trim the payload"
        )
    return line


def main() -> None:
    engine = "spark"
    if "--duckdb" in sys.argv:
        engine = "duckdb"
    elif "--pandas" in sys.argv:
        engine = "pandas"
    payload = {"spark": bench_spark, "duckdb": bench_duckdb, "pandas": bench_pandas}[
        engine
    ]()
    if engine != "spark":
        print(json.dumps(payload))
        return
    # name by the fixture dir tail (sf0.1, sf256full, ...) AND the core
    # count (round-9 verdict #3: the driver's 8-core scaling rerun used
    # to clobber the committed 32-core record — run-unique names keep
    # every record). The fixture dir tail disambiguates scaled fixtures
    # that don't parse to a float sf.
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    full_name = (
        f"BENCH_full_{os.path.basename(SF_DIR.rstrip('/'))}_c{cpus}.json"
    )
    with open(os.path.join(REPO, full_name), "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    print(compact_line(payload, full_name))


if __name__ == "__main__":
    main()
