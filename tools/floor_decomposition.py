"""Round-7 verdict item 1: the sf0.1 floor decomposition, measured the
only trustworthy way on this container — INTERLEAVED same-process A/B.

For every headline query the tool alternates (spark run, pandas run)
rep by rep in ONE process, so the container's documented ±25-30 %
ambient drift hits both engines identically. Per query it reports
median spark, median pandas, and the delta; the deltas SUM to the
total sf0.1 gap, decomposing it into named per-query components. A
`null_job` row measures the pure Spark job floor (range(1) through the
noop sink — scheduling + DAG + task launch, no data), which is the
irreducible constant every one of the 29 queries pays at least once.

Output: a markdown table to paste into BASELINE.md, plus a JSON line.

Usage: python tools/floor_decomposition.py [reps=5]
"""

from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from bench import HEADLINE, SF_DIR, _size_shuffle_to_data  # noqa: E402
from pandas_tsdb_spark.registry import load_all  # noqa: E402
from pandas_tsdb_spark.session import get_spark  # noqa: E402
from tools.bench_pandas import PANDAS_QUERIES  # noqa: E402


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark("floor-decomposition")
    spark.sparkContext.setLogLevel("ERROR")
    _size_shuffle_to_data(spark)
    specs = load_all()

    labels = ["null_job"] + list(HEADLINE)
    sp: dict[str, list[float]] = {k: [] for k in labels}
    pd_: dict[str, list[float]] = {k: [] for k in labels}

    def run_spark(label: str) -> float:
        t0 = time.perf_counter()
        if label == "null_job":
            spark.range(1).write.format("noop").mode("overwrite").save()
        else:
            specs[HEADLINE[label]].builder(spark, SF_DIR).write.format(
                "noop"
            ).mode("overwrite").save()
        return time.perf_counter() - t0

    def run_pandas(label: str) -> float:
        fn = PANDAS_QUERIES.get(label)
        t0 = time.perf_counter()
        if fn is not None:
            fn(SF_DIR)
        return time.perf_counter() - t0

    # one discarded warm-up pass over everything (parquet page cache,
    # JIT, Python imports), then interleaved timed reps. Each engine's
    # FIRST timed rep per query is also discarded (r7 judge finding:
    # with reps=3 a single cold rep — page-cache / GC interference
    # between interleaved reps — dominated the pandas median 9.46 s vs
    # 0.81 s steady-state; +1 rep is cheap, a poisoned median is not).
    for label in labels:
        run_spark(label)
        run_pandas(label)
    for rep in range(reps + 1):
        for label in labels:
            spark._jvm.System.gc()
            s, p = run_spark(label), run_pandas(label)
            if rep > 0:
                sp[label].append(s)
                pd_[label].append(p)

    rows = []
    for label in labels:
        s = statistics.median(sp[label])
        p = statistics.median(pd_[label])
        rows.append((label, s, p, s - p))
    tot_s = sum(r[1] for r in rows if r[0] != "null_job")
    tot_p = sum(r[2] for r in rows if r[0] != "null_job")
    print("| query | spark s | pandas s | delta s |")
    print("| --- | --- | --- | --- |")
    for label, s, p, d in rows:
        print(f"| {label} | {s:.3f} | {p:.3f} | {d:+.3f} |")
    print(
        f"| **total (29q)** | **{tot_s:.2f}** | **{tot_p:.2f}** | "
        f"**{tot_s - tot_p:+.2f}** (ratio {tot_s / tot_p:.2f}x) |"
    )
    print(
        json.dumps(
            {
                "metric": "floor_decomposition",
                "spark_total": round(tot_s, 3),
                "pandas_total": round(tot_p, 3),
                "ratio": round(tot_s / tot_p, 3),
                "reps": reps,
                "per_query": {
                    r[0]: {
                        "spark": round(r[1], 3),
                        "pandas": round(r[2], 3),
                        "delta": round(r[3], 3),
                    }
                    for r in rows
                },
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
