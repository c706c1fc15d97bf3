#!/usr/bin/env python
"""Interleaved at-scale A/B/measurement driver (256x fixture).

Usage:
  python tools/ab_256.py q19_upsert_cdc q8_topk_per_group ...
  SPARK_GRAFT_SF_DIR overrides the fixture (default /tmp/sf256full).

Protocol (BASELINE.md §M7 / memory): same-session interleaved, JVM GC
before each rep, one discarded warm pass per query first (the 256x
string-stall fence), medians of N (default 3) printed per query.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/tmp/sf256full")
REPS = int(os.environ.get("AB_REPS", "3"))

HEADLINE = None  # filled from bench


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("-")]
    from bench import HEADLINE as H
    from pandas_tsdb_spark.registry import load_all
    from pandas_tsdb_spark.session import get_spark

    spark = get_spark("ab-256")
    spark.sparkContext.setLogLevel("ERROR")
    # scale-adaptive shuffle sizing, same rule as bench.py
    total = 0
    for dirpath, _d, fnames in os.walk(SF):
        for f in fnames:
            total += os.path.getsize(os.path.join(dirpath, f))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n = max(8, min(4 * cpus, total // (64 * 1024 * 1024) + 1))
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    os.environ.setdefault("SPARK_GRAFT_STREAM_SHUFFLE", "4")
    specs = load_all()

    def run(key):
        t0 = time.perf_counter()
        specs[key].builder(spark, SF).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.perf_counter() - t0

    keys = [H.get(nm, nm) for nm in names]
    # warm fence pass
    for k in keys:
        spark._jvm.System.gc()
        spark.sparkContext.setJobDescription(f"warm {k}")
        run(k)
    samples = {k: [] for k in keys}
    for rep in range(REPS):
        for k in keys:
            spark._jvm.System.gc()
            spark.sparkContext.setJobDescription(f"rep{rep} {k}")
            samples[k].append(run(k))
    for k in keys:
        med = statistics.median(samples[k])
        print(f"{k}: median {med:.2f}s  reps={[round(s,2) for s in samples[k]]}")


if __name__ == "__main__":
    main()
