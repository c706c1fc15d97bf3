#!/usr/bin/env python
"""Per-headline-query Spark JOB census: how many jobs (= scheduling
floors) each bench query pays, and its wall time, in one warm session.

The sf0.1 bench floor decomposition (BASELINE.md) showed the
interspersed null-job floor at ~0.05 s; a query that launches 12 jobs
pays ~0.6 s of pure scheduling before any work. This tool attributes
that: job count via a per-query job group + StatusTracker.

Usage: python tools/job_census.py [label ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from bench import HEADLINE, _size_shuffle_to_data
    from pandas_tsdb_spark.registry import load_all
    from pandas_tsdb_spark.session import get_spark

    spark = get_spark("job-census")
    spark.sparkContext.setLogLevel("ERROR")
    _size_shuffle_to_data(spark)
    specs = load_all()
    only = set(sys.argv[1:])
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    rows = []
    for label, key in HEADLINE.items():
        if only and label not in only and key not in only:
            continue
        # warm pass (unlabelled)
        df = specs[key].builder(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        group = f"census_{label}"
        sc.setJobGroup(group, label)
        t0 = time.perf_counter()
        df = specs[key].builder(spark, SF_DIR)
        t_build = time.perf_counter() - t0
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        sc.setJobGroup(None, None)
        job_ids = tracker.getJobIdsForGroup(group)
        n_stages = 0
        for j in job_ids:
            info = tracker.getJobInfo(j)
            if info is not None:
                n_stages += len(info.stageIds)
        rows.append((label, dt, t_build, len(job_ids), n_stages))
        print(
            f"{label:24s} {dt:7.3f}s  build {t_build:6.3f}s  "
            f"jobs {len(job_ids):3d}  stages {n_stages:3d}"
        )
    tot = sum(r[1] for r in rows)
    jobs = sum(r[3] for r in rows)
    print(f"TOTAL {tot:.3f}s  jobs {jobs}  (floor at 0.05s/job ~ {jobs*0.05:.1f}s)")


if __name__ == "__main__":
    main()
