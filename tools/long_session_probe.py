#!/usr/bin/env python
"""Round-8 verdict item #2: reproduce and fence the LONG-SESSION
degradation the r7 judge observed (q10 81.3 s in a 29-query 256x
session vs 7.8 s in a fresh session — up to 10x on single queries,
gone on restart).

Protocol: ONE session, the full headline loop run ``passes`` times
back-to-back (1 discarded warm-up + median of 3 per query, the bench
protocol). After each query, record the suspects:

- JVM heap used (Runtime totalMemory - freeMemory, after a System.gc)
- cumulative size and file count of the shuffle/block-manager local
  dirs (blockmgr-*, spark-* under java.io.tmpdir / spark.local.dir)
- the codegen cache can't be sized from Python; its effect shows as a
  monotone pass-over-pass slowdown instead

Output: one JSON line {"passes": [...per-query medians...],
"suspects": {...}, "verdict_ratio": worst per-query passN/pass1}.

Usage: python tools/long_session_probe.py [sf_dir] [passes=2]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE, _size_shuffle_to_data  # noqa: E402
from pandas_tsdb_spark.registry import load_all  # noqa: E402
from pandas_tsdb_spark.session import get_spark  # noqa: E402


def _local_dirs(spark) -> list[str]:
    out = []
    jtmp = spark._jvm.System.getProperty("java.io.tmpdir") or "/tmp"
    for root in {jtmp, "/tmp"}:
        if os.path.isdir(root):
            for e in os.listdir(root):
                if e.startswith(("blockmgr-", "spark-")):
                    out.append(os.path.join(root, e))
    return out


def _dir_stats(paths: list[str]) -> tuple[int, int]:
    total, n = 0, 0
    for p in paths:
        for dirpath, _d, files in os.walk(p):
            for f in files:
                try:
                    total += os.path.getsize(os.path.join(dirpath, f))
                    n += 1
                except OSError:
                    pass
    return total, n


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    os.environ["SPARK_GRAFT_SF_DIR"] = sf_dir
    # bench module captured SF_DIR at import; override its global too
    import bench

    bench.SF_DIR = sf_dir
    spark = get_spark("long-session-probe")
    spark.sparkContext.setLogLevel("ERROR")
    _size_shuffle_to_data(spark)
    specs = load_all()
    rt = spark._jvm.Runtime.getRuntime()

    results: list[dict[str, float]] = []
    suspects: list[dict] = []
    for p in range(passes):
        times: dict[str, float] = {}
        for label, key in HEADLINE.items():
            builder = specs[key].builder
            spark._jvm.System.gc()
            samples = []
            for i in range(1 + 3):
                t0 = time.perf_counter()
                builder(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                dt = time.perf_counter() - t0
                if i >= 1:
                    samples.append(dt)
            times[label] = round(statistics.median(samples), 3)
            heap = (rt.totalMemory() - rt.freeMemory()) / 2**20
            sh_bytes, sh_files = _dir_stats(_local_dirs(spark))
            suspects.append(
                {
                    "pass": p,
                    "q": label,
                    "sec": times[label],
                    "heap_mb": round(heap),
                    "shuffle_mb": round(sh_bytes / 2**20),
                    "shuffle_files": sh_files,
                }
            )
            print(
                f"pass{p} {label}: {times[label]:.2f}s heap={heap:.0f}MB "
                f"shuffle={sh_bytes / 2**20:.0f}MB/{sh_files}f",
                file=sys.stderr,
            )
        results.append(times)
    worst = max(
        (results[-1][q] / results[0][q], q)
        for q in results[0]
        if results[0][q] > 0.2  # ratio on sub-noise queries is meaningless
    )
    print(
        json.dumps(
            {
                "metric": "long_session_probe",
                "sf_dir": sf_dir,
                "passes": results,
                "totals": [round(sum(r.values()), 2) for r in results],
                "worst_lastpass_over_first": {
                    "q": worst[1],
                    "ratio": round(worst[0], 2),
                },
                "suspects_tail": suspects[-6:],
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
