#!/usr/bin/env python
"""Construction-cost census: driver-side plan-BUILD time per registry
builder (no action executed).

Motivation (r9-opt, kept for r10): every DataFrame transformation
eagerly re-analyzes its whole logical subtree (~28-46 ms/op on this
container), so a Column-chain builder pays 40-550 ms of pure driver
work per call. The fix is the monolithic-SQL form; this tool measures
which builders still pay, and by how much, so conversions can be
prioritized and A/B'd (min of N is the right statistic — construction
has one-sided noise from GC/JIT).

Usage:
  python tools/build_census.py [--sf DIR] [--reps N] [--ops a,b,c] [--out FILE]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--ops", default="")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    from pandas_tsdb_spark.registry import load_all
    from pandas_tsdb_spark.session import get_spark

    spark = get_spark("build-census")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()
    names = [n for n in args.ops.split(",") if n] or list(specs)

    # warm the scan/view memos once so the census measures steady-state
    # construction, not the first-call file-footer reads
    from pandas_tsdb_spark.catalog import Tables

    Tables(spark, args.sf).sql_views()

    out: dict[str, float] = {}
    eager: dict[str, float] = {}
    for name in names:
        spec = specs.get(name)
        if spec is None:
            print(f"?? unknown op {name}", file=sys.stderr)
            continue
        samples = []
        try:
            t0 = time.perf_counter()
            spec.builder(spark, args.sf)  # warm (memos, first-call JIT)
            warm = time.perf_counter() - t0
            if warm > 0.8:
                # eager builder (localCheckpoint / stream / collect at
                # build time): construction IS execution — record the
                # single warm call and move on, the SQL-conversion
                # lever does not apply
                eager[name] = round(warm * 1000, 1)
                continue
            for _ in range(args.reps):
                t0 = time.perf_counter()
                spec.builder(spark, args.sf)
                samples.append(time.perf_counter() - t0)
        except Exception as e:  # builders needing absent tables etc.
            print(f"!! {name}: {type(e).__name__}: {e}", file=sys.stderr)
            continue
        out[name] = round(min(samples) * 1000, 1)  # ms
    if eager:
        out["__eager_warm_ms"] = eager  # type: ignore[assignment]

    eager_block = out.pop("__eager_warm_ms", None)
    ranked = dict(sorted(out.items(), key=lambda kv: -kv[1]))
    if eager_block is not None:
        ranked["__eager_warm_ms"] = eager_block
    text = json.dumps(ranked, indent=1)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text + "\n")
    print(text)
    total = sum(out.values())
    print(f"# {len(out)} builders, total min-build {total/1000:.2f} s",
          file=sys.stderr)


if __name__ == "__main__":
    main()
