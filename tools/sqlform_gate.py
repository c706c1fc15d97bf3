#!/usr/bin/env python
"""Per-op conversion gate: run the named ops' Spark builders against
their DuckDB oracles at three scale factors (the same differential the
driver and tests/test_oracle.py run), plus a construction-time reading.

Every monolithic-SQL conversion (r9/r10 optimization rounds) must pass
this before it ships:

  python tools/sqlform_gate.py join_left join_semi ...

Exit 0 only if every op is oracle-equal at every SF.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SFS = ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")


def main() -> None:
    ops = [a for a in sys.argv[1:] if not a.startswith("-")]
    if not ops:
        print("usage: sqlform_gate.py OP [OP...]", file=sys.stderr)
        sys.exit(2)

    from pandas_tsdb_spark.registry import load_all
    from pandas_tsdb_spark.session import get_spark
    from tests.harness import duck_connect, run_one

    spark = get_spark("sqlform-gate")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()
    bad = 0
    for sf in SFS:
        con = duck_connect(sf)
        for name in ops:
            spec = specs[name]
            t0 = time.perf_counter()
            errs = run_one(spark, con, spec, sf)
            dt = time.perf_counter() - t0
            tag = "OK " if not errs else "FAIL"
            print(f"{tag} {name} @ {os.path.basename(sf)} ({dt:.2f}s)")
            for e in errs:
                print(f"     {e}")
            bad += len(errs)
        con.close()
    # steady-state construction time at sf0.1 (min of 5)
    for name in ops:
        spec = specs[name]
        spec.builder(spark, SFS[-1])
        samples = []
        for _ in range(5):
            t0 = time.perf_counter()
            spec.builder(spark, SFS[-1])
            samples.append(time.perf_counter() - t0)
        print(f"BUILD {name}: {min(samples)*1000:.0f} ms")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
