#!/usr/bin/env python
"""Vector-pipeline composition correctness AT SCALE (round 9).

tests/test_compose_vec_fuzz.py proves the engine agrees with DuckDB on
seeded random VECTOR pipelines at sf0.01/sf0.1, and (because the
generator's SQL side binds directory-backed fixtures via recursive
glob) DuckDB can still follow at 512k vectors — so unlike the doc
twin (tools/compose_scale_ab.py, layout A/B digests where no oracle
can follow), this tool runs the REAL differential at scale: each
seeded pipeline executes in Spark AND DuckDB over /tmp/sf256full's
512k-vector embeddings and the results compare exactly.

Usage: python tools/compose_vec_scale_ab.py [sf_dir] [n_seeds] [start]
e.g.   python tools/compose_vec_scale_ab.py /tmp/sf256full 12
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf256full"
N_SEEDS = int(sys.argv[2]) if len(sys.argv) > 2 else 12
START = int(sys.argv[3]) if len(sys.argv) > 3 else 0


def main() -> int:
    import duckdb

    from pandas_tsdb_spark.session import get_spark
    from tests.harness import compare
    from tests.test_compose_vec_fuzz import build_vec_pipeline

    spark = get_spark("compose-vec-scale-ab")
    spark.sparkContext.setLogLevel("ERROR")
    results = []
    fails = 0
    for seed in range(START, START + N_SEEDS):
        t0 = time.perf_counter()
        rel = build_vec_pipeline(spark, seed, SF_DIR)
        sp = rel.df.toPandas()
        du = duckdb.connect().execute(rel.sql).fetchdf()
        errs = compare(sp, du, f"vec_scale_seed{seed}")
        dt = round(time.perf_counter() - t0, 2)
        ok = not errs
        fails += not ok
        results.append({"seed": seed, "ok": ok, "rows": len(sp), "sec": dt})
        print(
            f"seed{seed}: {'ok' if ok else 'FAIL ' + str(errs[:2])} "
            f"rows={len(sp)} {dt}s",
            file=sys.stderr,
        )
    print(json.dumps({"sf_dir": SF_DIR, "fails": fails, "results": results}))
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
