"""Round-6 verdict item 5: 1024x oracle differentials for the
Python-carry recurrence kernels.

The r5 NaN-gate bug lived in the class of state that crosses Arrow
batch boundaries — and batch boundaries MOVE with scale, so a kernel
proven right at sf0.01 can still be wrong at 102.4M events. This tool
re-compares the five recurrence kernels (win_ewm, win_holt,
win_kalman, win_cusum, stream_stateful) against their DuckDB oracles
on the COMPLETE 1024x fixture.

A full row-by-row compare of 102.4M rows exceeds the local driver's
collect ceiling, so equality is verified by ORDER-INDEPENDENT exact
aggregates computed engine-side in both systems (the r5 precedent for
join_inner/text_tfidf at 256x): row count, per-column non-null count,
and the exact integer sum of round(col * 1e6) accumulated in 128-bit
integers (DECIMAL(38,0) Spark-side, HUGEINT Duck-side). Integer sums
commute, so equal (count, nulls, sum) across engines is equivalent to
bit-exact agreement of the rounded column without materializing it.

Usage: python tools/scale_recurrence_diff.py [sf_dir]   (default /tmp/sf1024full)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

from pandas_tsdb_spark.registry import load_all  # noqa: E402
from pandas_tsdb_spark.session import get_spark  # noqa: E402

OPS = {
    "win_cusum": "cusum",
    "win_ewm": "ewm_value",
    "win_holt": "holt_level",
    "win_kalman": "kalman_level",
    "stream_stateful": "cum_value",
}


def _stateful_via_files(spark, sf_dir: str):
    import tempfile

    from pandas_tsdb_spark.operators import streaming as S

    out_dir = tempfile.mkdtemp(prefix="sg_stateful_scale_") + "/out"
    ck = tempfile.mkdtemp(prefix="sg_stateful_scale_ck_")
    ev = S.events_stream(spark, sf_dir)
    out = ev.groupBy("user_id").applyInPandasWithState(
        S.make_cumsum_kernel(),
        "user_id long, event_id long, cum_value double",
        "acc double, seen boolean",
        "Append",
        "NoTimeout",
    )
    q = (
        out.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out_dir)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1024full"
    spark = get_spark()
    specs = load_all()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet/*.parquet', "
        "hive_partitioning=false)"
    )
    failures = 0
    for name, col in OPS.items():
        spec = specs[name]
        t0 = time.time()
        if name == "stream_stateful":
            # the registered builder drains to a MEMORY sink, whose
            # driver-side result cap (spark.driver.maxResultSize) is an
            # infra limit at 102.4M output rows — drive the SAME kernel
            # and plan through a parquet sink instead (identical state
            # machinery; only the sink differs)
            sdf = _stateful_via_files(spark, sf_dir)
        else:
            sdf = spec.builder(spark, sf_dir)
        srow = sdf.agg(
            F.count("*").alias("n"),
            F.count(col).alias("nn"),
            F.sum(F.round(F.col(col) * 1e6).cast("decimal(38,0)")).alias("s"),
        ).collect()[0]
        t_spark = time.time() - t0
        t0 = time.time()
        drow = con.execute(
            f"SELECT count(*) AS n, count({col}) AS nn, "
            f"sum(CAST(round({col} * 1e6) AS HUGEINT)) AS s "
            f"FROM ({spec.oracle})"
        ).fetchone()
        t_duck = time.time() - t0
        got = (int(srow["n"]), int(srow["nn"]), int(srow["s"]))
        want = (int(drow[0]), int(drow[1]), int(drow[2]))
        ok = got == want
        failures += 0 if ok else 1
        print(
            f"{name}.{col}: {'OK' if ok else 'DIVERGED'} "
            f"spark={got} duck={want} "
            f"(spark {t_spark:.0f}s, duck {t_duck:.0f}s)",
            flush=True,
        )
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
