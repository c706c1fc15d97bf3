"""Round-6: measured skew evidence at scale (brief: "skewed keys ->
salting or AQE skew-join").

Interleaved same-process A/B/C on the 256x events fixture (25.6M rows)
of the three ways to run the hot-key join that join_skew_salted
(joins.py) mitigates: a third of the fact rows share ONE key, so a
plain shuffle join puts ~8.5M rows on a single reducer.

  A  plain shuffle join, AQE skew handling OFF  (the naive plan)
  B  explicit salting (the join_skew_salted shape, S=8)
  C  plain join with AQE skewJoin ON            (the adaptive path)

All three produce identical results (the salted join is provably equal
to the unsalted one; that IS join_skew_salted's oracle). Interleaved
A,B,C,A,B,C in one session so ambient drift hits all variants equally
(round-5 lesson: isolated perf runs lie in this container).

Usage: python tools/skew_ab.py [sf_dir=/tmp/sf256full] [reps=5]
"""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from pandas_tsdb_spark.catalog import Tables  # noqa: E402
from pandas_tsdb_spark.session import get_spark  # noqa: E402

_S = 8  # salt fan-out, same as joins._N_SALT default shape


def _frames(spark, sf_dir):
    ev = Tables(spark, sf_dir).events
    hot = F.when(
        F.col("user_id") % 3 == 0, F.lit(0).cast("long")
    ).otherwise(F.col("user_id"))
    fact = ev.select("event_id", "value", hot.alias("k"))
    dim = (
        ev.select(hot.alias("k"), "value")
        .groupBy("k")
        .agg(
            F.count("*").alias("k_events"),
            F.round(F.sum("value"), 2).alias("k_total"),
        )
    )
    return fact, dim


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf256full"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark("skew-ab")
    spark.sparkContext.setLogLevel("ERROR")
    # the dim side is tiny — forbid the broadcast fast path so the A/B
    # actually measures the SHUFFLE join strategies a big-dim join uses
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

    fact, dim = _frames(spark, sf_dir)
    dim_salted = dim.withColumn(
        "salt", F.explode(F.array(*[F.lit(s) for s in range(_S)]))
    )
    fact_salted = fact.withColumn(
        "salt", F.pmod(F.col("event_id"), F.lit(_S))
    )

    def run_plain_noaqe():
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        t0 = time.perf_counter()
        _noop(fact.join(dim, "k"))
        return time.perf_counter() - t0

    def run_salted():
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        t0 = time.perf_counter()
        _noop(fact_salted.join(dim_salted, ["k", "salt"]))
        return time.perf_counter() - t0

    def run_plain_aqe_skew():
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        t0 = time.perf_counter()
        _noop(fact.join(dim, "k"))
        return time.perf_counter() - t0

    variants = [
        ("A_plain_skewjoin_off", run_plain_noaqe),
        ("B_salted", run_salted),
        ("C_plain_aqe_skewjoin", run_plain_aqe_skew),
    ]
    samples: dict[str, list[float]] = {name: [] for name, _ in variants}
    for name, fn in variants:  # warm one round un-recorded
        fn()
    for _ in range(reps):
        for name, fn in variants:
            samples[name].append(fn())
    for name, ts in samples.items():
        print(
            f"{name}: median={statistics.median(ts):.2f}"
            f" min={min(ts):.2f} all={[round(t, 2) for t in ts]}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
