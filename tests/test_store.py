"""TsStore: append/fetch/compact over a named-series parquet store."""

from __future__ import annotations

import os
import tempfile

import pytest

from pyspark.sql import functions as F

from pandas_tsdb_spark.catalog import Tables
from pandas_tsdb_spark.store import TsStore

SMALL = "/root/testdata/sf0.001"


@pytest.fixture()
def store(spark):
    return TsStore(spark, tempfile.mkdtemp(prefix="tsdb_store_"))


@pytest.fixture(scope="module")
def events(spark):
    return Tables(spark, SMALL).events


def test_roundtrip_and_series_listing(spark, store, events):
    store.append("events", events)
    assert store.series() == ["events"]
    got = store.fetch("events")
    assert got.count() == events.count()
    assert set(got.columns) == set(events.columns)


def test_fetch_range_prunes_partitions(spark, store, events):
    store.append("events", events)
    sliced = store.fetch("events", "2024-01-05", "2024-01-10 23:59:59")
    want = events.filter(
        F.col("ts").between("2024-01-05", "2024-01-10 23:59:59")
    ).count()
    assert sliced.count() == want
    plan = sliced._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # the day bound must appear inside the partition filter list
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert any("_date" in ln for ln in pf), pf


def test_fetch_keys_and_columns_pushdown(spark, store, events):
    store.append("events", events)
    uid = events.select("user_id").first()[0]
    got = store.fetch(
        "events", keys={"user_id": uid}, columns=["user_id", "value"]
    )
    assert set(got.columns) == {"ts", "user_id", "value"}
    assert got.count() == events.filter(F.col("user_id") == uid).count()
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan


def test_append_is_blind_and_latest_by_resolves(spark, store, events):
    base = events.limit(100)
    store.append("events", base)
    # re-append the same rows with bumped values — duplicates on disk
    bumped = base.withColumn("value", F.col("value") + 1000.0)
    store.append("events", bumped)
    raw = store.fetch("events")
    assert raw.count() == 200
    latest = store.fetch(
        "events", latest_by=["event_id"], order_col="value"
    )
    assert latest.count() == 100
    assert latest.filter(F.col("value") >= 1000.0).count() == 100


def test_compact_keeps_latest_and_shrinks(spark, store, events):
    base = events.limit(100)
    store.append("events", base)
    store.append("events", base.withColumn("value", F.col("value") + 1000.0))
    store.compact("events", key_cols=["event_id"], order_col="value")
    after = store.fetch("events")
    assert after.count() == 100
    assert after.filter(F.col("value") >= 1000.0).count() == 100
    # compaction must also be idempotent
    store.compact("events", key_cols=["event_id"], order_col="value")
    assert store.fetch("events").count() == 100


def test_multiple_series_are_isolated(spark, store, events):
    store.append("a", events.limit(10))
    store.append("b", events.limit(20))
    assert store.series() == ["a", "b"]
    assert store.fetch("a").count() == 10
    assert store.fetch("b").count() == 20


def test_bad_series_name_rejected(store):
    with pytest.raises(ValueError):
        store.path("../escape")


def test_drop_before_retention(spark, store, events):
    store.append("events", events)
    days_before = store.fetch("events").select(
        F.to_date("ts").alias("d")
    ).distinct().count()
    dropped = store.drop_before("events", "2024-01-15")
    assert dropped > 0
    after = store.fetch("events")
    days_after = after.select(F.to_date("ts").alias("d")).distinct().count()
    assert days_after == days_before - dropped
    # everything remaining is on/after the cutoff
    assert after.filter(F.col("ts") < "2024-01-15").count() == 0
    # dropping again is a no-op
    assert store.drop_before("events", "2024-01-15") == 0


def test_as_of_snapshot_reads(spark, store, events):
    """fetch(as_of=...) pins the store to an ingest time: late appends
    after the pin are invisible; a rerun sees the identical corpus."""
    first = events.limit(400)
    late = events.subtract(first)
    store.append("ev", first, ingest_ts="2025-01-01 00:00:00")
    store.append("ev", late, ingest_ts="2025-02-01 00:00:00")

    n_first, n_all = first.count(), events.count()
    snap = store.fetch("ev", as_of="2025-01-15 00:00:00")
    assert snap.count() == n_first
    assert store.fetch("ev").count() == n_all
    assert store.fetch("ev", as_of="2025-03-01 00:00:00").count() == n_all
    # snapshot output carries no internal columns
    assert set(snap.columns) == set(events.columns)
    # rerun-stability: the pinned snapshot returns the same exact rows
    a = sorted(snap.select("event_id").toPandas().event_id)
    b = sorted(store.fetch("ev", as_of="2025-01-15 00:00:00")
               .select("event_id").toPandas().event_id)
    assert a == b


def test_as_of_composes_with_latest_by(spark, store, events):
    """A corrected point appended after the pin is invisible to the
    snapshot but wins the latest_by resolution afterwards."""
    base = events.limit(50)
    store.append("ev2", base, ingest_ts="2025-01-01 00:00:00")
    fix = base.limit(1).withColumn("value", F.lit(9999.0))
    store.append("ev2", fix, ingest_ts="2025-02-01 00:00:00")

    snap = store.fetch("ev2", as_of="2025-01-15 00:00:00",
                       latest_by=["event_id"], order_col="ts")
    assert snap.filter(F.col("value") == 9999.0).count() == 0
    cur = store.fetch("ev2", latest_by=["event_id"], order_col="ts")
    assert cur.count() == 50


def test_delete_keys_rewrites_only_touched_days(spark, store, events):
    """delete_keys removes exactly the subject's rows and rewrites only
    day partitions that contained them; other days' files are
    untouched (mtime-stable)."""
    import os

    store.append("events", events)
    path = store.path("events")
    victims = [r[0] for r in events.select("user_id").distinct().limit(2).collect()]
    victim_days = {
        r[0]
        for r in events.filter(F.col("user_id").isin(victims))
        .select(F.date_format("ts", "yyyy-MM-dd"))
        .distinct()
        .collect()
    }
    before = {
        d: os.stat(os.path.join(path, d)).st_mtime
        for d in os.listdir(path)
        if d.startswith("_date=")
    }
    want_deleted = events.filter(F.col("user_id").isin(victims)).count()
    got_deleted = store.delete_keys("events", "user_id", victims)
    assert got_deleted == want_deleted

    after = store.fetch("events")
    assert after.filter(F.col("user_id").isin(victims)).count() == 0
    assert after.count() == events.count() - want_deleted
    for d, mtime in before.items():
        day = d.split("=", 1)[1]
        if day not in victim_days:
            assert os.stat(os.path.join(path, d)).st_mtime == mtime, d


def test_optimize_merges_small_files_content_identical(spark, store, events):
    """Five blind appends -> >= 5 files per day; optimize must collapse
    each day's debt to one file (tiny data, 128MB target) and leave
    row content byte-identical (it is layout-only — no dedup)."""
    import os

    for _ in range(5):
        store.append("events", events)
    before = (
        store.fetch("events")
        .groupBy("event_id")
        .count()
        .orderBy("event_id")
        .collect()
    )
    path = store.path("events")

    def files_per_part():
        return {
            e: len([f for f in os.listdir(os.path.join(path, e))
                    if f.endswith(".parquet")])
            for e in os.listdir(path)
            if e.startswith("_date=")
        }

    fb = files_per_part()
    assert max(fb.values()) >= 5
    n = store.optimize("events")
    assert n == len(fb)  # every partition carried debt
    fa = files_per_part()
    assert max(fa.values()) == 1
    after = (
        store.fetch("events")
        .groupBy("event_id")
        .count()
        .orderBy("event_id")
        .collect()
    )
    assert before == after
    # idempotent: nothing left over the threshold
    assert store.optimize("events") == 0


def test_optimize_crash_recovery(spark, store, events):
    """Simulated crash states from a prior optimize() must be swept
    without data loss or double counting:
    - a stray '.opt.tmp' (unfinished rewrite) is discarded
    - a '.X.opt.old' whose partition dir is MISSING (crash between the
      two renames) is restored — it holds the only copy
    - dot-prefixed swap dirs are invisible to fetch() either way."""
    import os
    import shutil

    store.append("events", events)
    store.append("events", events)
    n_rows = store.fetch("events").count()
    path = store.path("events")
    parts = sorted(e for e in os.listdir(path) if e.startswith("_date="))
    assert len(parts) >= 2
    # crash state 1: leftover tmp for one partition
    shutil.copytree(
        os.path.join(path, parts[0]), os.path.join(path, f".{parts[0]}.opt.tmp")
    )
    # crash state 2: partition renamed to .old, new dir never landed
    os.rename(
        os.path.join(path, parts[1]), os.path.join(path, f".{parts[1]}.opt.old")
    )
    # fetch ignores dot-dirs: sees all partitions except the in-flight one
    assert store.fetch("events").count() < n_rows
    store.optimize("events")
    assert not any(e.startswith(".") and ".opt." in e for e in os.listdir(path))
    assert os.path.isdir(os.path.join(path, parts[1]))  # restored
    assert store.fetch("events").count() == n_rows


def _daily_agg(day_df):
    return day_df.groupBy("event_type").agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total")
    )


def test_rollup_incremental_refresh(spark, store, events):
    """Continuous aggregate: initial refresh folds every day; a new
    day's append refreshes exactly that day (untouched rollup
    partitions keep their mtime); late data to an old day recomputes
    only it; dropping source days drops the rollup days."""
    import os

    jan = events.filter(F.col("ts") < "2024-01-15")
    rest = events.filter(F.col("ts") >= "2024-01-15")
    store.append("events", jan)
    n0 = store.refresh_rollup("events", "events_daily", _daily_agg)
    assert n0 == len({r[0] for r in jan.select(F.to_date("ts")).distinct().collect()})
    # idempotent: nothing changed, nothing recomputes
    assert store.refresh_rollup("events", "events_daily", _daily_agg) == 0

    # rollup == batch aggregate per (day, type) over the whole slice
    got = (
        store.read_rollup("events_daily")
        .groupBy("event_type")
        .agg(F.sum("n").alias("n"))
        .collect()
    )
    want = jan.groupBy("event_type").count().collect()
    assert {(r.event_type, r.n) for r in got} == {
        (r.event_type, r["count"]) for r in want
    }

    path = store.path("events_daily")
    mtimes = {
        d: os.stat(os.path.join(path, d)).st_mtime
        for d in os.listdir(path)
        if d.startswith("_date=")
    }
    # append the rest (new days) -> only those days refresh
    store.append("events", rest)
    new_days = {
        str(r[0]) for r in rest.select(F.to_date("ts")).distinct().collect()
    }
    n1 = store.refresh_rollup("events", "events_daily", _daily_agg)
    assert n1 == len(new_days)
    for d, m in mtimes.items():
        if d.split("=", 1)[1] not in new_days:
            assert os.stat(os.path.join(path, d)).st_mtime == m, d

    # late data into one old day -> exactly one day recomputes
    late = jan.filter(F.to_date("ts") == "2024-01-03")
    store.append("events", late)
    assert store.refresh_rollup("events", "events_daily", _daily_agg) == 1
    day3 = (
        store.read_rollup("events_daily", "2024-01-03", "2024-01-03")
        .agg(F.sum("n"))
        .collect()[0][0]
    )
    assert day3 == 2 * late.count()

    # retention on the source propagates as rollup drops
    dropped = store.drop_before("events", "2024-01-05")
    assert dropped > 0
    n2 = store.refresh_rollup("events", "events_daily", _daily_agg)
    assert n2 == dropped
    remaining = {
        d.split("=", 1)[1] for d in os.listdir(path) if d.startswith("_date=")
    }
    assert min(remaining) >= "2024-01-05"


def test_changes_feed_composes(spark, tmp_path):
    """changes(since, until] returns exactly the rows ingested in the
    window; consecutive feeds over adjacent windows partition the
    appended rows with no overlap and no loss."""
    from pandas_tsdb_spark.catalog import Tables

    store = TsStore(spark, str(tmp_path / "cdc"))
    ev = Tables(spark, SMALL).events.select("event_id", "ts", "value")
    a = ev.filter(F.col("event_id") % 3 == 0)
    b = ev.filter(F.col("event_id") % 3 == 1)
    c = ev.filter(F.col("event_id") % 3 == 2)
    store.append("s", a, ingest_ts="2025-01-01 00:00:00")
    store.append("s", b, ingest_ts="2025-02-01 00:00:00")
    store.append("s", c, ingest_ts="2025-03-01 00:00:00")

    feed1 = store.changes("s", "2024-12-31", "2025-01-15")
    feed2 = store.changes("s", "2025-01-15", "2025-02-15")
    feed3 = store.changes("s", "2025-02-15")
    ids = lambda df: sorted(r.event_id for r in df.select("event_id").collect())
    assert ids(feed1) == ids(a)
    assert ids(feed2) == ids(b)
    assert ids(feed3) == ids(c)
    # boundary is half-open: since exactly at an ingest stamp excludes it
    assert ids(store.changes("s", "2025-02-01 00:00:00")) == ids(c)
    # full feed == full store content
    assert ids(store.changes("s", "2000-01-01")) == ids(store.fetch("s"))


def test_compact_crash_recovery(spark, store, events):
    """A compact() crash between its two directory renames leaves the
    series dir MISSING with the only copy in '.{name}.compact.old'
    (round-2 ADVICE, medium). The sweep at compact()/fetch() entry must
    restore it and discard any unfinished '.compact.tmp'."""
    import os
    import shutil

    store.append("events", events)
    n_rows = store.fetch("events").count()
    parent = store.root
    path = store.path("events")
    # crash state: table dir renamed away, replacement never landed,
    # plus a stale half-written tmp
    shutil.copytree(path, os.path.join(parent, ".events.compact.tmp"))
    os.rename(path, os.path.join(parent, ".events.compact.old"))
    assert store.series() == []  # dot-dirs stay invisible
    assert store.fetch("events").count() == n_rows  # sweep restored it
    assert os.path.isdir(path)
    assert not os.path.isdir(os.path.join(parent, ".events.compact.old"))
    assert not os.path.isdir(os.path.join(parent, ".events.compact.tmp"))
    # completed-swap-lost-cleanup state: old present AND table present
    shutil.copytree(path, os.path.join(parent, ".events.compact.old"))
    store.compact("events", key_cols=["event_id"])
    assert not os.path.isdir(os.path.join(parent, ".events.compact.old"))
    assert store.fetch("events").count() == n_rows


def test_schema_file_tracks_schema_evolution(spark, store, events):
    """_schema.json must follow the LATEST append (round-2 ADVICE): after
    a widened append and a retention wipe, the emptied store fetches
    with the evolved schema, not the first append's."""
    store.append("events", events)
    widened = events.withColumn("extra_col", F.lit(1).cast("long"))
    store.append("events", widened)
    dropped = store.drop_before("events", "2100-01-01")
    assert dropped >= 1
    got = store.fetch("events")
    assert got.count() == 0
    assert "extra_col" in got.columns


def test_concurrent_appends_and_compact(spark, store, events):
    """Concurrency law (round-2 verdict #5): two simultaneous blind
    appenders plus a concurrent fetch/compact must lose no rows and
    leave no bogus partitions — append is blind-partitioned and
    compact's swap is atomic, so interleaving is safe by design; this
    drives it for real on threads."""
    import os
    import threading

    base = events.select("event_id", "user_id", "ts", "value")
    n = base.count()
    errs = []

    def appender(tag):
        try:
            # distinct event_id spaces so compact's keep-latest never
            # merges the two writers' rows
            df = base.withColumn(
                "event_id", F.col("event_id") + F.lit(tag * 10_000_000)
            )
            store.append("events", df)
        except Exception as e:  # pragma: no cover - failure reporting
            errs.append(e)

    def reader():
        try:
            for _ in range(3):
                store.fetch("events", latest_by=["event_id"]).count()
        except Exception as e:
            # a concurrent first-append may race directory creation;
            # only total absence is fine mid-flight
            if "PATH_NOT_FOUND" not in str(e):
                errs.append(e)

    threads = [
        threading.Thread(target=appender, args=(1,)),
        threading.Thread(target=appender, args=(2,)),
        threading.Thread(target=reader),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert errs == []
    assert store.fetch("events").count() == 2 * n
    # append || compact
    t1 = threading.Thread(target=appender, args=(3,))
    t2 = threading.Thread(
        target=store.compact, args=("events",), kwargs={"key_cols": ["event_id"]}
    )
    t1.start(); t2.start(); t1.join(); t2.join()
    got = store.fetch("events", latest_by=["event_id"])
    assert got.count() == 3 * n  # no lost rows from either writer
    path = store.path("events")
    assert all(
        e.startswith(("_date=", "_schema", "_manifest", "."))
        or e.startswith("_SUCCESS")
        for e in os.listdir(path)
    ), os.listdir(path)


def test_changes_feed_duplicate_ingest_timestamps(spark, tmp_path):
    """Half-open (since, until] law under DUPLICATE ingest stamps (the
    round-2 verdict fuzz ask): several appends pinned to the SAME
    ingest_ts must land together in exactly one window — a feed with
    until=T takes all of them, a feed with since=T takes none — and
    adjacent feeds cut AT the duplicated stamp still partition the rows
    with no loss or overlap."""
    from pandas_tsdb_spark.catalog import Tables

    store = TsStore(spark, str(tmp_path / "cdc_dup"))
    ev = Tables(spark, SMALL).events.select("event_id", "ts", "value")
    a = ev.filter(F.col("event_id") % 4 == 0)
    b = ev.filter(F.col("event_id") % 4 == 1)
    c = ev.filter(F.col("event_id") % 4 == 2)
    d = ev.filter(F.col("event_id") % 4 == 3)
    T = "2025-06-01 00:00:00"
    store.append("s", a, ingest_ts="2025-05-01 00:00:00")
    store.append("s", b, ingest_ts=T)  # two distinct appends,
    store.append("s", c, ingest_ts=T)  # same ingest stamp
    store.append("s", d, ingest_ts="2025-07-01 00:00:00")

    ids = lambda df: sorted(r.event_id for r in df.select("event_id").collect())
    both = sorted(ids(b) + ids(c))
    # until=T is inclusive of the whole duplicate group
    assert ids(store.changes("s", "2025-05-15", T)) == both
    # since=T excludes the whole duplicate group (half-open)
    assert ids(store.changes("s", T)) == ids(d)
    # adjacent feeds cut at T compose with no loss or overlap
    f1 = ids(store.changes("s", "2000-01-01", T))
    f2 = ids(store.changes("s", T))
    assert sorted(f1 + f2) == ids(store.fetch("s"))


def test_delete_keys_crash_recovery(spark, store, events):
    """A delete_keys crash between its two per-day renames leaves the
    day only in '.{part}.del.old'; the sweep at the next delete_keys
    entry must restore it (round-3 hardening — the original
    rmtree-then-rename order lost the whole day)."""
    import os

    store.append("events", events)
    n = store.fetch("events").count()
    path = store.path("events")
    parts = sorted(e for e in os.listdir(path) if e.startswith("_date="))
    # simulate the crash window: day renamed aside, replacement missing
    os.rename(
        os.path.join(path, parts[0]), os.path.join(path, f".{parts[0]}.del.old")
    )
    assert store.fetch("events").count() < n
    # any delete_keys entry sweeps; delete nothing real
    assert store.delete_keys("events", "event_id", [-1]) == 0
    assert os.path.isdir(os.path.join(path, parts[0]))
    assert store.fetch("events").count() == n


def test_optimize_and_compact_preserve_evolved_schema(spark, store, events):
    """mergeSchema law (round-3 review class): a day partition holding
    files from both a narrow append and a widened append must keep the
    widened column — with its values — through optimize() (layout
    rewrite) AND compact() (semantic rewrite). Without mergeSchema the
    rewrite inferred one file's schema and silently deleted the only
    copies of the other's columns."""
    narrow = events.select("event_id", "user_id", "ts", "value")
    widened = narrow.withColumn(
        "extra_col", F.col("event_id") * 2
    ).withColumn("event_id", F.col("event_id") + 10_000_000)
    store.append("events", narrow)
    store.append("events", widened)
    n = narrow.count()

    store.optimize("events", target_file_mb=128, min_files=2)
    got = store.fetch("events")
    assert "extra_col" in got.columns
    assert got.filter("extra_col IS NOT NULL").count() == n
    assert (
        got.filter("extra_col IS NOT NULL AND extra_col != (event_id - 10000000) * 2")
        .count()
        == 0
    )

    store.compact("events", key_cols=["event_id"])
    got = store.fetch("events")
    assert "extra_col" in got.columns
    assert got.count() == 2 * n
    assert got.filter("extra_col IS NOT NULL").count() == n


def test_writer_lease_rejects_second_process(spark, store, events):
    """Round-5 verdict item: overwrite()/compact() (and the other
    maintenance rewrites) are single-writer PER SERIES, enforced by an
    exclusive-create lease file — not just documented. A second OS
    process holding the lease makes maintenance fail fast with
    WriterLeaseHeld (rejected, never corrupting); append() stays
    lease-free (blind appends are concurrent-safe by design)."""
    import json
    import os
    import subprocess
    import sys

    from pandas_tsdb_spark.store import WriterLeaseHeld

    store.append("events", events.limit(200))
    # a genuinely separate process acquires the lease via the same
    # O_CREAT|O_EXCL protocol and holds it until told to release
    helper = r"""
import json, os, sys, time
lock = sys.argv[1]
fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
with os.fdopen(fd, "w") as f:
    json.dump({"pid": os.getpid(), "op": "compact"}, f)
print("HELD", flush=True)
sys.stdin.readline()  # wait for release signal
os.unlink(lock)
print("RELEASED", flush=True)
"""
    lock = os.path.join(store.root, ".events.writer.lock")
    proc = subprocess.Popen(
        [sys.executable, "-c", helper, lock],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE, text=True,
    )
    try:
        assert proc.stdout.readline().strip() == "HELD"
        with pytest.raises(WriterLeaseHeld):
            store.compact("events", key_cols=["event_id"])
        with pytest.raises(WriterLeaseHeld):
            store.overwrite("events", events.limit(10))
        # the holder's identity is surfaced in the error
        held = json.load(open(lock))
        assert held["pid"] == proc.pid
        # appends are NOT blocked by a maintenance lease
        store.append("events", events.limit(5))
        before = store.fetch("events").count()
        assert before == 205
        proc.stdin.write("go\n")
        proc.stdin.flush()
        assert proc.stdout.readline().strip() == "RELEASED"
    finally:
        if proc.poll() is None:
            proc.kill()
        proc.wait()
    # lease released: maintenance proceeds and releases its own lease
    store.compact("events", key_cols=["event_id"])
    assert not os.path.exists(lock)
    assert store.fetch("events", latest_by=["event_id"]).count() > 0


def test_writer_lease_breaks_stale_holder(spark, store, events):
    """A lease whose holder crashed (mtime beyond the staleness bound)
    must not brick the series: the next maintenance op breaks it and
    proceeds."""
    import json
    import os
    import time

    store.append("events", events.limit(50))
    lock = os.path.join(store.root, ".events.writer.lock")
    with open(lock, "w") as f:
        json.dump({"pid": 999999, "op": "compact"}, f)
    old = time.time() - 3600
    os.utime(lock, (old, old))
    store.compact("events", key_cols=["event_id"])  # breaks + proceeds
    assert not os.path.exists(lock)


def test_overwrite_narrows_schema_sidecar_under_dynamic_mode(
    spark, store, events
):
    """Round-5 ADVICE fix: under partitionOverwriteMode=dynamic the old
    _schema.json survives the data overwrite; the sidecar must be the
    stamped schema VERBATIM (no union), or an intentional narrowing
    overwrite resurrects dropped columns in the emptied-store fetch."""
    import json
    import os

    from pyspark.sql import types as T

    store.append("events", events.limit(100).withColumn("extra", F.lit(1)))
    old_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        store.overwrite("events", events.limit(100))  # drops 'extra'
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", old_mode)
    with open(os.path.join(store.path("events"), "_schema.json")) as f:
        sidecar = T.StructType.fromJson(json.load(f))
    assert "extra" not in {fld.name for fld in sidecar.fields}
    # append still unions (concurrent-appender protection unchanged)
    store.append("events", events.limit(10).withColumn("later", F.lit(2)))
    store.append("events", events.limit(10))
    with open(os.path.join(store.path("events"), "_schema.json")) as f:
        sidecar = T.StructType.fromJson(json.load(f))
    assert "later" in {fld.name for fld in sidecar.fields}


def test_lease_heartbeat_keeps_long_op_alive(monkeypatch, tmp_path):
    """Round-6 ADVICE fix: a live holder whose op outlasts the staleness
    bound must NOT be broken as stale — the heartbeat thread started in
    __enter__ refreshes the lease mtime, so a second acquirer rejects
    instead of stealing the lease mid-rewrite."""
    import os
    import time

    from pandas_tsdb_spark import store as store_mod

    monkeypatch.setattr(store_mod, "_LEASE_STALE_SECS", 1.0)
    series = str(tmp_path / "s")
    lease = store_mod._WriterLease(series, "compact")
    with lease:
        time.sleep(2.5)  # well past the (shrunk) staleness bound
        with pytest.raises(store_mod.WriterLeaseHeld):
            with store_mod._WriterLease(series, "optimize"):
                pass  # pragma: no cover — must not acquire
        assert os.path.exists(lease.path)
    assert not os.path.exists(lease.path)  # released on exit


def test_stale_break_spares_freshly_replaced_lease(tmp_path):
    """Round-6 ADVICE fix (TOCTOU): breaker B observed a stale lease,
    but breaker A broke it and created a FRESH lease before B's rename
    ran. B's rename moves A's live lease — the inode check must detect
    the swap, restore A's lease, and back off without unlinking it."""
    import json
    import os
    import time

    from pandas_tsdb_spark import store as store_mod

    series = str(tmp_path / "s")
    lease_b = store_mod._WriterLease(series, "compact")
    # the stale lease B observes
    with open(lease_b.path, "w") as f:
        json.dump({"pid": 999999, "op": "compact"}, f)
    old = time.time() - 10 * store_mod._LEASE_STALE_SECS
    os.utime(lease_b.path, (old, old))
    observed = os.stat(lease_b.path)
    # interleave: A breaks the stale lease and creates a fresh one
    os.unlink(lease_b.path)
    with open(lease_b.path, "w") as f:
        json.dump({"pid": os.getpid(), "op": "optimize"}, f)
    fresh_ino = os.stat(lease_b.path).st_ino
    # B resumes with its STALE observation: must not remove A's lease
    lease_b._break_observed(observed)
    assert os.path.exists(lease_b.path)
    assert os.stat(lease_b.path).st_ino == fresh_ino
    # and no tombstone litter beside the series dir
    litter = [p for p in os.listdir(tmp_path) if ".tomb." in p]
    assert litter == []


def test_stale_break_same_inode_proceeds(tmp_path):
    """The non-racy stale path still breaks: same inode as observed →
    tombstone removed, path free for the exclusive create."""
    import json
    import os
    import time

    from pandas_tsdb_spark import store as store_mod

    series = str(tmp_path / "s")
    lease = store_mod._WriterLease(series, "compact")
    with open(lease.path, "w") as f:
        json.dump({"pid": 999999, "op": "compact"}, f)
    old = time.time() - 10 * store_mod._LEASE_STALE_SECS
    os.utime(lease.path, (old, old))
    lease._break_observed(os.stat(lease.path))
    assert not os.path.exists(lease.path)
    with lease:  # acquire proceeds on the freed path
        assert os.path.exists(lease.path)


def test_optimize_journal_recovery_half_moved(spark, store, events):
    """Round-6: optimize's journaled swap — crash states at BOTH bad
    instants must recover with no row lost and none double-counted:
    (a) journal committed, nothing moved yet; (b) replacements moved
    in, snapshot inputs not yet deleted (transient-duplicate state)."""
    import json
    import os
    import shutil

    store.append("events", events)
    store.append("events", events)
    n_logical = store.fetch("events", latest_by=["event_id"]).count()
    n_physical = store.fetch("events").count()
    path = store.path("events")
    parts = sorted(e for e in os.listdir(path) if e.startswith("_date="))
    assert len(parts) >= 2

    def build_txn(entry):
        part_dir = os.path.join(path, entry)
        files = sorted(
            f for f in os.listdir(part_dir)
            if f.endswith(".parquet") and not f.startswith(".")
        )
        stage = os.path.join(path, f".{entry}.opt.testtxn.tmp")
        (
            spark.read.option("mergeSchema", "true")
            .parquet(*(os.path.join(part_dir, f) for f in files))
            .repartition(1)
            .write.parquet(stage)
        )
        staged = sorted(
            f for f in os.listdir(stage)
            if f.endswith(".parquet") and not f.startswith(".")
        )
        moves = [
            (os.path.join(stage, f), f"opt-testtxn-{i:05d}.parquet")
            for i, f in enumerate(staged)
        ]
        with open(os.path.join(path, f".{entry}.opt.journal"), "w") as f:
            json.dump(
                {"partition": entry, "stage": stage, "moves": moves,
                 "old": files},
                f,
            )
        return part_dir, moves

    # (a) journal committed, nothing moved — old files still authoritative
    build_txn(parts[0])
    # (b) moved in, old not deleted — reader would see duplicates
    part_dir_b, moves_b = build_txn(parts[1])
    for src, dst in moves_b:
        os.rename(src, os.path.join(part_dir_b, dst))

    store.optimize("events")  # recovery completes both transactions
    assert not any(".opt." in e for e in os.listdir(path))
    assert store.fetch("events").count() == n_physical
    assert store.fetch("events", latest_by=["event_id"]).count() == n_logical


def test_reader_never_sees_gap_during_maintenance(spark, store, events):
    """Round-6 verdict item: a reader mid-fetch during optimize/compact
    must never observe a half-swapped layout. optimize/compact move
    replacement files IN before deleting exactly their snapshot inputs,
    so at every instant each logical row exists in >=1 visible file —
    a fetch(latest_by=...) therefore always returns exactly the logical
    row count, while maintenance churns the layout underneath it.
    (A plan holding the OLD file listing may hit FileNotFound after
    input deletion — the documented re-fetch case — so the reader
    retries on that error only; any other wrong count fails.)"""
    import threading

    ev = events.limit(2000)
    store.append("events", ev)
    n_logical = store.fetch("events", latest_by=["event_id"]).count()
    stop = threading.Event()
    errors: list[str] = []

    def churn():
        try:
            for _ in range(4):
                store.append("events", ev)  # pile up duplicate versions
                store.optimize("events", min_files=2)
                store.compact("events", key_cols=["event_id"])
        except Exception as e:  # pragma: no cover
            errors.append(f"maintenance: {e!r}")
        finally:
            stop.set()

    t = threading.Thread(target=churn, daemon=True)
    t.start()
    reads = 0
    while not stop.is_set():
        try:
            got = store.fetch("events", latest_by=["event_id"]).count()
        except Exception as e:
            # Py4JJavaError's str() is just "An error occurred..." —
            # the real cause lives on java_exception
            msg = str(e) + str(getattr(e, "java_exception", ""))
            if (
                "FileNotFound" in msg
                or "does not exist" in msg
                or "FAILED_READ_FILE" in msg
                # stale-listing race surfacing at schema inference
                # instead of scan execution (possible on the plain-dir
                # path, where no schema sidecar pins the read): same
                # documented re-fetch class as FileNotFound
                or "UNABLE_TO_INFER_SCHEMA" in msg
                or "ManifestContention" in type(e).__name__
            ):
                continue  # stale plan / hot-commit window: documented, re-fetch
            errors.append(f"reader: {msg[:500]}")
            break
        if got != n_logical:
            errors.append(f"reader saw {got} logical rows, want {n_logical}")
            break
        reads += 1
    t.join()
    assert not errors, errors
    assert reads >= 5  # the race was actually exercised


def test_verify_reports_corrupt_files_and_fetch_fails_fast(
    spark, store, events
):
    """Round-6: integrity contract. verify() names zero-byte and
    truncated files exactly; fetch() FAILS on them rather than silently
    returning less data (ignoreCorruptFiles is never set)."""
    store.append("ev", events)
    clean = store.verify("ev").toPandas()
    assert len(clean) > 0 and clean["ok"].all()
    assert clean["n_rows"].sum() == events.count()

    # corrupt one data file two ways: truncate half, and a zero-byte
    root = store.path("ev")
    files = sorted(
        os.path.join(dp, f)
        for dp, _d, fs in os.walk(root)
        for f in fs
        if f.endswith(".parquet") and not f.startswith((".", "_"))
    )
    victim = files[0]
    size = os.path.getsize(victim)
    with open(victim, "r+b") as fh:
        fh.truncate(max(1, size // 2))
    zb = os.path.join(os.path.dirname(victim), "part-zz-injected.parquet")
    with open(zb, "wb"):
        pass

    rep = store.verify("ev").toPandas().set_index("file")
    assert rep.loc[victim, "ok"] == False  # noqa: E712
    assert rep.loc[zb, "ok"] == False  # noqa: E712
    assert rep["ok"].sum() == len(files) - 1  # every other file clean

    with pytest.raises(Exception):
        store.fetch("ev").count()  # fail-fast, never silent data loss


def test_stale_break_cannot_clobber_third_waiter(monkeypatch, tmp_path):
    """Round-7 ADVICE fix: breaker B moves what turns out to be a LIVE
    lease (A's, created after B's staleness check) to its tombstone;
    while the lock path is briefly empty, waiter C O_EXCL-creates its
    own lease. B's restore must be a NO-REPLACE primitive — the old
    clobbering rename would overwrite C's lease, leaving A and C both
    believing they hold the writer lease."""
    import json
    import time

    from pandas_tsdb_spark import store as store_mod

    series = str(tmp_path / "s")
    lease_b = store_mod._WriterLease(series, "compact")
    # the stale lease B observes
    with open(lease_b.path, "w") as f:
        json.dump({"pid": 1, "op": "stale"}, f)
    old = time.time() - 10 * store_mod._LEASE_STALE_SECS
    os.utime(lease_b.path, (old, old))
    observed = os.stat(lease_b.path)
    # A breaks the stale lease and creates a FRESH one before B resumes
    os.unlink(lease_b.path)
    with open(lease_b.path, "w") as f:
        json.dump({"pid": 2, "op": "A-fresh"}, f)

    real_rename = os.rename

    def racy_rename(src, dst):
        real_rename(src, dst)
        if ".tomb." in str(dst):
            # C slips an O_EXCL lease into the empty-path window
            fd = os.open(lease_b.path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            with os.fdopen(fd, "w") as fh:
                json.dump({"pid": 3, "op": "C-waiter"}, fh)

    monkeypatch.setattr(os, "rename", racy_rename)
    lease_b._break_observed(observed)
    monkeypatch.undo()
    # C's lease survived B's restore attempt — exactly one holder
    with open(lease_b.path) as f:
        assert json.load(f)["pid"] == 3
    # A's displaced lease is left as the tombstone (B backed off)
    tombs = [p for p in os.listdir(tmp_path) if ".tomb." in p]
    assert len(tombs) == 1
    with open(os.path.join(tmp_path, tombs[0])) as f:
        assert json.load(f)["pid"] == 2


def test_stale_break_restore_succeeds_when_path_free(monkeypatch, tmp_path):
    """Complement: when NO waiter races into the window, the no-replace
    restore must put A's live lease back and remove the tombstone."""
    import json
    import time

    from pandas_tsdb_spark import store as store_mod

    series = str(tmp_path / "s")
    lease_b = store_mod._WriterLease(series, "compact")
    with open(lease_b.path, "w") as f:
        json.dump({"pid": 1, "op": "stale"}, f)
    old = time.time() - 10 * store_mod._LEASE_STALE_SECS
    os.utime(lease_b.path, (old, old))
    observed = os.stat(lease_b.path)
    os.unlink(lease_b.path)
    with open(lease_b.path, "w") as f:
        json.dump({"pid": 2, "op": "A-fresh"}, f)
    fresh_ino = os.stat(lease_b.path).st_ino
    lease_b._break_observed(observed)
    assert os.path.exists(lease_b.path)
    assert os.stat(lease_b.path).st_ino == fresh_ino
    assert [p for p in os.listdir(tmp_path) if ".tomb." in p] == []


def test_optimize_sweeps_orphan_txn_stage_dirs(spark, store, events):
    """Round-7 ADVICE fix: a crash between the journal unlink and the
    stage rmtree (or between write.parquet and the journal commit)
    orphans a txn-infixed '.{part}.opt.{txn}.tmp' stage dir that no
    journal references. The leftover sweep must remove it — the old
    pattern only matched the legacy exact '.opt.tmp' suffix, so these
    accumulated forever."""
    store.append("events", events)
    store.append("events", events)
    path = store.path("events")
    parts = sorted(e for e in os.listdir(path) if e.startswith("_date="))
    assert parts
    orphan = os.path.join(path, f".{parts[0]}.opt.deadbeef01.tmp")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "part-00000-junk.parquet"), "w") as f:
        f.write("junk")
    n_before = store.fetch("events").count()
    store.optimize("events", min_files=2)
    assert not os.path.exists(orphan)
    assert store.fetch("events").count() == n_before


def test_fetch_range_prunes_partitions_with_manifest(spark, store, events):
    """The manifest read path (post-compact) must keep fetch's
    partition pruning: the explicit file list is pruned DRIVER-SIDE to
    the touched day dirs before Spark ever sees it — inputFiles()
    contains only in-range partitions, matching the plain-dir path's
    PartitionFilters behavior."""
    store.append("events", events)
    store.compact("events", key_cols=["event_id"])
    assert store._read_manifest("events") is not None  # manifest path active
    sliced = store.fetch("events", "2024-01-05", "2024-01-10 23:59:59")
    want = events.filter(
        F.col("ts").between("2024-01-05", "2024-01-10 23:59:59")
    ).count()
    assert sliced.count() == want
    days = {
        f.split("_date=")[1].split("/")[0]
        for f in sliced._jdf.inputFiles()
        if "_date=" in f
    }
    assert days, "explicit-list read lost the partition dirs"
    assert all("2024-01-05" <= d <= "2024-01-10" for d in days), days


def test_delete_keys_exact_counts_at_kill_points(monkeypatch, spark, store, events):
    """delete_keys follows the same seal-commit protocol as compact
    (round-8): kill it at the pre-commit boundary (first seal move) and
    the post-commit boundary (first input delete) and assert EXACT
    reader counts on the crashed state — the old directory-swap had a
    transient whole-day GAP between its two renames."""
    import os as os_mod

    class Kill(Exception):
        pass

    # two independent series: the second kill must land in the DELETE
    # phase of a fresh run, not in the entry sweep healing the first
    # kill's debris
    store.append("ev_pre", events)
    store.append("ev_post", events)
    n_before = store.fetch("ev_pre").count()
    victims = [r[0] for r in events.select("user_id").distinct().limit(2).collect()]
    n_victim = events.filter(F.col("user_id").isin(victims)).count()
    parent = store.root

    def inject(attr, n):
        real = getattr(os_mod, attr)
        state = {"count": 0}

        def wrapper(*args, **kwargs):
            p = str(args[0]) if args else ""
            if p.startswith(parent):
                state["count"] += 1
                if state["count"] == n:
                    raise Kill(f"{attr} #{n}")
            return real(*args, **kwargs)

        monkeypatch.setattr(os_mod, attr, wrapper)
        return state

    import pytest as _pytest

    # pre-commit kill: first seal move — store must read as UNCHANGED
    inject("rename", 1)
    with _pytest.raises(Kill):
        store.delete_keys("ev_pre", "user_id", victims)
    monkeypatch.undo()
    assert store.fetch("ev_pre").count() == n_before
    assert (
        store.fetch("ev_pre").filter(F.col("user_id").isin(victims)).count()
        == n_victim
    )
    # restart completes and heals
    assert store.delete_keys("ev_pre", "user_id", victims) == n_victim
    assert store.fetch("ev_pre").count() == n_before - n_victim

    # post-commit kill: first input delete — store must read as DELETED
    inject("remove", 1)
    with _pytest.raises(Kill):
        store.delete_keys("ev_post", "user_id", victims)
    monkeypatch.undo()
    assert store.fetch("ev_post").count() == n_before - n_victim
    assert (
        store.fetch("ev_post").filter(F.col("user_id").isin(victims)).count() == 0
    )
    # restart is an idempotent no-op (keys already gone) that heals the
    # tombstones via the entry sweep
    assert store.delete_keys("ev_post", "user_id", victims) == 0
    assert store.fetch("ev_post").count() == n_before - n_victim
    man = store._read_manifest("ev_post")
    assert not (man or {}).get("retired"), man


def test_fetch_range_tolerates_null_date_partition(spark, store, events):
    """ADVICE r8 (medium): a null event ts at append lands in
    _date=__HIVE_DEFAULT_PARTITION__; the driver-side partition
    pruning in fetch() must skip-or-pass such dirs to the row filter
    (as Catalyst does on the plain-dir path), not raise ValueError on
    date.fromisoformat and brick every ranged read."""
    import pandas as pd

    store.append("events", events)
    null_row = events.limit(1).withColumn("ts", F.lit(None).cast("timestamp"))
    store.append("events", null_row)
    path = store.path("events")
    assert any(
        e.startswith("_date=__HIVE") for e in os.listdir(path)
    ), "fixture did not create the Hive default partition"

    lo = events.agg(F.min("ts")).collect()[0][0]
    hi = events.agg(F.max("ts")).collect()[0][0]
    # ranged fetch must not raise, and range semantics (null ts fails
    # ts >= start) must exclude the null row — identical to Catalyst
    got = store.fetch("events", start=pd.Timestamp(lo), end=pd.Timestamp(hi))
    assert got.count() == events.count()

    # same law on the manifest path (maintenance creates the manifest)
    store.compact("events", key_cols=["event_id"])
    got2 = store.fetch("events", start=pd.Timestamp(lo), end=pd.Timestamp(hi))
    assert got2.count() == events.count()


def test_delete_keys_stage_leftover_swept(spark, store, events):
    """ADVICE r8 (low): a delete_keys crash before its stage rmtree
    used to leave '.{series}.delete.{txn}.tmp' forever (the deep sweep
    matched only '.compact.'/'.append.' stages). Any later maintenance
    entry must clear it."""
    store.append("events", events)
    parent, base = os.path.split(store.path("events"))
    stranded = os.path.join(parent, f".{base}.delete.deadbeef.tmp")
    os.makedirs(os.path.join(stranded, "_date=2024-01-01"))
    with open(
        os.path.join(stranded, "_date=2024-01-01", "part-0.parquet"), "wb"
    ) as f:
        f.write(b"junk")
    n = store.fetch("events").count()
    assert store.delete_keys("events", "event_id", [-1]) == 0
    assert not os.path.isdir(stranded), "stage dir leaked"
    assert store.fetch("events").count() == n


def test_manifest_token_defeats_gen_aba(spark, store, events):
    """ADVICE r8 (low): overwrite() deletes an emptied manifest and
    _ensure_manifest restarts gen at 1, so a delete/recreate cycle can
    reproduce an old gen. The per-write random token cannot — the
    stable-pair check in _read_visible requires both."""
    store.append("events", events)
    store.compact("events", key_cols=["event_id"])
    man1 = store._read_manifest("events")
    assert man1 is not None and man1.get("token"), "manifest lacks token"

    # delete/recreate to the SAME gen: token must differ
    os.remove(store._manifest_file("events"))
    cur = {"gen": 0, "sealed": {}, "retired": {}}
    for _ in range(int(man1["gen"])):
        store._write_manifest("events", cur)
        cur = store._read_manifest("events")
    man2 = store._read_manifest("events")
    assert man2["gen"] == man1["gen"]
    assert man2["token"] != man1["token"]
