"""Sharded series manifest (round-9 verdict #4 — the metadata-scale
seam).

Above ``manifest_shard_after`` partitions the manifest splits
Iceberg-style: per-partition content-addressed shard files carry the
file lists, the root holds only {partition: shard-file} pointers, and
the commit point stays the single atomic root replace. These tests
force the sharded path (``manifest_shard_after=0``) through the full
maintenance surface, prove pruned fetches never open out-of-range
shards, kill the sharded commit at its new boundaries, verify shard GC,
and run the sustained-contention law (continuous maintenance loop vs
concurrent readers: exact counts, zero ManifestContention escapes,
bounded p99).
"""

from __future__ import annotations

import json
import os
import tempfile
import time

import pytest

from pyspark.sql import functions as F

from pandas_tsdb_spark.catalog import Tables
from pandas_tsdb_spark.store import ManifestContention, TsStore

SMALL = "/root/testdata/sf0.001"


class KillPoint(Exception):
    pass


@pytest.fixture()
def store(spark):
    # shard_after=0: every manifest write shards, however small
    return TsStore(
        spark, tempfile.mkdtemp(prefix="tsdb_shard_"), manifest_shard_after=0
    )


@pytest.fixture(scope="module")
def events(spark):
    return Tables(spark, SMALL).events


def _root(store, name):
    with open(store._manifest_file(name)) as f:
        return json.load(f)


def test_sharded_maintenance_surface_matches_inline(spark, store, events):
    """The full maintenance surface (append/compact/optimize/
    delete_keys/fetch latest_by/as_of) under forced sharding returns
    byte-identical logical content to an inline-manifest twin store."""
    inline = TsStore(
        spark, tempfile.mkdtemp(prefix="tsdb_inline_"), manifest_shard_after=10**9
    )
    ev = events.limit(4000)
    for s in (store, inline):
        s.append("events", ev)
        s.append("events", ev)  # duplicate versions for compact to resolve
        s.compact("events", key_cols=["event_id"])
        s.optimize("events", min_files=1)

    root = _root(store, "events")
    assert "shards" in root and root["shards"], "sharded path not exercised"
    assert "sealed" not in root, "sharded root must not inline file lists"
    assert os.path.isdir(store._shard_dir("events"))
    inline_root = _root(inline, "events")
    assert "shards" not in inline_root and "sealed" in inline_root

    a = store.fetch("events").orderBy("event_id", "ts").toPandas()
    b = inline.fetch("events").orderBy("event_id", "ts").toPandas()
    assert a.equals(b)

    # delete_keys through the sharded commit
    victims = [r[0] for r in ev.select("user_id").distinct().limit(2).collect()]
    na = store.delete_keys("events", "user_id", victims)
    nb = inline.delete_keys("events", "user_id", victims)
    assert na == nb > 0
    assert store.fetch("events").count() == inline.fetch("events").count()

    # ranged fetch (pruned shard resolution) agrees with the inline twin
    lo = ev.agg(F.min("ts")).collect()[0][0]
    import pandas as pd

    mid = pd.Timestamp(lo) + pd.Timedelta(days=1)
    assert (
        store.fetch("events", start=pd.Timestamp(lo), end=mid).count()
        == inline.fetch("events", start=pd.Timestamp(lo), end=mid).count()
    )


def test_pruned_fetch_never_opens_out_of_range_shards(spark, store, events):
    """Physical proof of the pruned-resolution claim: corrupt an
    out-of-range shard file on disk — a ranged fetch that never opens
    it succeeds; a full fetch (which must open it) fails fast."""
    import pandas as pd

    ev = events.limit(4000)
    store.append("events", ev)
    store.compact("events", key_cols=["event_id"])
    root = _root(store, "events")
    entries = sorted(root["shards"])
    assert len(entries) >= 2, "fixture must span multiple days"
    first_day = entries[0].split("=", 1)[1]

    # corrupt the LAST partition's shard
    last_fname = root["shards"][entries[-1]]
    live = {v for k, v in root["shards"].items() if k != entries[-1]}
    assert last_fname not in live, "test needs a shard unique to the last day"
    with open(os.path.join(store._shard_dir("events"), last_fname), "w") as f:
        f.write("NOT JSON")

    day = pd.Timestamp(first_day)
    got = store.fetch(
        "events", start=day, end=day + pd.Timedelta(hours=23, minutes=59)
    )
    assert got.count() > 0  # never touched the corrupt shard

    with pytest.raises(RuntimeError, match="corrupt manifest shard"):
        store.fetch("events").count()


def _inject(monkeypatch, module, attr, prefix, n):
    real = getattr(module, attr)
    state = {"count": 0}

    def wrapper(*args, **kwargs):
        p = str(args[0]) if args else ""
        if p.startswith(prefix):
            state["count"] += 1
            if state["count"] == n:
                raise KillPoint(f"{attr} #{n} on {p}")
        return real(*args, **kwargs)

    monkeypatch.setattr(module, attr, wrapper)
    return state


@pytest.mark.parametrize("boundary", ["first_shard", "root_commit", "post_commit"])
def test_sharded_compact_kill_boundaries(
    spark, store, events, monkeypatch, boundary
):
    """Kill the SHARDED compact commit at its new boundaries. The law is
    the same exactness contract as the inline kill matrix: content
    equals the pre-commit store for any kill before the root replace,
    the post-commit store after it, and a restarted compact heals all
    debris (no stray shards, no tombstones)."""
    ev = events.limit(3000)
    store.append("events", ev)
    store.append("events", ev)
    n_logical = store.fetch("events", latest_by=["event_id"]).count()
    n_physical = store.fetch("events").count()
    path = store.path("events")

    # compact's os.replace sequence on a sharded store: ensure-manifest
    # flip (#1, inline empty root), then the commit = K shard replaces
    # (#2..#K+1) + root replace (#K+2); post-commit has no replaces.
    k_parts = len(store._part_entries("events"))
    target = {
        "first_shard": ("replace", 2),
        "root_commit": ("replace", k_parts + 2),
        "post_commit": ("remove", 1),
    }[boundary]
    mod = __import__("os")
    _inject(monkeypatch, mod, target[0], path, target[1])

    with pytest.raises(KillPoint):
        store.compact("events", key_cols=["event_id"])
    monkeypatch.undo()

    if boundary == "post_commit":
        # committed: keep-latest content visible despite pending deletes
        assert store.fetch("events").count() == n_logical
    else:
        # uncommitted: the pre-compact store, exactly (staged sealed
        # files are manifest-invisible)
        assert store.fetch("events").count() == n_physical
    assert (
        store.fetch("events", latest_by=["event_id"]).count() == n_logical
    )

    # restart heals: content exact, zero tombstones, shard GC clean
    store.compact("events", key_cols=["event_id"])
    assert store.fetch("events").count() == n_logical
    man = store._read_manifest("events")
    assert not man.get("retired"), man
    root = _root(store, "events")
    on_disk = set(os.listdir(store._shard_dir("events")))
    assert set(root["shards"].values()) == on_disk


def test_shard_gc_keeps_exactly_live_set(spark, store, events):
    """Superseded generations' shards are GC'd by the next maintenance
    entry; the shard dir holds exactly the current root's references."""
    ev = events.limit(2000)
    store.append("events", ev)
    store.compact("events", key_cols=["event_id"])
    first = set(_root(store, "events")["shards"].values())
    store.append("events", ev)
    store.compact("events", key_cols=["event_id"])  # supersedes gen 1
    root = _root(store, "events")
    live = set(root["shards"].values())
    on_disk = set(os.listdir(store._shard_dir("events")))
    assert live == on_disk
    assert on_disk.isdisjoint(first - live), "superseded shards leaked"


def test_overwrite_emptied_manifest_drops_shard_dir(spark, store, events):
    ev = events.limit(1000)
    store.append("events", ev)
    store.compact("events", key_cols=["event_id"])
    assert os.path.isdir(store._shard_dir("events"))
    store.overwrite("events", ev)
    assert not os.path.exists(store._manifest_file("events"))
    assert not os.path.exists(store._shard_dir("events"))
    assert store.fetch("events").count() == ev.count()


@pytest.mark.sweep
def test_sustained_contention_reader_p99_bounded(spark, store, events):
    """Round-9 verdict #4b: a continuous optimize/compact loop vs
    concurrent readers at a realistic commit rate. Law: every read
    returns the exact logical count, ZERO ManifestContention escapes
    (the 12-attempt snapshot loop must absorb the commit bursts), and
    reader p99 stays bounded (a stuck retry loop or livelock would blow
    it; the bound is generous for container ambient noise)."""
    import statistics
    import threading

    ev = events.limit(2000)
    store.append("events", ev)
    n_logical = store.fetch("events", latest_by=["event_id"]).count()
    stop = threading.Event()
    errors: list[str] = []

    def churn():
        try:
            for _ in range(6):
                store.append("events", ev)
                store.optimize("events", min_files=2)
                store.compact("events", key_cols=["event_id"])
        except Exception as e:  # pragma: no cover
            errors.append(f"maintenance: {e!r}")
        finally:
            stop.set()

    t = threading.Thread(target=churn, daemon=True)
    t.start()
    lat: list[float] = []
    escapes = 0
    while not stop.is_set():
        t0 = time.perf_counter()
        try:
            got = store.fetch("events", latest_by=["event_id"]).count()
        except ManifestContention:
            escapes += 1
            continue
        except Exception as e:
            msg = str(e) + str(getattr(e, "java_exception", ""))
            if (
                "FileNotFound" in msg
                or "does not exist" in msg
                or "FAILED_READ_FILE" in msg
            ):
                continue  # stale-plan window: documented, re-fetch
            errors.append(f"reader: {msg[:500]}")
            break
        lat.append(time.perf_counter() - t0)
        if got != n_logical:
            errors.append(f"saw {got} logical rows, want {n_logical}")
            break
    t.join()
    assert not errors, errors
    assert escapes == 0, f"{escapes} ManifestContention escapes"
    assert len(lat) >= 10, "contention not exercised"
    lat.sort()
    p50 = statistics.median(lat)
    p99 = lat[int(len(lat) * 0.99) - 1] if len(lat) >= 100 else lat[-1]
    assert p99 <= max(10.0, 25 * p50), (p50, p99, len(lat))


def test_commit_write_cost_proportional_to_touched(spark, store, events):
    """The metadata-scale claim itself: a delete_keys touching ONE day
    of a sharded store writes exactly the touched partitions' shard
    files (content-addressing reuses every untouched shard) plus the
    root pointer — O(touched), not O(store)."""
    from pyspark.sql import functions as F

    ev = events.limit(4000)
    store.append("events", ev)
    store.compact("events", key_cols=["event_id"])
    root1 = _root(store, "events")
    assert len(root1["shards"]) >= 3, "need a multi-day store"
    before = set(os.listdir(store._shard_dir("events")))

    # pick the victim spanning the FEWEST days (must leave untouched
    # partitions for the claim to have teeth)
    days_of = ev.select(F.date_format("ts", "yyyy-MM-dd").alias("d"), "user_id")
    per_user = days_of.groupBy("user_id").agg(
        F.countDistinct("d").alias("nd"), F.collect_set("d").alias("days")
    )
    victim_row = per_user.orderBy("nd", "user_id").limit(1).collect()[0]
    victim, touched = victim_row.user_id, {
        f"_date={d}" for d in victim_row.days
    }
    assert len(touched) < len(root1["shards"]), "victim touches every day"

    assert store.delete_keys("events", "user_id", [victim]) > 0
    root2 = _root(store, "events")
    after = set(os.listdir(store._shard_dir("events")))
    # every untouched partition kept its exact shard file (pointer
    # unchanged => content-addressing skipped the write)
    for entry, fname in root1["shards"].items():
        if entry not in touched:
            assert root2["shards"].get(entry) == fname, entry
    # new files on disk <= touched partitions' new shards (the GC at
    # the next maintenance entry clears the superseded ones)
    new_files = after - before
    assert len(new_files) <= len(touched), (new_files, touched)


@pytest.mark.parametrize("boundary", ["first_shard", "root_commit", "post_commit"])
def test_sharded_delete_keys_kill_boundaries(
    spark, store, events, monkeypatch, boundary
):
    """Kill the SHARDED delete_keys commit at its boundaries. Law:
    before the root replace a fetch sees the full pre-delete store;
    after it the keys are gone, exactly; a restarted delete_keys is an
    idempotent no-op that heals tombstones and stage debris."""
    ev = events.limit(3000)
    store.append("events", ev)
    n_before = store.fetch("events").count()
    victims = [r[0] for r in ev.select("user_id").distinct().limit(2).collect()]
    n_victim = ev.filter(F.col("user_id").isin(victims)).count()
    touched = (
        ev.filter(F.col("user_id").isin(victims))
        .select(F.date_format("ts", "yyyy-MM-dd"))
        .distinct()
        .count()
    )
    path = store.path("events")

    # delete_keys' os.replace sequence on a fresh sharded store:
    # ensure-manifest flip (#1, inline empty root), then the commit =
    # T touched-day shard replaces (#2..#T+1) + root replace (#T+2).
    target = {
        "first_shard": ("replace", 2),
        "root_commit": ("replace", touched + 2),
        "post_commit": ("remove", 1),
    }[boundary]
    mod = __import__("os")
    _inject(monkeypatch, mod, target[0], path, target[1])

    with pytest.raises(KillPoint):
        store.delete_keys("events", "user_id", victims)
    monkeypatch.undo()

    if boundary == "post_commit":
        assert store.fetch("events").count() == n_before - n_victim
        assert (
            store.fetch("events")
            .filter(F.col("user_id").isin(victims))
            .count()
            == 0
        )
        # restart: idempotent no-op that heals tombstones
        assert store.delete_keys("events", "user_id", victims) == 0
    else:
        # uncommitted: the pre-delete store, exactly
        assert store.fetch("events").count() == n_before
        # restart completes the takedown
        assert store.delete_keys("events", "user_id", victims) == n_victim
    assert store.fetch("events").count() == n_before - n_victim
    man = store._read_manifest("events")
    assert not (man or {}).get("retired"), man
    # no stage debris, shard dir exactly the live set
    parent, base = os.path.split(path)
    assert not [
        e for e in os.listdir(parent) if e.startswith(f".{base}.delete.")
    ]
    root = _root(store, "events")
    assert set(root["shards"].values()) == set(
        os.listdir(store._shard_dir("events"))
    )
