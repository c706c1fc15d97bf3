"""Round-7 verdict item 5: crash-recovery FAULT INJECTION for TsStore
maintenance.

The lease heartbeats and breaks atomically (r6), and the reader-race
law is green — the untested path was a maintenance op that DIES
mid-phase. These tests kill optimize()/compact() at every
filesystem-mutation boundary of their transaction protocols (a
path-filtered wrapper around the os/shutil primitive raises after N
matching calls — only calls touching the store tree count, so Spark's
own IO is never affected), then assert the healing contract:

  1. a RESTARTED maintenance op completes (journal recovery + leftover
     sweeps heal staged/tombstone/journal debris),
  2. the store's logical content is exactly what it was before the
     crash (fetch count for optimize, which is layout-only;
     fetch(latest_by) for compact, whose semantics are keep-latest),
  3. no maintenance litter remains (no stage dirs, no journals, no
     tombstones) — a store healed N times does not leak disk.

Kill points per op (matching the round-8 MANIFEST protocol's phase
order in store.py — ensure-manifest flip, seal moves, manifest
commit, input deletes, stage rmtree, tombstone-prune flip):

optimize: K0 ensure-manifest flip killed (os.replace #1)
          K1 first seal move / K2 mid-seal (os.rename #1/#17)
          K3 manifest commit killed (os.replace #2 — uncommitted)
          K4 first input delete / K5 mid-delete (os.remove #1/#41)
          K6 stage rmtree (shutil.rmtree #1)
          K7 tombstone-prune flip (os.replace #3)
compact:  C0..C7 — the same eight boundaries of the same protocol
lease:    L1 breaker dies between tombstone rename and O_EXCL create

The law at every kill point is EXACTNESS, not merely no-loss: a plain
fetch().count() equals the pre-commit store before the manifest flip
and the post-commit store after it — the transient duplicate the
pre-round-8 protocol documented is structurally impossible now.
"""

from __future__ import annotations

import os
import tempfile

import pytest

from pyspark.sql import functions as F

from pandas_tsdb_spark.catalog import Tables
from pandas_tsdb_spark.store import TsStore

SMALL = "/root/testdata/sf0.001"


class KillPoint(Exception):
    pass


@pytest.fixture()
def store(spark):
    return TsStore(spark, tempfile.mkdtemp(prefix="tsdb_crash_"))


@pytest.fixture(scope="module")
def events(spark):
    return Tables(spark, SMALL).events


def _inject(monkeypatch, module, attr, store_root, n):
    """Replace ``module.attr`` with a wrapper that raises KillPoint on
    the n-th call whose first path argument lies under store_root."""
    real = getattr(module, attr)
    state = {"count": 0}

    def wrapper(*args, **kwargs):
        p = str(args[0]) if args else ""
        if p.startswith(store_root):
            state["count"] += 1
            if state["count"] == n:
                raise KillPoint(f"{attr} call #{n} on {p}")
        return real(*args, **kwargs)

    monkeypatch.setattr(module, attr, wrapper)
    return state


def _no_litter(series_path: str) -> list[str]:
    parent = os.path.dirname(series_path)
    bad = []
    for root in (series_path, parent):
        for e in os.listdir(root):
            if e.startswith(".") and (
                ".opt." in e or ".compact." in e or ".tomb." in e
                or e.endswith(".journal") or e.endswith(".journal.tmp")
            ):
                bad.append(os.path.join(root, e))
    return bad


def _fragment(store, events, copies=3):
    """Blind-append the fixture several times so every day partition
    holds multiple small files — the optimize/compact precondition."""
    for _ in range(copies):
        store.append("events", events)


def _manifest_consistent(store, name: str) -> list[str]:
    """After a completed maintenance op the manifest state must be
    clean: every sealed- file on disk is listed (no unlisted orphans)
    and no retired tombstones remain (their files were deleted and the
    tombstones pruned)."""
    man = store._read_manifest(name)
    path = store.path(name)
    bad = []
    for entry in os.listdir(path):
        part_dir = os.path.join(path, entry)
        if not entry.startswith("_date=") or not os.path.isdir(part_dir):
            continue
        listed = set((man or {}).get("sealed", {}).get(entry, ()))
        for f in os.listdir(part_dir):
            if f.startswith("sealed-") and f not in listed:
                bad.append(f"unlisted sealed orphan {entry}/{f}")
    if man and man.get("retired"):
        bad.append(f"retired tombstones remain: {man['retired']}")
    return bad


# Kill points follow the round-8 manifest protocol's python-level
# mutation order in optimize(): ensure-manifest flip (os.replace #1) ->
# seal moves (os.rename, one per partition) -> manifest COMMIT
# (os.replace #2) -> input deletes (os.remove) -> stage rmtrees
# (shutil.rmtree) -> tombstone-prune flip (os.replace #3). The
# committed/uncommitted flag states which side of the commit the kill
# lands on — the exactness law is checked against it (optimize is
# layout-only, so the visible physical count is the SAME on both
# sides; the flag still documents the phase).
OPT_KILLS = [
    ("K0_ensure_flip", "os", "replace", 1, False),
    ("K1_first_seal_move", "os", "rename", 1, False),
    ("K2_mid_seal_move", "os", "rename", 17, False),
    ("K3_manifest_commit", "os", "replace", 2, False),
    ("K4_first_delete", "os", "remove", 1, True),
    ("K5_mid_delete", "os", "remove", 41, True),
    ("K6_stage_rmtree", "shutil", "rmtree", 1, True),
    ("K7_prune_flip", "os", "replace", 3, True),
]


@pytest.mark.parametrize("kill", OPT_KILLS, ids=[k[0] for k in OPT_KILLS])
def test_optimize_killed_then_restarted_heals(
    monkeypatch, spark, store, events, kill
):
    import shutil as shutil_mod

    _, mod_name, attr, n, _committed = kill
    _fragment(store, events)
    n_physical = store.fetch("events").count()
    logical = events.select("event_id").distinct().count()
    path = store.path("events")

    # store.py resolves the primitives as module attributes at call
    # time, so patching the global os/shutil modules intercepts them
    mod = os if mod_name == "os" else shutil_mod
    state = _inject(monkeypatch, mod, attr, path, n)
    with pytest.raises(KillPoint):
        store.optimize("events", min_files=2)
    assert state["count"] == n  # the kill actually fired mid-phase
    monkeypatch.undo()

    # THE round-8 exactness law: a plain fetch on the crashed state
    # sees EXACTLY the physical rows — no transient duplicate (the
    # pre-manifest protocol's documented anomaly), no gap — because
    # uncommitted sealed outputs are invisible and committed inputs
    # are tombstoned whether or not their deletes ran
    assert store.fetch("events").count() == n_physical
    assert store.fetch("events", latest_by=["event_id"]).count() == logical

    # restart heals and completes
    store.optimize("events", min_files=2)
    assert store.fetch("events").count() == n_physical
    assert _no_litter(path) == []
    assert _manifest_consistent(store, "events") == []
    # after healing, every partition is compacted to a single file
    for entry in os.listdir(path):
        pd_ = os.path.join(path, entry)
        if entry.startswith("_date=") and os.path.isdir(pd_):
            files = [
                f for f in os.listdir(pd_)
                if f.endswith(".parquet") and not f.startswith(".")
            ]
            assert len(files) == 1, (entry, files)


# compact(): seal moves (os.rename, after makedirs) -> manifest COMMIT
# (os.replace #1) -> input deletes (os.remove) -> stage rmtree ->
# tombstone-prune flip (os.replace #2). committed=False kills must read
# as the PRE-compact store (physical count), committed=True as the
# POST-compact store (logical count) — exactly one of the two, at
# every instant.
COMPACT_KILLS = [
    ("C0_ensure_flip", "os", "replace", 1, False),
    ("C1_first_seal_move", "os", "rename", 1, False),
    ("C2_mid_seal_move", "os", "rename", 17, False),
    ("C3_manifest_commit", "os", "replace", 2, False),
    ("C4_first_delete", "os", "remove", 1, True),
    ("C5_mid_delete", "os", "remove", 41, True),
    ("C6_stage_rmtree", "shutil", "rmtree", 1, True),
    ("C7_prune_flip", "os", "replace", 3, True),
]


@pytest.mark.parametrize(
    "kill", COMPACT_KILLS, ids=[k[0] for k in COMPACT_KILLS]
)
def test_compact_killed_then_restarted_heals(
    monkeypatch, spark, store, events, kill
):
    import shutil as shutil_mod

    _, mod_name, attr, n, committed = kill
    _fragment(store, events)
    n_physical = store.fetch("events").count()
    logical = events.select("event_id").distinct().count()
    path = store.path("events")
    parent = os.path.dirname(path)

    mod = os if mod_name == "os" else shutil_mod
    # compact stages live BESIDE the series dir (dot-prefixed under the
    # store root), so filter on the parent
    state = _inject(monkeypatch, mod, attr, parent, n)
    with pytest.raises(KillPoint):
        store.compact("events", key_cols=["event_id"])
    assert state["count"] == n
    monkeypatch.undo()

    # THE round-8 exactness law: the crashed state reads as EXACTLY the
    # pre-compact store (kill before the manifest flip) or EXACTLY the
    # post-compact store (kill after it) — never a transient duplicate,
    # never a gap, at any instant
    expected = logical if committed else n_physical
    assert store.fetch("events").count() == expected
    assert store.fetch("events", latest_by=["event_id"]).count() == logical

    # restart heals: discards/readopts debris, re-compacts
    store.compact("events", key_cols=["event_id"])
    assert store.fetch("events").count() == logical
    assert _no_litter(path) == []
    assert _manifest_consistent(store, "events") == []


def test_lease_breaker_dies_between_tomb_and_create(tmp_path):
    """L1: a breaker that renames the stale lease to its tombstone and
    then DIES (before creating its own lease) must not wedge the
    series: the path is free, so the next acquirer proceeds, completes
    its op, and the tombstone is inert litter that never resurrects as
    a lease."""
    import json
    import time

    from pandas_tsdb_spark import store as store_mod

    series = str(tmp_path / "s")
    dead = store_mod._WriterLease(series, "compact")
    with open(dead.path, "w") as f:
        json.dump({"pid": 999999, "op": "crashed"}, f)
    old = time.time() - 10 * store_mod._LEASE_STALE_SECS
    os.utime(dead.path, (old, old))
    # the breaker's first half: tombstone rename — then it dies
    tomb = f"{dead.path}.tomb.dead.1"
    os.rename(dead.path, tomb)

    # next acquirer is not blocked and releases cleanly
    with store_mod._WriterLease(series, "optimize") as lease2:
        assert os.path.exists(lease2.path)
    assert not os.path.exists(lease2.path)
    # the tombstone never became the lock
    assert os.path.exists(tomb)


def test_lease_contention_across_real_processes(tmp_path, monkeypatch):
    """True MULTI-PROCESS lease law (the in-file tests simulate races
    in-process): a child process acquires and HOLDS the writer lease —
    the parent must be rejected while the child lives, and after the
    child is SIGKILLed (no __exit__, heartbeat dead) the parent must
    break the stale lease and acquire."""
    import signal
    import subprocess
    import sys
    import time

    from pandas_tsdb_spark import store as store_mod

    series = str(tmp_path / "s")
    child_src = f"""
import sys, time
sys.path.insert(0, "/root/repo")
from pandas_tsdb_spark import store as store_mod
store_mod._LEASE_STALE_SECS = 1.0
with store_mod._WriterLease({series!r}, "compact"):
    print("HELD", flush=True)
    time.sleep(60)
"""
    monkeypatch.setattr(store_mod, "_LEASE_STALE_SECS", 1.0)
    child = subprocess.Popen(
        [sys.executable, "-c", child_src], stdout=subprocess.PIPE, text=True
    )
    try:
        assert child.stdout.readline().strip() == "HELD"
        # live holder (heartbeat running): parent is rejected, even
        # after sleeping past the (shrunk) staleness bound
        time.sleep(2.0)
        with pytest.raises(store_mod.WriterLeaseHeld):
            with store_mod._WriterLease(series, "optimize"):
                pass  # pragma: no cover
        # crash the holder: no release, no heartbeat -> lease goes stale
        child.send_signal(signal.SIGKILL)
        child.wait()
        time.sleep(1.5)  # let the last heartbeat's mtime age past stale
        with store_mod._WriterLease(series, "optimize") as lease:
            assert os.path.exists(lease.path)
        assert not os.path.exists(lease.path)
    finally:
        if child.poll() is None:
            child.kill()
