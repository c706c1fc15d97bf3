"""TsStore — the "-tsdb" layer: a named-series time-series store.

The reference packages pandas as a time-series DATABASE: named series
you append points to and fetch time ranges from (SURVEY.md §1.1 — the
tsdb layer itself is [UNVERIFIED] with the reference checkout empty, so
this implements the canonical contract such a layer has: append / fetch
/ compact over named series).

Spark-first design, sized for 100 TB:

- One directory per series name; data laid out as parquet
  hive-partitioned by UTC day (``_date=YYYY-MM-DD``). A ``fetch`` for a
  time range prunes to the touched day directories BEFORE any file is
  opened (PartitionFilters), and key/column predicates push into the
  parquet scan — fetch cost is proportional to the slice, never the
  store.
- ``append`` is blind (no read-modify-write, no locking beyond the
  atomic per-task file commit): duplicate/late points are ALLOWED on
  disk and resolved at read time (``fetch(latest_by=...)``) or
  compacted away (``compact``) — the standard LSM-ish trade that keeps
  ingest embarrassingly parallel.
- ``compact`` rewrites a series keep-latest-per-key (the upsert_cdc
  plan shape) and coalesces small append files per partition.
- SNAPSHOT-ISOLATED maintenance (round-8): every file-replacing op
  (compact/optimize/delete_keys) commits through a per-series MANIFEST
  (``_manifest.json``, atomically replaced) naming the live rewritten
  files per partition. Rewritten files land dot-free but INVISIBLE
  (the ``sealed-`` name prefix is visible only when manifest-listed);
  the single atomic manifest replace is the commit point, after which
  the inputs are invisible (append-class inputs via the manifest's
  ``retired`` tombstones) though still on disk until deleted. A reader
  therefore sees EXACT row counts at every instant of maintenance —
  never a transient duplicate, never a gap — the same read protocol as
  a table format's manifest, without vendoring one. Blind appends stay
  manifest-FREE (visible by presence, so ingest remains lock-free);
  a series never maintained has no manifest and reads as a plain
  hive-partitioned dir.

Usage:
    store = TsStore(spark, "/data/tsdb")
    store.append("clicks", df)                    # df must carry ts_col
    s = store.fetch("clicks", "2024-01-05", "2024-01-10",
                    keys={"user_id": [1, 2]}, columns=["user_id", "value"])
    store.compact("clicks", key_cols=["event_id"], order_col="ts")
"""

from __future__ import annotations

import json
import os
from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

__all__ = ["ManifestContention", "TsStore", "WriterLeaseHeld"]

_PART = "_date"
_INGEST = "_ingest_ts"
_MANIFEST = "_manifest.json"  # underscore: invisible to Spark scans
_MANIFEST_DIR = "_manifest.d"  # per-partition shard files (same invisibility)
# maintenance outputs: dot-free (so legacy tools see real parquet) but
# visible ONLY when listed in the manifest — the invisibility that lets
# a rewrite land files first and commit them atomically afterwards
_SEALED = "sealed-"

# A crashed maintenance writer must not brick the series forever: a lease
# older than this is presumed dead and taken over. Live holders refresh
# the lease mtime automatically: __enter__ starts a daemon heartbeat
# thread touching every _LEASE_STALE_SECS/5, so even a single Spark
# action longer than the bound (driver blocked inside it) keeps the
# lease fresh. At cluster scale a manifest/catalog lock replaces this
# file, as the docstrings note.
_LEASE_STALE_SECS = 900.0


class WriterLeaseHeld(RuntimeError):
    """Another process holds the series' maintenance-writer lease."""


class ManifestContention(RuntimeError):
    """A reader could not pin a stable (manifest, listing) snapshot:
    maintenance commits kept landing during every listing attempt.
    RETRYABLE — the same class as the documented stale-plan
    FileNotFound: re-fetch. Raised instead of silently reading an
    inconsistent pair (which could under- or over-count)."""


class _WriterLease:
    """Cross-PROCESS single-writer guard for the maintenance ops
    (overwrite/compact/optimize/delete_keys/drop_before): an exclusive
    create (O_CREAT|O_EXCL — atomic on POSIX and local NFS alike) of a
    dotted lease file beside the series dir. append() deliberately does
    NOT take it — blind appends are concurrent-safe by design; the lease
    enforces the documented "single maintenance owner per series"
    invariant instead of leaving it a caveat. Stale leases (holder
    crashed; mtime older than _LEASE_STALE_SECS) are broken on acquire.
    The lease file is dot-prefixed and a plain FILE, so series() listing,
    partition discovery, and the stage-dir sweeps (which only touch
    directories) all ignore it."""

    def __init__(self, series_path: str, op: str):
        parent, base = os.path.split(series_path)
        self.path = os.path.join(parent, f".{base}.writer.lock")
        self.op = op
        self._parent = parent
        self._stop = None  # threading.Event while held

    def _read_holder(self) -> str:
        try:
            with open(self.path) as f:
                return f.read(512)
        except OSError:
            return "<unreadable>"

    def _break_stale(self) -> None:
        """Break a dead holder's lease ATOMICALLY: rename the observed
        stale file to a unique tombstone (exactly one of N racing
        breakers wins the rename — the losers get ENOENT and fall
        through to the exclusive create), then verify BY INODE that the
        file we moved is the one whose mtime we checked. A plain
        unlink+create pair is a TOCTOU hole: breaker B (which statted
        before breaker A re-created a FRESH lease) would unlink A's
        live lease. Here B's rename would move A's fresh lease, but the
        inode check catches the swap and B restores it with a
        NO-REPLACE link(2) — so if a third waiter C slipped an O_EXCL
        lease into the briefly-empty-path window, B cannot clobber C's
        lease (B leaves the tombstone and backs off instead)."""
        import time

        try:
            st = os.stat(self.path)
        except OSError:
            return  # no lease: nothing to break
        if time.time() - st.st_mtime <= _LEASE_STALE_SECS:
            return  # live holder (the toucher thread keeps mtime fresh)
        self._break_observed(st)

    def _break_observed(self, st: os.stat_result) -> None:
        """Second half of the break (split out so the stat→rename race
        window is directly testable): ``st`` is the stale lease as
        OBSERVED; only that exact inode may be removed."""
        import time

        tomb = f"{self.path}.tomb.{os.getpid()}.{time.monotonic_ns()}"
        try:
            os.rename(self.path, tomb)
        except OSError:
            return  # another breaker won the rename; race via O_EXCL
        try:
            moved = os.stat(tomb)
            # identity = (inode, mtime_ns): the filesystem recycles
            # inodes, so a fresh lease re-created on the same path can
            # reuse the stale file's inode — but its mtime is fresh
            # (that IS the liveness signal), so the pair can only match
            # the exact file whose staleness we verified.
            if (moved.st_ino, moved.st_mtime_ns) != (st.st_ino, st.st_mtime_ns):
                # we moved a lease CREATED AFTER our staleness check —
                # a live holder's. Put it back with a no-replace
                # primitive: a clobbering rename could overwrite a
                # lease a THIRD waiter O_EXCL-created into the empty
                # window, leaving two writers both believing they hold
                # it. link(2) fails with EEXIST instead; in that case
                # the new holder keeps its lease and we leave the
                # tombstone (swept as a plain stale file later — it is
                # dot-prefixed and never read as the lock path).
                try:
                    os.link(tomb, self.path)
                except FileExistsError:
                    return
                except OSError:
                    return
                try:
                    os.unlink(tomb)
                except OSError:
                    pass
                return
        except OSError:
            return
        try:
            os.unlink(tomb)
        except OSError:
            pass

    def __enter__(self) -> "_WriterLease":
        import threading
        import time

        os.makedirs(self._parent, exist_ok=True)
        self._break_stale()
        try:
            fd = os.open(self.path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            raise WriterLeaseHeld(
                f"maintenance lease {self.path} held by {self._read_holder()}"
                f" — overwrite/compact/optimize/delete/retention are "
                f"single-writer per series (blind append() is always safe)"
            ) from None
        with os.fdopen(fd, "w") as f:
            json.dump(
                {"pid": os.getpid(), "op": self.op, "acquired_unix": time.time()},
                f,
            )
        # heartbeat: refresh the lease mtime every _LEASE_STALE_SECS/5
        # for as long as the op runs. Loop-site touch() calls can't cover
        # a SINGLE long Spark action (one compact write can exceed the
        # staleness bound with the driver blocked inside it); a daemon
        # toucher covers any phase length, so a live holder is never
        # broken as stale no matter how long the rewrite runs.
        self._stop = threading.Event()

        def _beat(stop: "threading.Event", period: float) -> None:
            while not stop.wait(period):
                self.touch()

        t = threading.Thread(
            target=_beat,
            args=(self._stop, _LEASE_STALE_SECS / 5.0),
            name=f"lease-heartbeat:{os.path.basename(self.path)}",
            daemon=True,
        )
        t.start()
        self._beat_thread = t
        return self

    def touch(self) -> None:
        """Refresh the lease mtime mid-operation so a long rewrite is
        never mistaken for a dead holder (also driven automatically by
        the heartbeat thread while the lease is held)."""
        try:
            os.utime(self.path)
        except OSError:
            pass

    def __exit__(self, *exc) -> None:
        if self._stop is not None:
            self._stop.set()
            self._beat_thread.join(timeout=5.0)
            self._stop = None
        try:
            os.unlink(self.path)
        except OSError:
            pass


def _leased(op: str):
    """Method decorator: run the maintenance op under the series'
    cross-process writer lease (methods take ``name`` first)."""
    import functools

    def deco(fn):
        @functools.wraps(fn)
        def wrapper(self, name, *args, **kwargs):
            with _WriterLease(self.path(name), op):
                return fn(self, name, *args, **kwargs)

        return wrapper

    return deco


class TsStore:
    def __init__(
        self,
        spark: SparkSession,
        root: str,
        ts_col: str = "ts",
        manifest_shard_after: int = 64,
    ):
        self.spark = spark
        self.root = root
        self.ts_col = ts_col
        # Inline -> sharded manifest cutover (round-9 verdict #4, the
        # metadata-scale seam): a series whose manifest tracks at most
        # this many partitions keeps the single inline _manifest.json
        # (one read, one atomic replace — the protocol every kill-matrix
        # boundary pins); beyond it, per-partition shard files carry the
        # file lists (the bulk) and the root holds only
        # {partition: shard-filename} pointers, Iceberg's
        # manifest-list/manifest split in miniature. Shards are
        # content-addressed and immutable, so a commit writes only the
        # TOUCHED partitions' shards plus the root pointer — O(touched)
        # data, not O(store) — and a reader resolving a pruned fetch
        # range opens only the shards inside the range.
        self.manifest_shard_after = int(manifest_shard_after)

    # -- paths ------------------------------------------------------------

    def path(self, name: str) -> str:
        if "/" in name or name.startswith("."):
            raise ValueError(f"bad series name: {name!r}")
        return os.path.join(self.root, name)

    def series(self) -> list[str]:
        if not os.path.isdir(self.root):
            return []
        return sorted(
            d for d in os.listdir(self.root)
            if os.path.isdir(os.path.join(self.root, d))
            and not d.startswith(".")  # in-flight swap dirs are dotted
        )

    # -- write ------------------------------------------------------------

    def _with_part(self, df: DataFrame) -> DataFrame:
        if self.ts_col not in df.columns:
            raise ValueError(f"frame lacks time column {self.ts_col!r}")
        return df.withColumn(_PART, F.to_date(F.col(self.ts_col)))

    def _with_ingest(self, df: DataFrame, ingest_ts) -> DataFrame:
        if _INGEST in df.columns:  # replayed batch already stamped
            return df
        stamp = (
            F.current_timestamp()
            if ingest_ts is None
            else F.lit(ingest_ts).cast("timestamp")
        )
        return df.withColumn(_INGEST, stamp)

    def _save_schema(
        self, name: str, stamped: DataFrame, union: bool = True
    ) -> None:
        """Persist the stamped schema beside the data (underscore file —
        invisible to scans) so an emptied store (retention dropped every
        partition) still fetches as an empty frame instead of dying on
        parquet schema inference. Rewritten on EVERY append/overwrite
        (write-to-tmp + atomic replace): with schema evolution across
        appends, a write-once file would pin the first append's schema
        and an emptied store would fetch without later-added columns.

        The written schema is the FIELD UNION of the current append's
        schema and any existing _schema.json — without the merge, two
        concurrent appenders with evolved schemas race and the last
        writer wins, so a narrower schema could overwrite a wider one
        and drop later-added columns from the emptied-store fallback.
        (Two writers adding DIFFERENT new columns in the same instant
        can still each miss the other's column for one append; the next
        append of either column re-unions it in — monotone, eventually
        complete.)

        The union applies ONLY to append() (``union=True``), the sole
        documented concurrent path. overwrite() passes ``union=False``
        and writes the stamped schema verbatim: under
        spark.sql.sources.partitionOverwriteMode=dynamic the old
        _schema.json survives the data overwrite, and unioning it back
        would resurrect intentionally-dropped columns in the
        emptied-store fallback. Same-named fields with conflicting
        types resolve to the current writer's type (current fields win
        the union by construction)."""
        import uuid

        from pyspark.sql import types as T

        p = os.path.join(self.path(name), "_schema.json")
        schema = stamped.schema
        if not union:
            tmp = f"{p}.{uuid.uuid4().hex}.tmp"
            with open(tmp, "w") as f:
                f.write(schema.json())
            os.replace(tmp, p)
            return
        try:
            with open(p) as f:
                existing = T.StructType.fromJson(json.load(f))
            have = {f.name for f in schema.fields}
            extra = [f for f in existing.fields if f.name not in have]
            if extra:
                schema = T.StructType(list(schema.fields) + extra)
        except (OSError, ValueError, KeyError):
            pass  # absent or corrupt prior schema: write ours alone
        # unique tmp per write: concurrent appenders sharing one tmp
        # name race each other's os.replace (caught by the threading law)
        tmp = f"{p}.{uuid.uuid4().hex}.tmp"
        with open(tmp, "w") as f:
            f.write(schema.json())
        os.replace(tmp, p)

    def _empty_if_no_parts(self, name: str) -> DataFrame | None:
        d = self.path(name)
        if os.path.isdir(d) and not any(
            e.startswith(f"{_PART}=") for e in os.listdir(d)
        ):
            p = os.path.join(d, "_schema.json")
            if os.path.exists(p):
                from pyspark.sql import types as T

                with open(p) as f:
                    schema = T.StructType.fromJson(json.load(f))
                return self.spark.createDataFrame([], schema)
        return None

    # -- manifest (snapshot-isolated maintenance commits) ------------------

    def _manifest_file(self, name: str) -> str:
        return os.path.join(self.path(name), _MANIFEST)

    def _shard_dir(self, name: str) -> str:
        return os.path.join(self.path(name), _MANIFEST_DIR)

    def _read_root(self, name: str) -> dict | None:
        """The raw manifest ROOT (shards unresolved), or None for a
        never-maintained series. Cheap — one small-file read — so the
        reader's stable-pair check uses it. A corrupt root is FAIL-FAST
        (visibility would be undefined — same doctrine as never setting
        ignoreCorruptFiles)."""
        p = self._manifest_file(name)
        try:
            with open(p) as f:
                raw = f.read()
        except OSError:
            return None
        try:
            return json.loads(raw)
        except ValueError as e:
            raise RuntimeError(
                f"corrupt series manifest {p!r}: {e} — restore it or "
                "delete it to fall back to visible-by-presence reads "
                "(only safe if no retired/sealed debris is on disk)"
            ) from e

    def _read_manifest(
        self, name: str, partitions: Sequence[str] | None = None
    ) -> dict | None:
        """The series manifest RESOLVED to its in-memory shape, or None
        for a never-maintained series:
        {"gen": N, "token": hex, "sealed": {partition: [file, ...]},
        "retired": {partition: [file, ...]}}. ``sealed`` is the
        authoritative live list for sealed- files; ``retired``
        tombstones append-class files whose rows were rewritten but
        whose physical delete may still be pending.

        Small series store sealed/retired INLINE in the root; sharded
        roots (see __init__) carry {partition: shard-file} pointers and
        this resolves them. ``partitions`` limits resolution to those
        partition entries (the pruned-fetch fast path: only shards in
        the range are even opened) — pruned resolution is READ-ONLY;
        every mutate-and-write-back caller resolves in full.

        A MISSING shard file is ManifestContention (retryable): the
        only way a root can name an absent shard is a maintenance
        shard-GC racing this read, because shards are content-addressed,
        written before the root that references them, and deleted only
        under the lease once unreferenced. A CORRUPT shard is fail-fast
        like a corrupt root."""
        root = self._read_root(name)
        if root is None or "shards" not in root:
            return root
        sealed: dict[str, list[str]] = {}
        retired: dict[str, list[str]] = {}
        sd = self._shard_dir(name)
        for entry, fname in root["shards"].items():
            if partitions is not None and entry not in partitions:
                continue
            fp = os.path.join(sd, fname)
            try:
                with open(fp) as f:
                    sh = json.loads(f.read())
            except OSError as e:
                raise ManifestContention(
                    f"series {name!r}: manifest shard {fname!r} vanished "
                    "under the root that names it — a maintenance "
                    "shard-GC raced this read; re-fetch"
                ) from e
            except ValueError as e:
                raise RuntimeError(
                    f"corrupt manifest shard {fp!r}: {e} — restore it "
                    "(content-addressed: its name is the sha1 of its "
                    "canonical JSON) or rebuild the manifest"
                ) from e
            if sh.get("partition") not in (None, entry):
                raise RuntimeError(
                    f"manifest shard {fp!r} claims partition "
                    f"{sh.get('partition')!r} but the root points it at "
                    f"{entry!r} — manifest damaged externally"
                )
            if sh.get("sealed"):
                sealed[entry] = sh["sealed"]
            if sh.get("retired"):
                retired[entry] = sh["retired"]
        return {
            "gen": root.get("gen"),
            "token": root.get("token"),
            "sealed": sealed,
            "retired": retired,
        }

    def _write_manifest(self, name: str, man: dict) -> None:
        """Atomic manifest-ROOT replace (tmp + os.replace) — THE commit
        point of every maintenance transaction. Empty lists are pruned
        so the manifest stays proportional to maintained partitions.

        Above ``manifest_shard_after`` partitions the file lists move
        to per-partition shard files (written BEFORE the root that
        names them) and the root holds only pointers. Shards are
        content-addressed (name = sha1 of canonical JSON): an untouched
        partition's shard content is unchanged, so its file already
        exists and is skipped — a commit writes O(touched partitions)
        shard bytes plus one root whose entries are ~50-byte pointers.
        Content addressing also makes the exists-check crash-safe: a
        shard reaches its final name only via os.replace of a fully
        written tmp, so 'exists' implies 'complete'. Unreferenced
        shards (crashed pre-commit writers, superseded generations) are
        GC'd by _sweep_manifest_debris under the lease; a reader racing
        that GC gets ManifestContention and retries (see
        _read_manifest). The commit point is the root replace in every
        case — kill anywhere before it and the old generation is intact,
        after it and the new one is.

        Root ceiling: ~75 bytes/partition (measured,
        tools/manifest_scale_probe.py), so even 30 years of daily
        partitions is a <1 MB root and 10 years of HOURLY partitions
        ~6.5 MB — milliseconds to rewrite. Beyond that an Iceberg-style
        manifest-list (range-keyed groups of shard pointers) is the
        next split; the read/commit protocol would be unchanged."""
        import hashlib
        import uuid

        man = {
            "gen": int(man.get("gen", 0)) + 1,
            # per-write random token: overwrite() may DELETE an emptied
            # manifest and _ensure_manifest restarts gen at 1, so gen
            # alone can ABA a reader (old manifest paired with a new
            # listing across a delete/recreate cycle). The stable-pair
            # check in _read_visible requires gen AND token to match,
            # which no delete/recreate cycle can reproduce.
            "token": uuid.uuid4().hex,
            "sealed": {k: sorted(v) for k, v in man.get("sealed", {}).items() if v},
            "retired": {k: sorted(v) for k, v in man.get("retired", {}).items() if v},
        }
        entries = sorted(set(man["sealed"]) | set(man["retired"]))
        if len(entries) > self.manifest_shard_after:
            sd = self._shard_dir(name)
            os.makedirs(sd, exist_ok=True)
            shards: dict[str, str] = {}
            for entry in entries:
                # the partition name is part of the content: sealed
                # file names repeat across partitions (sealed-{txn}-i),
                # so without it every partition of one commit would
                # collapse into a single shared shard file — and a
                # corruption of that one file would take out the whole
                # store instead of one partition. Embedding it also
                # gives readers a pointer/content cross-check.
                content = json.dumps(
                    {
                        "partition": entry,
                        "sealed": man["sealed"].get(entry, []),
                        "retired": man["retired"].get(entry, []),
                    },
                    sort_keys=True,
                )
                fname = (
                    f"shard-{hashlib.sha1(content.encode()).hexdigest()}.json"
                )
                fp = os.path.join(sd, fname)
                if not os.path.exists(fp):
                    stmp = f"{fp}.{uuid.uuid4().hex}.tmp"
                    with open(stmp, "w") as f:
                        f.write(content)
                    os.replace(stmp, fp)
                shards[entry] = fname
            man = {"gen": man["gen"], "token": man["token"], "shards": shards}
        p = self._manifest_file(name)
        tmp = f"{p}.{uuid.uuid4().hex}.tmp"
        with open(tmp, "w") as f:
            json.dump(man, f, sort_keys=True)
        os.replace(tmp, p)

    @staticmethod
    def _visible_in_partition(
        man: dict, entry: str, on_disk: Sequence[str]
    ) -> list[str]:
        """The visible file names of one partition under a manifest:
        sealed- files iff listed (a LISTED-but-missing sealed file is
        kept so the read fails fast on external damage instead of
        silently returning less data), everything else by presence
        unless tombstoned in ``retired``."""
        sealed = set(man.get("sealed", {}).get(entry, ()))
        retired = set(man.get("retired", {}).get(entry, ()))
        vis = []
        for f in on_disk:
            if f.startswith(_SEALED):
                if f in sealed:
                    vis.append(f)
            elif f not in retired:
                vis.append(f)
        vis.extend(sorted(sealed.difference(on_disk)))  # fail-fast probes
        return vis

    def _part_entries(self, name: str) -> list[str]:
        path = self.path(name)
        return sorted(
            e
            for e in os.listdir(path)
            if e.startswith(f"{_PART}=")
            and os.path.isdir(os.path.join(path, e))
        )

    def _list_parquet(self, name: str, entry: str) -> list[str]:
        part_dir = os.path.join(self.path(name), entry)
        return sorted(
            f
            for f in os.listdir(part_dir)
            if f.endswith(".parquet") and not f.startswith(".")
        )

    def _visible_files(
        self, name: str, man: dict, partitions: Sequence[str] | None = None
    ) -> list[str]:
        """Manifest-resolved visible data files (absolute paths) under
        a GIVEN manifest snapshot. ``partitions`` limits the listing
        (driver-side partition pruning for fetch ranges — untouched day
        dirs are never even listed)."""
        path = self.path(name)
        out: list[str] = []
        for entry in self._part_entries(name):
            if partitions is not None and entry not in partitions:
                continue
            for f in self._visible_in_partition(
                man, entry, self._list_parquet(name, entry)
            ):
                out.append(os.path.join(path, entry, f))
        return out

    def _read_visible(
        self,
        name: str,
        merge_schema: bool = False,
        partitions: Sequence[str] | None = None,
    ) -> DataFrame:
        """Read the series' VISIBLE data: explicit manifest-resolved
        file list when a manifest exists (so a maintenance commit is
        atomic to readers), else the whole partitioned dir. The
        explicit-list path passes basePath so ``_date`` still resolves
        as a partition column and prunes/pushes identically.

        OPTIMISTIC SNAPSHOT LOOP: the manifest is re-read after the
        directory listing and the pair is retried until the generation
        is unchanged across it — without this, a reader could pair an
        OLD manifest (which doesn't list a just-committed rewrite's
        sealed files) with a NEW listing (whose inputs are already
        deleted) and silently see an empty partition. With a stable
        pair, visibility is exact: commits only flip at the manifest
        replace, and post-commit physical deletes only touch files the
        stable manifest already hides. The residual race — a file
        deleted between listing and Spark opening it — surfaces as
        FileNotFound (the documented re-fetch case), never as a wrong
        count.

        Scale note: the listing is driver-side metadata, the same
        O(files-in-touched-partitions) walk Spark's own file index
        does; at cluster scale the JSON manifest would shard
        Iceberg-style, but the read protocol is unchanged."""
        path = self.path(name)
        reader = self.spark.read
        if merge_schema:
            reader = reader.option("mergeSchema", "true")
        import time as _time

        # Explicit schema from the sidecar (written on every append,
        # field-union across evolved appends): the scan skips the
        # footer read schema inference pays per fetch, and the
        # stale-listing race can never surface as
        # UNABLE_TO_INFER_SCHEMA. CRITICAL caveat (caught by the
        # full-suite contention storm, r10): with a user-supplied
        # schema Spark skips checkFilesExist, so a file deleted
        # between the manifest snapshot and the relation's listing is
        # SILENTLY DROPPED from the file index — an empty/partial read
        # instead of a loud failure. The guard below therefore compares
        # the materialized index (df.inputFiles(), driver-side, no job)
        # against the manifest list and RETRIES inside the snapshot
        # loop on any mismatch. Fields absent from an old file read as
        # NULL (same as mergeSchema); the as_of/mergeSchema path keeps
        # footer-union inference semantics.
        sidecar = None
        if not merge_schema:
            from pyspark.sql import types as T

            try:
                with open(os.path.join(path, "_schema.json")) as f:
                    sidecar = T.StructType.fromJson(json.load(f))
            except OSError:
                sidecar = None  # legacy store: infer as before

        files: list[str] | None = None
        for attempt in range(12):
            try:
                # pruned resolution: only shards inside the fetch range
                # are opened (sharded roots; inline roots are one read)
                man = self._read_manifest(name, partitions=partitions)
            except ManifestContention:
                # a shard named by the root we read was GC'd mid-read:
                # a commit+sweep raced us — same retry as a gen flip
                man = None
                _time.sleep(0.02 * attempt)
                continue
            if man is None:
                df = reader.parquet(path)  # Spark lists the dir HERE
                if self._read_root(name) is None:
                    return df  # no commit raced the listing
            else:
                files = self._visible_files(name, man, partitions=partitions)
                root2 = self._read_root(name)
                # gen AND token: a delete/recreate cycle restarts gen
                # at 1, so gen alone is ABA-able; the random per-write
                # token (legacy manifests: both None, still equal) is
                # not (see _write_manifest). Comparing the ROOT suffices
                # for sharded manifests too: shard files are immutable
                # content-addressed values, so an unchanged root implies
                # an unchanged resolved manifest.
                if (
                    root2 is not None
                    and root2.get("gen") == man.get("gen")
                    and root2.get("token") == man.get("token")
                ):
                    if not files:
                        break  # typed-empty case below
                    if sidecar is None:
                        # inference path: a vanished file fails loudly
                        # at footer read / scan (documented re-fetch)
                        return reader.option("basePath", path).parquet(
                            *files
                        )
                    df = (
                        reader.schema(sidecar)
                        .option("basePath", path)
                        .parquet(*files)
                    )
                    if len(df.inputFiles()) == len(files):
                        return df
                    # a post-commit delete raced the listing and the
                    # index silently dropped files: stale snapshot —
                    # retry the whole pair
            files = None
            _time.sleep(0.02 * attempt)  # let the commit burst pass
        if files is None:
            raise ManifestContention(
                f"series {name!r}: maintenance commits landed during all "
                "12 listing attempts — retry the fetch"
            )
        # every file in range is retired/unsealed (e.g. delete_keys
        # emptied the slice): typed empty via the schema sidecar
        from pyspark.sql import types as T

        with open(os.path.join(path, "_schema.json")) as f:
            schema = T.StructType.fromJson(json.load(f))
        return self.spark.createDataFrame([], schema)

    def _sweep_manifest_debris(self, name: str) -> None:
        """Finish any manifest-committed transaction a crash cut short
        and remove pre-commit litter. Runs ONLY under the maintenance
        lease (fetch never sweeps — another process may be mid-commit).
        Invariants restored: (a) retired-but-present files are deleted
        and their tombstones pruned; (b) sealed- files NOT listed in
        the manifest (outputs of a rewrite that died before its commit)
        are deleted; (c) manifest entries for partitions whose dir is
        gone (retention) are pruned. All three states are invisible to
        readers, so sweeping changes no answer — afterwards every
        on-disk non-dotted parquet file is visible, which is the
        precondition the maintenance snapshot listings rely on."""
        man = self._read_manifest(name)
        if man is None:
            return
        path = self.path(name)
        changed = False
        entries = set(self._part_entries(name))
        for entry in sorted(
            entries | set(man.get("sealed", {})) | set(man.get("retired", {}))
        ):
            if entry not in entries:  # partition dropped by retention
                if man.get("sealed", {}).pop(entry, None) is not None:
                    changed = True
                if man.get("retired", {}).pop(entry, None) is not None:
                    changed = True
                continue
            on_disk = set(self._list_parquet(name, entry))
            sealed = set(man.get("sealed", {}).get(entry, ()))
            retired = man.get("retired", {}).get(entry, ())
            for f in retired:
                try:
                    os.remove(os.path.join(path, entry, f))
                except FileNotFoundError:
                    pass
            if retired:
                del man["retired"][entry]
                changed = True
            for f in on_disk:
                if f.startswith(_SEALED) and f not in sealed:
                    os.remove(os.path.join(path, entry, f))
        if changed:
            self._write_manifest(name, man)
        # (d) GC shard files the CURRENT root no longer references —
        # crashed pre-commit writers and superseded generations (plus
        # their .tmp litter). Lease-only, like every destructive sweep:
        # a reader racing this GC with an older root in hand retries as
        # ManifestContention (see _read_manifest).
        sd = self._shard_dir(name)
        if os.path.isdir(sd):
            root = self._read_root(name) or {}
            live = set((root.get("shards") or {}).values())
            for f in os.listdir(sd):
                if f not in live:
                    try:
                        os.remove(os.path.join(sd, f))
                    except FileNotFoundError:
                        pass
            if not live:
                try:
                    os.rmdir(sd)
                except OSError:
                    pass

    def _ensure_manifest(self, name: str) -> None:
        """Create an EMPTY manifest before any sealed- file lands: the
        plain-directory fast path (used only when NO manifest exists)
        reads every non-dotted file by presence, so a first-ever
        rewrite crashing pre-commit would otherwise expose its sealed
        outputs beside their inputs. With the empty manifest in place
        first, 'no manifest' truly implies 'no sealed files ever'."""
        if self._read_manifest(name) is None:
            self._write_manifest(name, {"gen": 0, "sealed": {}, "retired": {}})

    def _move_staged_sealed(
        self, stage: str, name: str, txn: str
    ) -> dict[str, list[str]]:
        """Move a staged rewrite into the partition dirs under sealed-
        names — present but INVISIBLE until the manifest commit lists
        them. Returns {partition: [sealed file names]} for that commit."""
        path = self.path(name)
        out: dict[str, list[str]] = {}
        for entry in sorted(os.listdir(stage)):
            if not entry.startswith(f"{_PART}="):
                continue
            src_dir = os.path.join(stage, entry)
            dst_dir = os.path.join(path, entry)
            os.makedirs(dst_dir, exist_ok=True)
            names: list[str] = []
            for i, f in enumerate(sorted(os.listdir(src_dir))):
                if not f.endswith(".parquet") or f.startswith("."):
                    continue
                dst = f"{_SEALED}{txn}-{i:05d}.parquet"
                os.rename(os.path.join(src_dir, f), os.path.join(dst_dir, dst))
                names.append(dst)
            out[entry] = names
        return out

    def append(self, name: str, df: DataFrame, ingest_ts=None) -> None:
        """Blind parallel append — safe under CONCURRENT appenders.

        Writing straight into the table path is NOT concurrent-safe:
        Hadoop's FileOutputCommitter stages every job under the shared
        ``{table}/_temporary/0/`` and each job's commit/abort deletes
        that directory, clobbering the other writer's in-flight task
        files (reproduced in tests/test_store.py's threading law —
        FileNotFoundException on commit). Instead each append writes to
        its OWN dot-prefixed staging dir (invisible to series()/scans)
        and then MOVES the part-files into the day partitions — one
        same-filesystem rename per file, so readers only ever see whole
        files, and part names carry a per-write uuid so writers never
        collide. A crash mid-move leaves a partial append plus a dotted
        stage dir: exactly the at-least-once visibility a blind
        non-transactional append already has (resolved by latest_by /
        compact), never a torn file.

        Every row is stamped with an ingest watermark (``_ingest_ts``,
        wall clock unless ``ingest_ts`` pins it) — the hook
        ``fetch(as_of=...)`` snapshots hang off. Stamping is a map-side
        literal: zero cost at any scale."""
        import shutil
        import uuid

        stamped = self._with_part(self._with_ingest(df, ingest_ts))
        path = self.path(name)
        parent, base = os.path.split(path)
        stage = os.path.join(parent, f".{base}.append.{uuid.uuid4().hex}")
        stamped.write.partitionBy(_PART).parquet(stage)
        os.makedirs(path, exist_ok=True)
        self._move_staged_parts(stage, path)
        shutil.rmtree(stage)
        self._save_schema(name, stamped)

    @staticmethod
    def _move_staged_parts(stage: str, path: str) -> None:
        """Move every staged day partition's part-files into the table —
        one same-filesystem rename per file (readers only ever see whole
        files). Shared by append() and compact(); their visibility
        invariants depend on the exact same filtering (dotted files and
        non-parquet artifacts stay behind)."""
        for entry in os.listdir(stage):
            if not entry.startswith(f"{_PART}="):
                continue
            dst_dir = os.path.join(path, entry)
            os.makedirs(dst_dir, exist_ok=True)
            src_dir = os.path.join(stage, entry)
            for f in os.listdir(src_dir):
                if f.endswith(".parquet") and not f.startswith("."):
                    os.rename(
                        os.path.join(src_dir, f), os.path.join(dst_dir, f)
                    )

    @_leased("overwrite")
    def overwrite(self, name: str, df: DataFrame, ingest_ts=None) -> None:
        """Replace the series wholesale. SINGLE-WRITER semantics by
        definition (a full replacement concurrent with appends has no
        meaningful merge order) — unlike append(), this writes straight
        through Spark's committer; don't run it while appenders are
        live."""
        # physically drop manifest-invisible debris first: under
        # dynamic partitionOverwriteMode untouched partitions survive
        # the write, and removing the manifest below would otherwise
        # resurrect their retired/unsealed files
        self._sweep_manifest_debris(name)
        stamped = self._with_part(self._with_ingest(df, ingest_ts))
        stamped.write.mode("overwrite").partitionBy(_PART).parquet(
            self.path(name)
        )
        # reconcile the manifest with what survived the write: static
        # overwrite deleted it with the dir (nothing to do); dynamic
        # mode replaced only the written partitions, so prune sealed
        # entries whose files are gone (their partitions were replaced;
        # the new files are visible by presence) while UNTOUCHED
        # partitions keep their sealed listings — removing the manifest
        # wholesale would turn their sealed- files invisible.
        man = self._read_manifest(name)
        if man is not None:
            entries = set(self._part_entries(name))
            for kind in ("sealed", "retired"):
                kept_kind = {}
                for entry, fs in man.get(kind, {}).items():
                    if entry not in entries:
                        continue
                    part_dir = os.path.join(self.path(name), entry)
                    live = [
                        f for f in fs
                        if os.path.exists(os.path.join(part_dir, f))
                    ]
                    if live:
                        kept_kind[entry] = live
                man[kind] = kept_kind
            if man["sealed"] or man["retired"]:
                self._write_manifest(name, man)
            else:
                try:
                    os.remove(self._manifest_file(name))
                except FileNotFoundError:
                    pass
                import shutil as _shutil

                _shutil.rmtree(self._shard_dir(name), ignore_errors=True)
        self._save_schema(name, stamped, union=False)

    # -- read -------------------------------------------------------------

    def fetch(
        self,
        name: str,
        start=None,
        end=None,
        keys: Mapping[str, object] | None = None,
        columns: Sequence[str] | None = None,
        latest_by: Sequence[str] | None = None,
        order_col: str | None = None,
        as_of=None,
    ) -> DataFrame:
        """Fetch a time slice of a named series.

        start/end (inclusive) cut twice: a DAY predicate on the
        partition column (directory pruning — untouched days are never
        opened) plus the exact timestamp predicate (parquet row-group
        min/max pruning within the boundary days). ``keys`` adds
        equality/IN predicates (pushed to the scan), ``columns``
        projects early (parquet column pruning), ``latest_by`` resolves
        duplicate/late appends keep-latest-per-key at read time.

        ``as_of`` reads the store as it existed at an INGEST timestamp:
        rows appended after ``as_of`` are invisible, so a training run
        pinned to an as_of sees the identical corpus on every rerun,
        however many late appends landed since. Rows from stores
        predating ingest stamping count as always-visible. The snapshot
        filter is a row-level predicate pushed to the scan; event-time
        partition pruning applies unchanged."""
        self._sweep_compact_leftovers(name)
        df = self._empty_if_no_parts(name)
        if df is None:
            # driver-side partition pruning for the manifest path: only
            # day dirs inside [start, end] are listed (the plain-dir
            # path gets the same pruning from Catalyst's PartitionFilters)
            partitions = None
            if start is not None or end is not None:
                import datetime as _dt

                import pandas as _pd

                lo = _pd.Timestamp(start).date() if start is not None else _dt.date.min
                hi = _pd.Timestamp(end).date() if end is not None else _dt.date.max

                def _in_range(entry: str) -> bool:
                    # a null event ts at append lands in the Hive
                    # default partition (_date=__HIVE_DEFAULT_PARTITION__);
                    # keep such dirs in the listing so the row-level
                    # range filter below decides — exactly what Catalyst
                    # does on the plain-dir path (a null partition value
                    # fails `_date >= lit(start)` per-row, it does not
                    # brick the scan)
                    try:
                        return (
                            lo
                            <= _dt.date.fromisoformat(entry.split("=", 1)[1])
                            <= hi
                        )
                    except ValueError:
                        return True

                partitions = [
                    e for e in self._part_entries(name) if _in_range(e)
                ]
            # mergeSchema under as_of: old appends may lack _ingest_ts
            df = self._read_visible(
                name, merge_schema=as_of is not None, partitions=partitions
            )
        if as_of is not None and _INGEST in df.columns:
            df = df.filter(
                F.col(_INGEST).isNull()
                | (F.col(_INGEST) <= F.lit(as_of).cast("timestamp"))
            )
        ts = F.col(self.ts_col)
        if start is not None:
            df = df.filter(
                (F.col(_PART) >= F.to_date(F.lit(start))) & (ts >= F.lit(start))
            )
        if end is not None:
            df = df.filter(
                (F.col(_PART) <= F.to_date(F.lit(end))) & (ts <= F.lit(end))
            )
        for k, v in (keys or {}).items():
            df = df.filter(
                F.col(k).isin(list(v))
                if isinstance(v, (list, tuple, set))
                else F.col(k) == F.lit(v)
            )
        if latest_by:
            w = W.partitionBy(*latest_by).orderBy(
                F.col(order_col or self.ts_col).desc()
            )
            df = (
                df.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1)
                .drop("__rn")
            )
        if columns:
            cols = list(columns)
            if self.ts_col not in cols:
                cols = [self.ts_col] + cols
            df = df.select(*cols)
        return df.drop(_PART, _INGEST)

    # -- maintenance ------------------------------------------------------

    def _sweep_compact_leftovers(self, name: str, deep: bool = False) -> None:
        """Recover from a compact() crash at any instant (same sweep
        discipline as optimize's per-partition swap):
          - '.{name}.compact.old' with the series dir MISSING -> the
            crash hit between the two renames (pre-round-3 whole-dir
            swap layout) and the old dir holds the ONLY copy: restore;
          - '.{name}.compact.old' with the series dir present -> swap
            completed, cleanup lost: finish deleting;
          - '.{name}.compact[.uuid].tmp' -> unfinished rewrite: discard
            (data is never only in a stage dir — inputs are deleted
            strictly AFTER their replacements moved in).
        The uuid'd stage dirs (crashed compact/append leftovers) are
        swept only on ``deep=True`` — compact() entry, where this
        process owns maintenance for the series — never from fetch(),
        which must not destroy another process's in-flight stage.
        Runs at compact() entry and fetch() entry, so a crashed compact
        never strands a series until manual intervention."""
        import shutil

        parent, base = os.path.split(self.path(name))
        path = self.path(name)
        old = os.path.join(parent, f".{base}.compact.old")
        tmp = os.path.join(parent, f".{base}.compact.tmp")
        if os.path.isdir(old):
            if os.path.isdir(path):
                shutil.rmtree(old)
            else:
                os.rename(old, path)
        if os.path.isdir(tmp):
            shutil.rmtree(tmp)
        if deep and os.path.isdir(parent):
            # crashed uuid stages: compact stages are always safe to
            # discard; append stages only when plausibly abandoned
            # (mtime over an hour old — an in-flight append's stage is
            # seconds old), since an appender may still be moving files
            import time

            cutoff = time.time() - 3600

            def newest_mtime(root: str) -> float:
                # the NEWEST mtime anywhere under the stage dir, not the
                # top-level dir's: a long-running append job (>1h between
                # stage-dir creation and the file moves) keeps writing
                # part-files whose mtimes stay fresh even when the dir
                # entry itself has aged — judging by the top-level mtime
                # alone would rmtree a live append's staging mid-commit
                # root getmtime can race a concurrent appender's final
                # shutil.rmtree (stage vanished == append committed):
                # OSError here means "live, leave alone", not "abort
                # the whole sweep"
                try:
                    newest = os.path.getmtime(root)
                except OSError:
                    return float("inf")
                for dirpath, dirnames, filenames in os.walk(root):
                    for e in dirnames + filenames:
                        try:
                            newest = max(
                                newest,
                                os.path.getmtime(os.path.join(dirpath, e)),
                            )
                        except OSError:
                            pass  # file moved out by the appender: live
                return newest

            for entry in os.listdir(parent):
                p = os.path.join(parent, entry)
                if not entry.startswith(f".{base}.") or not os.path.isdir(p):
                    continue
                try:
                    # '.delete.' stages (delete_keys) discard exactly
                    # like compact stages: their kept-rows copies move
                    # OUT of the stage before the manifest commit, and
                    # the inputs are deleted only after it — a stage
                    # left behind by a crash is never the only copy.
                    # Sweeping here (under the lease) fixes the leak
                    # where a delete_keys crash before its rmtree left
                    # '.{series}.delete.{txn}.tmp' forever.
                    if entry.endswith(".tmp") and (
                        ".compact." in entry or ".delete." in entry
                    ):
                        shutil.rmtree(p)
                    elif entry.startswith(f".{base}.append.") and (
                        newest_mtime(p) < cutoff
                    ):
                        shutil.rmtree(p)
                except OSError:
                    continue  # dir vanished mid-sweep: owner finished it

    @_leased("compact")
    def compact(
        self,
        name: str,
        key_cols: Sequence[str],
        order_col: str | None = None,
    ) -> None:
        """Rewrite keep-latest-per-key and merge small append files.

        The window partitions by (day, key), so compaction never
        shuffles across days — each day's data compacts independently
        (at cluster scale: embarrassingly parallel across the
        partition dimension, like any LSM merge). The rewrite hashes
        rows by day across the DEFAULT parallelism (one output file per
        day, many days in flight at once) — never `repartition(1, ...)`,
        which funnels the whole store through a single task (measured
        20.2 s -> 10.6 s at 6.4M rows just from this).

        CONCURRENCY: compaction replaces exactly the input files it
        READ (snapshot listing -> dedup -> land sealed outputs ->
        MANIFEST FLIP -> delete the snapshot files), the LSM rule plus
        a manifest-pointer commit (round-8). Outputs land under
        ``sealed-`` names, INVISIBLE until the single atomic manifest
        replace lists them and simultaneously tombstones every
        snapshot input — so a reader sees the pre-compact rows or the
        post-compact rows, EXACTLY, at every instant; the transient
        duplicate the pre-manifest design allowed is gone. Files
        appended mid-compact are not part of the snapshot and survive
        untouched (appends stay manifest-free and lock-free). Remaining
        caveat: a PLAN created before compaction holds the old file
        listing and can hit FileNotFound if executed after the input
        deletion — re-fetch on that error (at cluster scale, deferring
        the physical deletes by one maintenance cycle widens the grace
        window; the manifest already supports it — deletes are pure
        hygiene once tombstoned). Compaction assumes a single
        maintenance owner per series (the writer lease enforces it).

        SCHEMA EVOLUTION: the snapshot is read with mergeSchema — the
        store allows appends to widen the schema, and inferring from
        one (possibly oldest) file would rewrite every row WITHOUT the
        later-added columns and then delete the only copies that had
        them (round-3 review catch)."""
        import shutil
        import uuid

        self._sweep_compact_leftovers(name, deep=True)
        # heal any crashed manifest transaction first: afterwards every
        # on-disk non-dotted file is visible, so the plain listing below
        # IS the visible snapshot
        self._sweep_manifest_debris(name)
        path = self.path(name)
        snapshot: dict[str, list[str]] = {}
        for entry in self._part_entries(name):
            files = self._list_parquet(name, entry)
            if files:
                snapshot[entry] = files
        if not snapshot:
            return
        in_files = [
            os.path.join(path, e, f) for e, fs in snapshot.items() for f in fs
        ]
        df = (
            self.spark.read.option("basePath", path)
            .option("mergeSchema", "true")
            .parquet(*in_files)
        )
        w = W.partitionBy(_PART, *key_cols).orderBy(
            F.col(order_col or self.ts_col).desc()
        )
        compacted = (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
            .repartition(F.col(_PART))
        )
        parent, base = os.path.split(path)
        txn = uuid.uuid4().hex
        stage = os.path.join(parent, f".{base}.compact.{txn}.tmp")
        compacted.write.partitionBy(_PART).parquet(stage)
        # land outputs sealed (present, invisible), then COMMIT: one
        # atomic manifest replace makes the outputs the only visible
        # files of their partitions and tombstones every append-class
        # input — readers flip from old rows to new rows in one instant
        self._ensure_manifest(name)
        new_sealed = self._move_staged_sealed(stage, name, txn)
        man = self._read_manifest(name)
        for entry, files in snapshot.items():
            man["sealed"][entry] = new_sealed.get(entry, [])
            man["retired"][entry] = sorted(
                set(man["retired"].get(entry, ()))
                | {f for f in files if not f.startswith(_SEALED)}
            )
        self._write_manifest(name, man)
        # physical cleanup — every deleted file is already invisible
        for entry, files in snapshot.items():
            for f in files:
                try:
                    os.remove(os.path.join(path, entry, f))
                except FileNotFoundError:
                    pass
        shutil.rmtree(stage)
        # prune the tombstones now that their files are gone
        self._sweep_manifest_debris(name)

    def _recover_opt_journals(self, path: str) -> None:
        """Complete any optimize() transaction a crash interrupted.
        The journal (written atomically before any visible mutation)
        lists the staged replacement files and the exact snapshot
        inputs they replace; recovery is idempotent: finish moving
        staged files in, finish deleting the inputs, drop the journal.
        Run before every optimize pass — a half-moved state must be
        COMPLETED before any rewrite reads the partition, or the
        transient duplicates would be baked into the new files."""
        import shutil

        for entry in list(os.listdir(path)):
            if not (entry.startswith(".") and entry.endswith(".opt.journal")):
                continue
            jpath = os.path.join(path, entry)
            try:
                with open(jpath) as f:
                    j = json.load(f)
            except (OSError, ValueError):
                os.unlink(jpath)
                continue
            part_dir = os.path.join(path, j["partition"])
            for src, dst in j["moves"]:
                if os.path.exists(src) and os.path.isdir(part_dir):
                    target = os.path.join(part_dir, dst)
                    if os.path.exists(target):
                        os.unlink(src)
                    else:
                        os.rename(src, target)
            for f in j["old"]:
                try:
                    os.remove(os.path.join(part_dir, f))
                except FileNotFoundError:
                    pass
            if os.path.isdir(j["stage"]):
                shutil.rmtree(j["stage"])
            os.unlink(jpath)

    @_leased("optimize")
    def optimize(
        self,
        name: str,
        target_file_mb: int = 128,
        min_files: int = 2,
    ) -> int:
        """Small-file compaction WITHOUT semantic rewrite: per day
        partition, if the partition holds >= ``min_files`` parquet
        files, rewrite it into ceil(bytes / target_file_mb) files.
        Rows are byte-identical before and after (no dedup — that is
        ``compact``); this is the pure layout maintenance a 100 TB
        store runs continuously, because blind parallel appends (and
        streaming micro-batches especially) accrete files whose
        per-file open/footer cost eventually dominates scans. Only
        partitions over the threshold rewrite — cost is proportional
        to the debt, not the store. Returns the number of partitions
        rewritten.

        CONCURRENCY (round-8 manifest rewrite; the round-6 journal
        protocol moved replacements in while the inputs were still
        visible, so a reader mid-swap could transiently count a row
        twice): each partition follows compact()'s snapshot-and-seal
        discipline — read EXACTLY the snapshot files, stage the rewrite
        dot-prefixed (invisible), land the outputs under sealed- names
        (still invisible), then COMMIT with one atomic manifest replace
        that lists the outputs and tombstones the inputs. A reader sees
        the old layout or the new layout, exactly, at every instant —
        optimize is layout-only, so plain fetch().count() is invariant
        THROUGH the swap, not just fetch(latest_by=...). A file a
        concurrent appender lands survives untouched. A crash at any
        point either never committed (sealed orphans swept, inputs
        still visible) or committed (tombstoned inputs swept) — healed
        by _sweep_manifest_debris at the next maintenance entry;
        legacy journal states from pre-round-8 stores are still
        recovered by _recover_opt_journals first."""
        import math
        import shutil
        import uuid

        path = self.path(name)
        rewritten = 0
        # (entry, sealed names, snapshot inputs, stage dir) per rewritten
        # partition — committed in ONE manifest flip after the loop
        done: list[tuple[str, list[str], list[str], str]] = []
        self._recover_opt_journals(path)
        # leftover stage dirs. Two shapes: legacy pre-round-6
        # directory-swap leftovers (".opt.old"/".opt.tmp" exact), and
        # txn-infixed stage dirs (".{part}.opt.{txn}.tmp") orphaned by
        # a crash OUTSIDE the journaled window — after write.parquet
        # but before the journal commit (nothing references the stage
        # yet), or after os.unlink(jpath) but before shutil.rmtree
        # (transaction complete, stage is garbage). Journal recovery
        # already ran above and removed every stage a journal still
        # references, and optimize() is single-writer under the lease,
        # so any ".opt." stage dir still present here is an orphan.
        for entry in os.listdir(path):
            leftover = os.path.join(path, entry)
            if not entry.startswith("."):
                continue
            # a crash between the journal-tmp write and its atomic
            # os.replace leaves a '.{part}.opt.journal.tmp' FILE no
            # recovery path reads — plain garbage (round-7 kill-point
            # sweep)
            if entry.endswith(".opt.journal.tmp") and os.path.isfile(leftover):
                os.unlink(leftover)
                continue
            if not os.path.isdir(leftover):
                continue
            if entry.endswith(".opt.old"):
                orig = os.path.join(path, entry[1 : -len(".opt.old")])
                if os.path.isdir(orig):
                    shutil.rmtree(leftover)
                else:
                    os.rename(leftover, orig)
            elif ".opt." in entry and entry.endswith(".tmp"):
                shutil.rmtree(leftover)
        # heal crashed manifest transactions: afterwards every on-disk
        # non-dotted file is visible, so the listings below are the
        # visible snapshots
        self._sweep_manifest_debris(name)
        self._ensure_manifest(name)
        for entry in self._part_entries(name):
            part_dir = os.path.join(path, entry)
            files = self._list_parquet(name, entry)
            if len(files) < min_files:
                continue
            n_bytes = sum(
                os.path.getsize(os.path.join(part_dir, f)) for f in files
            )
            n_out = max(1, math.ceil(n_bytes / (target_file_mb * 1024 * 1024)))
            # snapshot read of exactly these files — mergeSchema because
            # a partition can hold files from appends that widened the
            # schema (inferring from one file would rewrite the
            # partition without the other files' columns)
            df = (
                self.spark.read.option("mergeSchema", "true")
                .parquet(*(os.path.join(part_dir, f) for f in files))
            )
            txn = uuid.uuid4().hex
            stage = os.path.join(path, f".{entry}.opt.{txn}.tmp")
            df.repartition(n_out).write.parquet(stage)
            staged = sorted(
                f
                for f in os.listdir(stage)
                if f.endswith(".parquet") and not f.startswith(".")
            )
            # land sealed (invisible); the COMMIT happens once for the
            # whole pass below — one manifest flip per optimize() keeps
            # reader-side snapshot retries rare (a per-partition flip
            # bumped the generation dozens of times per pass and could
            # starve a concurrent reader's stable-pair loop)
            new_names: list[str] = []
            for i, f in enumerate(staged):
                dst = f"{_SEALED}{txn}-{i:05d}.parquet"
                os.rename(os.path.join(stage, f), os.path.join(part_dir, dst))
                new_names.append(dst)
            done.append((entry, new_names, files, stage))
            rewritten += 1
        if done:
            # single atomic commit: every rewritten partition's outputs
            # go live and its inputs tombstone in one manifest replace
            man = self._read_manifest(name) or {
                "gen": 0, "sealed": {}, "retired": {},
            }
            for entry, new_names, files, _stage in done:
                man["sealed"][entry] = new_names
                man["retired"][entry] = sorted(
                    set(man["retired"].get(entry, ()))
                    | {f for f in files if not f.startswith(_SEALED)}
                )
            self._write_manifest(name, man)
            for entry, _new, files, stage in done:
                part_dir = os.path.join(path, entry)
                for f in files:
                    try:
                        os.remove(os.path.join(part_dir, f))
                    except FileNotFoundError:
                        pass
                shutil.rmtree(stage)
            # prune the tombstones now that their files are gone
            self._sweep_manifest_debris(name)
        return rewritten

    # -- continuous aggregates --------------------------------------------

    def _day_fingerprints(self, name: str) -> dict[str, str]:
        """day -> md5 over the sorted (file, size) listing of the day's
        VISIBLE files — changes iff the day's logical layout changed.
        Manifest-aware: maintenance debris (retired/unsealed files) must
        not perturb the fingerprint, or a crashed compact would churn
        rollup refreshes for days whose data never changed."""
        import hashlib

        path = self.path(name)
        man = self._read_manifest(name)
        out: dict[str, str] = {}
        for entry in self._part_entries(name):
            part_dir = os.path.join(path, entry)
            names = self._list_parquet(name, entry)
            if man is not None:
                names = self._visible_in_partition(man, entry, names)
            files = sorted(
                (f, os.path.getsize(os.path.join(part_dir, f)))
                for f in names
                if os.path.exists(os.path.join(part_dir, f))
            )
            sig = hashlib.md5(repr(files).encode()).hexdigest()
            out[entry.split("=", 1)[1]] = sig
        return out

    def refresh_rollup(self, src: str, dst: str, agg, full: bool = False) -> int:
        """Continuous aggregate (the TimescaleDB/hypertable pattern):
        maintain ``dst`` = per-day ``agg`` of ``src``, incrementally.

        ``agg(day_df) -> DataFrame`` aggregates ONE day of raw rows
        (bucket grain must nest within the day). State is a per-day
        fingerprint of ``src``'s data files kept in ``_rollup_state.json``
        under ``dst`` (underscore-prefixed: invisible to scans); a day
        recomputes iff its files changed — new appends, late data,
        compaction rewrites — and a day deleted from the source
        (drop_before / delete_keys) is dropped from the rollup. Returns
        the number of day partitions refreshed or dropped.

        Scale shape: refresh cost is proportional to the DEBT (changed
        days), never the store; each day is one bounded job whose input
        is a single pruned partition read, and days are independent —
        at cluster scale they refresh as parallel batches. The swap is
        the same dot-prefixed per-partition rename discipline as
        optimize(), so readers never see a half-written day and a crash
        at any instant leaves a sweepable state."""
        import json
        import shutil

        src_path = self.path(src)
        dst_path = self.path(dst)
        os.makedirs(dst_path, exist_ok=True)
        state_file = os.path.join(dst_path, "_rollup_state.json")
        # sweep crashed swaps: tmp is an unfinished rewrite (discard);
        # old with its partition present means cleanup was lost (finish),
        # old alone means the crash hit between renames (restore)
        for entry in os.listdir(dst_path):
            leftover = os.path.join(dst_path, entry)
            if not entry.startswith(".") or not os.path.isdir(leftover):
                continue
            if entry.endswith(".ru.tmp"):
                shutil.rmtree(leftover)
            elif entry.endswith(".ru.old"):
                orig = os.path.join(dst_path, entry[1 : -len(".ru.old")])
                if os.path.isdir(orig):
                    shutil.rmtree(leftover)
                else:
                    os.rename(leftover, orig)
        state: dict[str, str] = {}
        if os.path.exists(state_file) and not full:
            with open(state_file) as fh:
                state = json.load(fh)
        current = self._day_fingerprints(src)
        stale = [d for d, sig in current.items() if state.get(d) != sig]
        gone = [d for d in state if d not in current]
        n = 0

        def save_state() -> None:
            tmp = state_file + ".tmp"
            with open(tmp, "w") as fh:
                json.dump(state, fh, sort_keys=True)
            os.replace(tmp, state_file)

        for day in sorted(stale):
            day_df = self.spark.read.option("mergeSchema", "true").parquet(
                os.path.join(src_path, f"{_PART}={day}")
            )
            out = agg(day_df)
            entry = f"{_PART}={day}"
            tmp = os.path.join(dst_path, f".{entry}.ru.tmp")
            out.write.mode("overwrite").parquet(tmp)
            dst_day = os.path.join(dst_path, entry)
            if os.path.isdir(dst_day):
                old = os.path.join(dst_path, f".{entry}.ru.old")
                os.rename(dst_day, old)
                os.rename(tmp, dst_day)
                shutil.rmtree(old)
            else:
                os.rename(tmp, dst_day)
            state[day] = current[day]
            save_state()
            n += 1
        for day in sorted(gone):
            dst_day = os.path.join(dst_path, f"{_PART}={day}")
            if os.path.isdir(dst_day):
                shutil.rmtree(dst_day)
            del state[day]
            save_state()
            n += 1
        self._save_rollup_schema(src, dst_path, agg)
        return n

    def _save_rollup_schema(self, src: str, dst_path: str, agg) -> None:
        """Persist the ROLLUP's schema beside its day partitions (same
        underscore-file mechanism as _save_schema): with zero refreshed
        days — an empty source, or retention that dropped every day —
        the rollup directory has no parquet to infer from, and without
        this file read_rollup dies on schema inference (round-6
        zero-row sweep catch). The schema is derived by running ``agg``
        over an EMPTY frame typed like one source day (source schema
        minus the partition column — exactly what a day read yields),
        plus the partition column itself."""
        import uuid

        from pyspark.sql import types as T

        sp = os.path.join(self.path(src), "_schema.json")
        if not os.path.exists(sp):
            return  # source never appended: nothing to type from
        try:
            with open(sp) as fh:
                src_schema = T.StructType.fromJson(json.load(fh))
        except (OSError, ValueError, KeyError):
            return
        day_fields = [f for f in src_schema.fields if f.name != _PART]
        empty_day = self.spark.createDataFrame([], T.StructType(day_fields))
        roll_schema = T.StructType(
            list(agg(empty_day).schema.fields)
            + [T.StructField(_PART, T.DateType())]
        )
        p = os.path.join(dst_path, "_schema.json")
        tmp = f"{p}.{uuid.uuid4().hex}.tmp"
        with open(tmp, "w") as f:
            f.write(roll_schema.json())
        os.replace(tmp, p)

    def read_rollup(
        self, name: str, start=None, end=None, keep_day: bool = False
    ) -> DataFrame:
        """Read a rollup series; start/end (inclusive, dates) prune to
        the touched day directories before any file opens. A rollup
        with zero day partitions reads as a typed empty frame (the
        _schema.json saved by refresh_rollup — same emptied-store
        fallback as fetch). ``keep_day=True`` retains the day
        partition column."""
        df = self._empty_if_no_parts(name)
        if df is None:
            df = self._read_visible(name)
        if start is not None:
            df = df.filter(F.col(_PART) >= F.to_date(F.lit(start)))
        if end is not None:
            df = df.filter(F.col(_PART) <= F.to_date(F.lit(end)))
        return df if keep_day else df.drop(_PART)

    def changes(self, name: str, since, until=None) -> DataFrame:
        """Change feed: every row INGESTED strictly after ``since`` (and,
        with ``until``, at-or-before it) — the incremental-consumer read
        (a downstream job remembers the ingest watermark it last
        processed and asks only for what landed after). Append-only
        store => the feed is exactly the new rows; the filter is a
        row-level parquet predicate (row groups written by earlier
        appends prune on _ingest_ts min/max stats), and event-time
        partition pruning still applies on top via fetch-style slicing
        if the consumer adds it. Rows from stores predating ingest
        stamping never appear (they predate any watermark).
        Half-open (since, until] so consecutive feeds with
        until=watermark compose without overlap."""
        df = self._read_visible(name, merge_schema=True)
        if _INGEST not in df.columns:
            return df.filter(F.lit(False)).drop(_PART)
        out = df.filter(F.col(_INGEST) > F.lit(since).cast("timestamp"))
        if until is not None:
            out = out.filter(F.col(_INGEST) <= F.lit(until).cast("timestamp"))
        return out.drop(_PART, _INGEST)

    # -- streaming --------------------------------------------------------

    def stream_ingest(self, name: str, stream_df: DataFrame, available_now: bool = True):
        """Continuously ingest a streaming DataFrame into a series via
        foreachBatch append — each micro-batch lands as a blind
        partitioned append (same path as batch ``append``), so the
        store's read-time/compaction dedup semantics apply to streaming
        late data too. Returns the StreamingQuery; with
        ``available_now`` the call blocks until the backlog drains."""
        path_check = self.path(name)  # validate name before starting
        del path_check
        store = self

        def sink(batch_df: DataFrame, batch_id: int) -> None:
            store.append(name, batch_df)

        writer = stream_df.writeStream.foreachBatch(sink)
        if available_now:
            q = writer.trigger(availableNow=True).start()
            q.awaitTermination()
        else:
            q = writer.start()
        return q


    @_leased("delete_keys")
    def delete_keys(self, name: str, key_col: str, keys: Sequence) -> int:
        """Targeted deletion (GDPR/opt-out): remove every row whose
        ``key_col`` is in ``keys``, rewriting ONLY the day partitions
        that actually contain those keys. Discovery is one pruned scan
        (predicate pushes to parquet row-group stats); untouched days
        are never read or rewritten, so takedown cost scales with the
        subject's footprint, not the store size. Returns the number of
        rows deleted.

        Crash safety (round-8 manifest rewrite; the round-3 directory
        swap had a transient whole-day GAP between its two renames):
        the touched days rewrite through the same snapshot-and-seal
        protocol as compact/optimize — stage the kept rows, land them
        sealed (invisible), COMMIT with one atomic manifest replace
        (kept rows live, every snapshot input tombstoned), then delete
        the inputs. A reader sees the pre-delete rows or the post-delete
        rows, exactly, at every instant. Files a concurrent appender
        lands after the snapshot survive untouched (though rows for the
        deleted keys arriving DURING the takedown naturally need the
        next delete_keys pass — takedown pipelines re-run by design).
        Legacy '.del.old' crash states from pre-round-8 stores still
        sweep (restore-or-discard) at entry. Reads with mergeSchema so
        an evolved store's rewritten days keep their later-added
        columns (the compact() lesson)."""
        import shutil as _shutil
        import uuid as _uuid

        path = self.path(name)
        # sweep a crashed pre-round-8 delete: restore-or-discard
        for entry in os.listdir(path):
            leftover = os.path.join(path, entry)
            if not entry.startswith(".") or not os.path.isdir(leftover):
                continue
            if entry.endswith(".del.old"):
                orig = os.path.join(path, entry[1 : -len(".del.old")])
                if os.path.isdir(orig):
                    _shutil.rmtree(leftover)
                else:
                    os.rename(leftover, orig)
        # heal crashed manifest txns and stranded stage dirs (incl. a
        # prior delete_keys' own '.delete.{txn}.tmp' — we hold the
        # lease, so no sibling maintenance is mid-stage), then SNAPSHOT
        # the exact input files — discovery and rewrite read only the
        # snapshot, so a concurrent append is never retired without its
        # rows kept
        self._sweep_compact_leftovers(name, deep=True)
        self._sweep_manifest_debris(name)
        snapshot = {
            e: self._list_parquet(name, e) for e in self._part_entries(name)
        }
        in_files = [
            os.path.join(path, e, f) for e, fs in snapshot.items() for f in fs
        ]
        if not in_files:
            return 0
        df = (
            self.spark.read.option("basePath", path)
            .option("mergeSchema", "true")
            .parquet(*in_files)
        )
        hit = F.col(key_col).isin(list(keys))
        days = [
            r[0]
            for r in df.filter(hit).select(_PART).distinct().collect()
        ]
        if not days:
            return 0
        touched = {f"{_PART}={day}" for day in days}
        sub = df.filter(F.col(_PART).isin(days))
        deleted = sub.filter(hit).count()
        kept = sub.filter(~hit).repartition(F.col(_PART))
        # dot-prefixed like every swap sibling: a non-dotted tmp in the
        # store root would show up in series() as a bogus series
        parent, base = os.path.split(path)
        txn = _uuid.uuid4().hex
        stage = os.path.join(parent, f".{base}.delete.{txn}.tmp")
        kept.write.partitionBy(_PART).parquet(stage)
        self._ensure_manifest(name)
        new_sealed = self._move_staged_sealed(stage, name, txn)
        man = self._read_manifest(name)
        for entry in sorted(touched):
            man["sealed"][entry] = new_sealed.get(entry, [])  # [] = emptied day
            man["retired"][entry] = sorted(
                set(man["retired"].get(entry, ()))
                | {f for f in snapshot.get(entry, ()) if not f.startswith(_SEALED)}
            )
        self._write_manifest(name, man)  # the commit point
        for entry in sorted(touched):
            part_dir = os.path.join(path, entry)
            for f in snapshot.get(entry, ()):
                try:
                    os.remove(os.path.join(part_dir, f))
                except FileNotFoundError:
                    pass
            try:
                os.rmdir(part_dir)  # emptied day: drop the empty dir
            except OSError:
                pass  # still holds kept/appended files — normal
        _shutil.rmtree(stage, ignore_errors=True)
        self._sweep_manifest_debris(name)
        return deleted

    # -- lifecycle --------------------------------------------------------

    @_leased("drop_before")
    def drop_before(self, name: str, cutoff) -> int:
        """Retention: drop whole day partitions older than ``cutoff``
        (a date or 'YYYY-MM-DD' string). Deletion is directory-level —
        no data is read or rewritten, which is what makes retention
        free at 100 TB; the boundary day is KEPT (conservative: only
        partitions strictly before the cutoff date go). Returns the
        number of partitions dropped."""
        import datetime as _dt
        import shutil as _shutil

        if isinstance(cutoff, str):
            cutoff = _dt.date.fromisoformat(cutoff[:10])
        elif isinstance(cutoff, _dt.datetime):
            cutoff = cutoff.date()
        root = self.path(name)
        to_drop = [
            e
            for e in sorted(os.listdir(root))
            if e.startswith(f"{_PART}=")
            and _dt.date.fromisoformat(e.split("=", 1)[1]) < cutoff
        ]
        # prune the manifest FIRST: a sealed file's rmtree mid-flight
        # must never leave a live manifest entry pointing at a deleted
        # file (readers would fail fast on a file we removed on purpose)
        man = self._read_manifest(name)
        if man is not None and to_drop:
            changed = False
            for entry in to_drop:
                if man.get("sealed", {}).pop(entry, None) is not None:
                    changed = True
                if man.get("retired", {}).pop(entry, None) is not None:
                    changed = True
            if changed:
                self._write_manifest(name, man)
        dropped = 0
        for entry in to_drop:
            _shutil.rmtree(os.path.join(root, entry))
            dropped += 1
        return dropped

    def verify(self, name: str) -> DataFrame:
        """Distributed integrity scan of a series' data files.

        Each executor opens the parquet FOOTER of its assigned files
        (pyarrow metadata read — no row-group bytes stream) and reports
        one row per file: (file, ok, n_rows, error). Zero-byte files,
        truncated tails (footer magic missing) and garbage bytes all
        surface with the exact path and the reader's message.

        Why this exists: the engine's fail-fast contract. A corrupt
        file — a crashed EXTERNAL copy tool, a bad disk, a half-synced
        object-store upload (the store's own writers can't leave one:
        appends stage-and-rename, optimize/compact journal) — makes
        fetch() raise rather than silently return less data;
        `spark.sql.files.ignoreCorruptFiles` is never set because
        silently dropping a file IS silent data loss. verify() is the
        operational tool that finds and names the bad files so the
        operator can restore or explicitly delete them.

        Scale shape: the file listing is driver-side metadata (same as
        every scan's file index); footer opens are distributed one
        Arrow batch per ~task via mapInPandas, so a million-file store
        verifies at executor parallelism with O(files) total I/O of a
        few KB each."""
        import pandas as _pd

        root = self.path(name)
        paths = []
        if os.path.isdir(root):
            for dirpath, _dirs, files in os.walk(root):
                for f in files:
                    if f.endswith(".parquet") and not f.startswith((".", "_")):
                        paths.append(os.path.join(dirpath, f))
        pdf = self.spark.createDataFrame(
            [(p,) for p in sorted(paths)], "file string"
        ).repartition(max(1, min(len(paths), 32)))

        def check(batches):
            import pyarrow.parquet as _pq

            for b in batches:
                out = {"file": [], "ok": [], "n_rows": [], "error": []}
                for p in b["file"]:
                    try:
                        md = _pq.read_metadata(p)
                        out["file"].append(p)
                        out["ok"].append(True)
                        out["n_rows"].append(int(md.num_rows))
                        out["error"].append(None)
                    except Exception as ex:  # noqa: BLE001 — report, not raise
                        out["file"].append(p)
                        out["ok"].append(False)
                        out["n_rows"].append(None)
                        out["error"].append(str(ex)[:200])
                yield _pd.DataFrame(out)

        return pdf.mapInPandas(
            check, "file string, ok boolean, n_rows long, error string"
        )
