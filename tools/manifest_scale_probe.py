#!/usr/bin/env python
"""Round-9 verdict #4 evidence: the sharded manifest's METADATA cost at
large partition counts, measured on disk (no Spark jobs in the hot
path being measured — this probes the pure manifest layer).

For N maintained partitions (N = 256 / 1024 / 4096 day dirs, each with
one sealed file listed):
  commit_touch1      seconds to _write_manifest after mutating ONE
                     partition's entry (O(touched): 1 shard + root)
  commit_full        seconds for a from-scratch commit writing all N
                     shards (the first-maintenance worst case)
  resolve_pruned     seconds for _read_manifest(partitions=[7 days])
                     (opens 7 shard files + root)
  resolve_full       seconds for a full resolution (N shards)
  root_bytes         size of the root pointer file
  shard_bytes_total  on-disk bytes of all shard files

Usage: python tools/manifest_scale_probe.py [out.json]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


class _NoSpark:
    pass


def probe(n_parts: int) -> dict:
    from pandas_tsdb_spark.store import TsStore

    root = tempfile.mkdtemp(prefix="tsdb_manprobe_")
    store = TsStore(_NoSpark(), root, manifest_shard_after=64)
    name = "events"
    os.makedirs(store.path(name))
    man = {"gen": 0, "sealed": {}, "retired": {}}
    base = 719000  # proleptic ordinal near 1970
    import datetime as dt

    entries = [
        f"_date={dt.date.fromordinal(base + i).isoformat()}"
        for i in range(n_parts)
    ]
    for i, e in enumerate(entries):
        man["sealed"][e] = [f"sealed-{i:08d}-00000.parquet"]

    t0 = time.perf_counter()
    store._write_manifest(name, man)
    commit_full = time.perf_counter() - t0

    # touch ONE partition and re-commit
    man = store._read_manifest(name)
    man["sealed"][entries[0]] = ["sealed-NEW-00000.parquet"]
    t0 = time.perf_counter()
    store._write_manifest(name, man)
    commit_touch1 = time.perf_counter() - t0

    t0 = time.perf_counter()
    pruned = store._read_manifest(name, partitions=entries[:7])
    resolve_pruned = time.perf_counter() - t0
    assert len(pruned["sealed"]) == 7

    t0 = time.perf_counter()
    full = store._read_manifest(name)
    resolve_full = time.perf_counter() - t0
    assert len(full["sealed"]) == n_parts

    root_bytes = os.path.getsize(store._manifest_file(name))
    sd = store._shard_dir(name)
    shard_bytes = sum(
        os.path.getsize(os.path.join(sd, f)) for f in os.listdir(sd)
    )
    shutil.rmtree(root, ignore_errors=True)
    return {
        "n_parts": n_parts,
        "commit_full_s": round(commit_full, 4),
        "commit_touch1_s": round(commit_touch1, 4),
        "resolve_pruned7_s": round(resolve_pruned, 5),
        "resolve_full_s": round(resolve_full, 4),
        "root_bytes": root_bytes,
        "shard_bytes_total": shard_bytes,
    }


def main() -> int:
    out = [probe(n) for n in (256, 1024, 4096)]
    for r in out:
        print(r, file=sys.stderr)
    payload = json.dumps(out)
    print(payload)
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            f.write(payload)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
