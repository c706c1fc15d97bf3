"""One-off round-5 sweep: run the 39 never-driver-sampled registry entries
through the local differential harness at sf0.01 (the driver's correctness
scale) so the round-5 sample reordering ships pre-verified."""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as entry_mod  # noqa: E402
from pandas_tsdb_spark.registry import load_all  # noqa: E402
from pandas_tsdb_spark.session import get_spark  # noqa: E402
from tests.harness import duck_connect, run_one  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def main() -> int:
    specs = load_all()
    names = [n for n in entry_mod._ordered_specs() if n not in entry_mod._DRIVER_VERIFIED][:50]
    spark = get_spark()
    con = duck_connect(SF_DIR)
    n_fail = 0
    for name in names:
        t0 = time.time()
        try:
            errs = run_one(spark, con, specs[name], SF_DIR)
        except Exception as exc:  # noqa: BLE001
            errs = [f"{name}: EXCEPTION {type(exc).__name__}: {exc}"]
        dt = time.time() - t0
        kind = "oracled" if specs[name].oracle is not None else "rows-only"
        if errs:
            n_fail += 1
            print(f"FAIL {name} ({kind}, {dt:.1f}s)")
            for e in errs:
                print(f"     {e}")
        else:
            print(f"ok   {name} ({kind}, {dt:.1f}s)")
        sys.stdout.flush()
    print(f"\n{len(names) - n_fail}/{len(names)} pass")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
