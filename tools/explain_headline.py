#!/usr/bin/env python
"""Dump .explain("formatted") for headline queries to plans/<tag>/.

Usage:
    python tools/explain_headline.py <tag> [suffix] [query ...]

Writes plans/<tag>/<query>_<suffix>.txt (suffix defaults to "before").
With no query list, dumps every headline query. Streaming queries
(micro-batch) cannot be explained statically; they get the batch twin
shape note instead.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r09"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    only = set(sys.argv[3:])

    from bench import HEADLINE
    from pandas_tsdb_spark.registry import load_all
    from pandas_tsdb_spark.session import get_spark

    out_dir = os.path.join(REPO, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("explain-headline")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()
    for label, key in HEADLINE.items():
        if only and label not in only and key not in only:
            continue
        path = os.path.join(out_dir, f"{label}_{suffix}.txt")
        try:
            df = specs[key].builder(spark, SF_DIR)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as e:  # streaming plans raise on explain
            text = f"(unavailable: {type(e).__name__}: {e})\n"
        with open(path, "w") as f:
            f.write(f"# {label} ({key}) @ {SF_DIR}\n")
            f.write(text)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
