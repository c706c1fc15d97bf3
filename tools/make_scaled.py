#!/usr/bin/env python
"""Regenerate the throughput-bench dataset: N key-shifted copies of the
core tables (events/lineitem/orders/customer) so keys stay unique and
per-key series keep realistic lengths; dims and the text/vector tables
are symlinked unscaled (scaling duplicated texts would manufacture
quadratic near-dup output — see NOTES.md).

Usage: python tools/make_scaled.py [out_dir] [N]
Defaults: /tmp/sfbig 16  (matches BASELINE.md's 16x column)
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

SRC = "/root/testdata/sf0.1"

SCALED = {
    "events": """
        SELECT event_id + i*100000000 AS event_id, ts,
               user_id + i*100000 AS user_id, event_type, value, props
        FROM read_parquet('{src}/events.parquet'), generate_series(0, {n}) t(i)
    """,
    "lineitem": """
        SELECT l_orderkey + i*100000000 AS l_orderkey, l_partkey, l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
               l_returnflag, l_linestatus, l_shipdate
        FROM read_parquet('{src}/lineitem.parquet'), generate_series(0, {n}) t(i)
    """,
    "orders": """
        SELECT o_orderkey + i*100000000 AS o_orderkey,
               o_custkey + i*10000000 AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM read_parquet('{src}/orders.parquet'), generate_series(0, {n}) t(i)
    """,
    "customer": """
        SELECT c_custkey + i*10000000 AS c_custkey, c_name, c_nationkey,
               c_acctbal, c_mktsegment
        FROM read_parquet('{src}/customer.parquet'), generate_series(0, {n}) t(i)
    """,
}

LINKED = ["region", "nation", "supplier", "part", "documents", "embeddings"]


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfbig"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    con = duckdb.connect()
    con.execute(f"SET threads={os.cpu_count()}")
    for t, sql in SCALED.items():
        q = sql.format(src=SRC, n=n - 1)
        con.execute(f"COPY ({q}) TO '{out}/{t}.parquet' (FORMAT PARQUET)")
    for t in LINKED:
        os.symlink(f"{SRC}/{t}.parquet", f"{out}/{t}.parquet")
    for t in list(SCALED) + LINKED:
        c = con.execute(
            f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet')"
        ).fetchone()[0]
        print(t, c)


if __name__ == "__main__":
    main()
