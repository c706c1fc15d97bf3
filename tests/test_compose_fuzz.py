"""Compositional plan fuzzing: random operator PIPELINES vs DuckDB.

The 222 oracled differentials each exercise ONE operator shape; real
workloads compose them, and composition is where engines disagree in
ways no per-op test sees (filter pushed through a join changing null
semantics, partial aggregation after a projection that renamed the key,
limit-after-sort interacting with a distinct upstream...). This fuzzer
generates seeded random pipelines — filter / project / FK join /
groupBy-agg / distinct / rank-window / union-intersect-except branches
/ sort+limit — over the TPC-H core tables and renders each pipeline
TWICE from the same AST: once as a Spark DataFrame chain (the engine's
native construction path — the same API the registry builders use) and
once as nested DuckDB SQL. Results must match exactly under the
harness comparator.

Determinism doctrine (same as the registry):
- numeric aggregates are exact: count(*), integer-cents sums
  (sum2_col / oracle_sum2), min/max of raw parquet values (bit-identical
  in both engines, no accumulation);
- LIMIT is always preceded by ORDER BY over ALL output columns with
  explicit NULLS FIRST (matching Spark's asc default), so the selected
  prefix is deterministic as a multiset (ties are identical rows);
- events participates through a day-bucketed projection (floor to a
  whole-second boundary commutes with the ns->us scan truncation)
  plus per-series window ops ordered on event_id — raw ns ts never
  enters a comparison;
- modulo predicates on integer keys give scale-independent selectivity
  without hardcoding value domains.

Seeds 0..11 run in the fast tier; 12..299 plus an sf0.1 tier under
-m sweep.
"""

from __future__ import annotations

import random

import pytest

from pandas_tsdb_spark.registry import oracle_sum2, sum2_col

SF = "/root/testdata/sf0.01"

# (name, kind) per base table; kind drives predicate/agg choice.
# int: exact integer key/counter; cents: 2-decimal double (raw values
# bit-identical in parquet); cat: low-cardinality string; date:
# midnight-only timestamp[ms].
COLS = {
    "lineitem": [
        ("l_orderkey", "int"), ("l_partkey", "int"), ("l_suppkey", "int"),
        ("l_linenumber", "int"), ("l_quantity", "cents"),
        ("l_extendedprice", "cents"), ("l_discount", "cents"),
        ("l_tax", "cents"), ("l_returnflag", "cat"), ("l_linestatus", "cat"),
        ("l_shipdate", "date"),
    ],
    "orders": [
        ("o_orderkey", "int"), ("o_custkey", "int"),
        ("o_totalprice", "cents"), ("o_orderstatus", "cat"),
        ("o_orderdate", "date"), ("o_orderpriority", "cat"),
    ],
    "customer": [
        ("c_custkey", "int"), ("c_nationkey", "int"),
        ("c_acctbal", "cents"), ("c_mktsegment", "cat"),
    ],
    # events is the time-series table; raw ns-precision ts never enters
    # a pipeline — the base projects it to a whole-day bucket (floor to
    # a whole-second boundary commutes with Spark's ns->us scan
    # truncation, so both engines bucket identically), and window order
    # keys on event_id, which is strictly monotone with ts (verified:
    # zero inversions under ORDER BY ts, event_id).
    "events": [
        ("event_id", "int"), ("user_id", "int"), ("event_type", "cat"),
        ("value", "cents"), ("day", "date"),
    ],
}
CAT_DOMAIN = {
    "l_returnflag": ["A", "N", "R"],
    "l_linestatus": ["F", "O"],
    "o_orderstatus": ["P", "O", "F"],
    "o_orderpriority": [
        "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW",
    ],
    "c_mktsegment": [
        "AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY",
    ],
    "event_type": ["click", "error", "purchase", "signup", "view"],
}
DATE_PIVOTS = {
    "l_shipdate": ("1996-03-01", "1998-09-01", "2000-06-01"),
    "o_orderdate": ("1996-01-01", "1998-06-01", "2000-01-01"),
    "day": ("2024-01-05", "2024-01-15", "2024-01-25"),
}
CENTS_PIVOTS = {
    "l_quantity": (10.0, 25.0, 40.0),
    "l_extendedprice": (20000.0, 50000.0),
    "l_discount": (0.03, 0.06),
    "l_tax": (0.02, 0.05),
    "o_totalprice": (50000.0, 150000.0),
    "c_acctbal": (0.0, 4500.0),
    "value": (50.0, 200.0),
}
# one-hop FK joins available while the left key column survives
JOIN_MAP = {
    "lineitem": ("orders", "l_orderkey", "o_orderkey"),
    "orders": ("customer", "o_custkey", "c_custkey"),
}


class Rel:
    """One pipeline state: a Spark DataFrame, the equivalent SQL text,
    and the live schema (name, kind) list."""

    def __init__(self, df, sql, cols):
        self.df, self.sql, self.cols = df, sql, list(cols)

    def kinds(self, *wanted):
        return [c for c, k in self.cols if k in wanted]


def _base(spark, rng: random.Random, sf: str) -> tuple[Rel, str]:
    from pyspark.sql import functions as F

    t = rng.choice(list(COLS))
    df = spark.read.parquet(f"{sf}/{t}.parquet")
    if t == "events":
        df = df.select(
            "event_id", "user_id", "event_type", "value",
            F.date_trunc("day", "ts").alias("day"),
        )
        sql = (
            "SELECT event_id, user_id, event_type, value, "
            f"date_trunc('day', ts) AS day FROM read_parquet('{sf}/{t}.parquet')"
        )
        return Rel(df, sql, COLS[t]), t
    return Rel(df, f"SELECT * FROM read_parquet('{sf}/{t}.parquet')", COLS[t]), t


def _op_filter(rel: Rel, rng: random.Random) -> Rel:
    from pyspark.sql import functions as F

    c, k = rng.choice(rel.cols)
    if k == "int":
        m, r = rng.randint(2, 13), 0
        r = rng.randint(0, m - 1)
        cond_df = (F.col(c) % m) <= r
        cond_sql = f"(({c} % {m}) <= {r})"
    elif k == "cat":
        dom = CAT_DOMAIN[c]
        sub = rng.sample(dom, rng.randint(1, len(dom)))
        cond_df = F.col(c).isin(sub)
        vals = ", ".join(f"'{v}'" for v in sub)
        cond_sql = f"({c} IN ({vals}))"
    elif k == "date":
        # derived min_/max_ date columns share the source column's pivots
        src = c.split("_", 1)[1] if c[:4] in ("min_", "max_") else c
        p = rng.choice(DATE_PIVOTS.get(src) or DATE_PIVOTS["o_orderdate"])
        if rng.random() < 0.5:
            cond_df = F.col(c) >= F.lit(p).cast("timestamp")
            cond_sql = f"({c} >= TIMESTAMP '{p} 00:00:00')"
        else:
            cond_df = F.col(c) < F.lit(p).cast("timestamp")
            cond_sql = f"({c} < TIMESTAMP '{p} 00:00:00')"
    else:  # cents
        # derived columns (integer-cents sums) get generic thresholds
        p = rng.choice(CENTS_PIVOTS.get(c, (0.0, 100.0, 10000.0)))
        if rng.random() < 0.5:
            cond_df, cond_sql = F.col(c) <= p, f"({c} <= {p})"
        else:
            cond_df, cond_sql = F.col(c) > p, f"({c} > {p})"
    return Rel(
        rel.df.filter(cond_df),
        f"SELECT * FROM ({rel.sql}) t WHERE {cond_sql}",
        rel.cols,
    )


def _op_project(rel: Rel, rng: random.Random, tag: int) -> Rel:
    """``tag`` (the pipeline step index) makes computed-column names
    unique: Spark tolerates duplicate output names (until a later
    reference is ambiguous) while DuckDB silently renames the second
    one to ``x_1`` — a renderer divergence, not an engine one."""
    from pyspark.sql import functions as F

    keep = rng.sample(rel.cols, rng.randint(1, len(rel.cols)))
    exprs_df = [F.col(c) for c, _ in keep]
    exprs_sql = [c for c, _ in keep]
    cols = list(keep)
    ints = rel.kinds("int")
    if ints and rng.random() < 0.6:
        a = rng.choice(ints)
        m = rng.randint(3, 9)
        exprs_df.append((F.col(a) % m).alias(f"x_mod{tag}"))
        exprs_sql.append(f"({a} % {m}) AS x_mod{tag}")
        cols.append((f"x_mod{tag}", "int"))
    if len(ints) >= 2 and rng.random() < 0.4:
        a, b = rng.sample(ints, 2)
        exprs_df.append((F.col(a) + F.col(b)).alias(f"x_sum{tag}"))
        exprs_sql.append(f"({a} + {b}) AS x_sum{tag}")
        cols.append((f"x_sum{tag}", "int"))
    return Rel(
        rel.df.select(*exprs_df),
        f"SELECT {', '.join(exprs_sql)} FROM ({rel.sql}) t",
        cols,
    )


def _op_join(rel: Rel, spark, base: str, rng: random.Random, sf: str) -> Rel | None:
    from pyspark.sql import functions as F

    hop = JOIN_MAP.get(base)
    if hop is None:
        return None
    t2, lk, rk = hop
    if lk not in [c for c, _ in rel.cols]:
        return None  # key projected away
    right = spark.read.parquet(f"{sf}/{t2}.parquet")
    how = rng.choice(["inner", "left"])
    joined = rel.df.join(right, F.col(lk) == F.col(rk), how)
    sql_how = {"inner": "JOIN", "left": "LEFT JOIN"}[how]
    sql = (
        f"SELECT * FROM ({rel.sql}) a {sql_how} "
        f"read_parquet('{sf}/{t2}.parquet') b ON a.{lk} = b.{rk}"
    )
    return Rel(joined, sql, rel.cols + COLS[t2])


def _op_groupby(rel: Rel, rng: random.Random) -> Rel | None:
    from pyspark.sql import functions as F

    groupable = rel.kinds("cat", "date", "int")
    numeric = rel.kinds("cents", "int")
    if not groupable:
        return None
    keys = rng.sample(groupable, min(len(groupable), rng.randint(1, 2)))
    kinds = dict(rel.cols)
    aggs_df = [F.count(F.lit(1)).alias("cnt")]
    aggs_sql = ["count(*) AS cnt"]
    cols = [(k, kinds[k]) for k in keys] + [("cnt", "int")]
    for c in rng.sample(numeric, min(len(numeric), 2)):
        if kinds[c] == "cents":
            aggs_df.append(sum2_col(c).alias(f"s_{c}"))
            aggs_sql.append(f"{oracle_sum2(c)} AS s_{c}")
            cols.append((f"s_{c}", "cents"))
        else:
            fn = rng.choice(["min", "max"])
            aggs_df.append(getattr(F, fn)(c).alias(f"{fn}_{c}"))
            aggs_sql.append(f"{fn}({c}) AS {fn}_{c}")
            cols.append((f"{fn}_{c}", "int"))
    return Rel(
        rel.df.groupBy(*keys).agg(*aggs_df),
        f"SELECT {', '.join(keys + aggs_sql)} FROM ({rel.sql}) t "
        f"GROUP BY {', '.join(keys)}",
        cols,
    )


def _op_distinct(rel: Rel, rng: random.Random) -> Rel | None:
    from pyspark.sql import functions as F

    low_card = rel.kinds("cat")
    if not low_card:
        return None
    keep = rng.sample(low_card, rng.randint(1, len(low_card)))
    kinds = dict(rel.cols)
    return Rel(
        rel.df.select(*[F.col(c) for c in keep]).distinct(),
        f"SELECT DISTINCT {', '.join(keep)} FROM ({rel.sql}) t",
        [(c, kinds[c]) for c in keep],
    )


def _op_window(rel: Rel, rng: random.Random, tag: int) -> Rel | None:
    """rank()/dense_rank() over a categorical partition: unlike
    row_number, both are TIE-STABLE (equal sort keys share a rank), so
    the value is deterministic without a unique tie-break column.
    Explicit null placement on both sides (Spark asc defaults nulls
    first, DuckDB ASC defaults NULLS LAST — they disagree silently)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    cats = rel.kinds("cat")
    nums = rel.kinds("int", "cents")
    if not cats or not nums:
        return None
    part, val = rng.choice(cats), rng.choice(nums)
    fn = rng.choice(["rank", "dense_rank"])
    name = f"w_{fn}{tag}"
    if rng.random() < 0.5:
        order_df, order_sql = F.col(val).asc_nulls_first(), "ASC NULLS FIRST"
    else:
        order_df, order_sql = F.col(val).desc_nulls_last(), "DESC NULLS LAST"
    w = Window.partitionBy(part).orderBy(order_df)
    return Rel(
        rel.df.withColumn(name, getattr(F, fn)().over(w)),
        f"SELECT *, {fn}() OVER (PARTITION BY {part} ORDER BY {val} "
        f"{order_sql}) AS {name} FROM ({rel.sql}) t",
        rel.cols + [(name, "int")],
    )


def _op_ts_window(rel: Rel, rng: random.Random, tag: int) -> Rel | None:
    """The time-series window core, composed: running integer-cents sum,
    lag/lead of the raw value, or row_number — each over
    (PARTITION BY user_id ORDER BY event_id). event_id is a total order
    per series (strictly monotone with ts), so every variant is exactly
    deterministic; the cumsum accumulates bigint cents, which both
    engines fold identically at any length."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    have = [c for c, _ in rel.cols]
    if "user_id" not in have or "event_id" not in have:
        return None
    w = Window.partitionBy("user_id").orderBy("event_id")
    kind = rng.choice(
        ["cumsum", "lag", "lead", "row_number"] if "value" in have
        else ["row_number"]
    )
    over = "OVER (PARTITION BY user_id ORDER BY event_id"
    if kind == "cumsum":
        name = f"w_cum{tag}"
        col = F.sum(F.round(F.col("value") * 100).cast("long")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        # CAST the outer sum: DuckDB's sum(BIGINT) widens to HUGEINT,
        # which fetchdf() hands to pandas as float64 — a dtype-kind
        # mismatch vs Spark's LongType, not a value difference.
        frag = (
            f"CAST(sum(CAST(round(value * 100) AS BIGINT)) {over} "
            f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)"
            f" AS {name}"
        )
    elif kind in ("lag", "lead"):
        n = rng.randint(1, 3)
        name = f"w_{kind}{tag}"
        col = getattr(F, kind)("value", n).over(w)
        frag = f"{kind}(value, {n}) {over}) AS {name}"
    else:
        name = f"w_rn{tag}"
        col = F.row_number().over(w)
        frag = f"row_number() {over}) AS {name}"
    out_kind = "cents" if kind in ("lag", "lead") else "int"
    return Rel(
        rel.df.withColumn(name, col),
        f"SELECT *, {frag} FROM ({rel.sql}) t",
        rel.cols + [(name, out_kind)],
    )


def _op_setop(rel: Rel, rng: random.Random) -> Rel:
    """Two independently-filtered branches of the SAME relation,
    recombined: UNION ALL (rows matching both appear twice), INTERSECT
    (distinct semantics in both engines), or EXCEPT ALL (multiset
    difference — Spark exceptAll)."""
    b1, b2 = _op_filter(rel, rng), _op_filter(rel, rng)
    kind = rng.choice(["union_all", "intersect", "except_all"])
    if kind == "union_all":
        df = b1.df.unionByName(b2.df)
        sql = f"({b1.sql}) UNION ALL ({b2.sql})"
    elif kind == "intersect":
        df = b1.df.intersect(b2.df)
        sql = f"({b1.sql}) INTERSECT ({b2.sql})"
    else:
        df = b1.df.exceptAll(b2.df)
        sql = f"({b1.sql}) EXCEPT ALL ({b2.sql})"
    return Rel(df, sql, rel.cols)


def _op_sort_limit(rel: Rel, rng: random.Random) -> Rel:
    from pyspark.sql import functions as F

    n = rng.choice([7, 50, 300])
    order_df, order_sql = [], []
    for c, _ in rel.cols:
        if rng.random() < 0.5:
            order_df.append(F.col(c).asc_nulls_first())
            order_sql.append(f"{c} ASC NULLS FIRST")
        else:
            order_df.append(F.col(c).desc_nulls_last())
            order_sql.append(f"{c} DESC NULLS LAST")
    return Rel(
        rel.df.orderBy(*order_df).limit(n),
        f"SELECT * FROM ({rel.sql}) t ORDER BY {', '.join(order_sql)} LIMIT {n}",
        rel.cols,
    )


def build_pipeline(spark, seed: int, sf: str = SF) -> Rel:
    rng = random.Random(seed)
    rel, base = _base(spark, rng, sf)
    n_steps = rng.randint(1, 5)
    grouped = False
    joined = False
    for step in range(n_steps):
        roll = rng.random()
        if roll < 0.30:
            rel = _op_filter(rel, rng)
        elif roll < 0.45:
            rel = _op_project(rel, rng, step)
        elif roll < 0.58 and not joined and not grouped:
            nxt = _op_join(rel, spark, base, rng, sf)
            if nxt is not None:
                rel, joined = nxt, True
        elif roll < 0.72 and not grouped:
            nxt = _op_groupby(rel, rng)
            if nxt is not None:
                rel, grouped = nxt, True
        elif roll < 0.80:
            nxt = _op_ts_window(rel, rng, step) if base == "events" else None
            if nxt is None:
                nxt = _op_window(rel, rng, step)
            if nxt is not None:
                rel = nxt
        elif roll < 0.88:
            rel = _op_setop(rel, rng)
        elif not grouped:
            nxt = _op_distinct(rel, rng)
            if nxt is not None:
                rel, grouped = nxt, True
    if rng.random() < 0.4:
        rel = _op_sort_limit(rel, rng)
    return rel


def _run(spark, seed: int, sf: str = SF) -> None:
    import duckdb

    from tests.harness import compare

    rel = build_pipeline(spark, seed, sf)
    sp = rel.df.toPandas()
    du = duckdb.connect().execute(rel.sql).fetchdf()
    errs = compare(sp, du, f"compose_seed{seed}")
    assert not errs, (errs[:5], rel.sql)


@pytest.mark.parametrize("seed", range(12))
def test_compose_smoke(spark, seed):
    """Fast-tier subset: 12 seeded pipelines."""
    _run(spark, seed)


@pytest.mark.sweep
@pytest.mark.parametrize("seed", range(12, 300))
def test_compose_sweep(spark, seed):
    """Sweep tier: 288 more seeded pipelines."""
    _run(spark, seed)


@pytest.mark.sweep
@pytest.mark.parametrize("seed", range(24))
def test_compose_sf01(spark, seed):
    """The same pipeline generator at sf0.1 — 10x the rows through
    every generated plan, catching anything whose agreement with the
    oracle was an artifact of small data (float accumulation spans,
    single-row-group scans, broadcast-everything plans)."""
    _run(spark, seed, "/root/testdata/sf0.1")


# md5(sql with the sf-dir normalized to {SF}) per seed — pinned so that
# any generator change that silently re-maps seeds to different
# pipelines is caught here: BASELINE.md's "composed pipelines at 256x"
# A/B table is keyed by these seeds, so a drifted generator would make
# that recorded evidence irreproducible. Deliberate generator changes
# are fine — update the pins AND re-run tools/compose_scale_ab.py,
# replacing the BASELINE table (as done when the events tier landed).
_PINNED_SQL_MD5 = {
    0: "f2a36486801f", 1: "4eaca53a4a5c", 2: "72a32aaf6f51",
    3: "55c457f5b20f", 4: "3b2dcdbd4979", 5: "7610906d676f",
    6: "cefc9fee001a", 7: "081ca1e571aa", 8: "b07204284746",
    9: "6748d1929405", 10: "b0aa42b83ec4", 11: "43481fbc6595",
    12: "ffd4700da66a", 13: "26d192e51eea", 14: "f69f1ec7856c",
    15: "38f1614d60cf", 16: "c78f48265e8d", 17: "a438f51dd2d3",
    18: "241d3abd6431", 19: "c4fc722aa174", 20: "f21beb53e10e",
    21: "abec00158995", 22: "b3c5bd567b35", 23: "36ae6f1695d9",
}


def test_generator_is_stable(spark):
    """Seed -> pipeline mapping must not drift silently (see pin note)."""
    import hashlib

    for seed, want in _PINNED_SQL_MD5.items():
        rel = build_pipeline(spark, seed, SF)
        got = hashlib.md5(
            rel.sql.replace(SF, "{SF}").encode()
        ).hexdigest()[:12]
        assert got == want, (
            f"seed {seed}: generator drifted ({got} != {want}) — update "
            "_PINNED_SQL_MD5 and re-run tools/compose_scale_ab.py, "
            "replacing BASELINE.md's composed-pipeline A/B table"
        )
