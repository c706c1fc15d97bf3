"""Local differential harness: Spark query vs DuckDB oracle.

Mirrors (strictly) what the driver's verify does: run queries()[name]
and oracle_sql()[name] on the same sf dir, compare row count, column
set, and order-insensitive values. Our comparison is exact after light
type normalization, so anything green here should hash-match driver-side.
"""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd

from pandas_tsdb_spark.catalog import TABLE_NAMES


def _table_source(sf_dir: str, t: str) -> str:
    """DuckDB source expression for a fixture table under ANY layout:
    single file (the driver's TESTDATA shape), a directory of part
    files (multi-file restage), or a hive-partitioned directory.
    Spark's scan handles all three with the same path; DuckDB needs an
    explicit glob + hive flag."""
    import os

    p = f"{sf_dir}/{t}.parquet"
    if os.path.isdir(p):
        if any("=" in e for e in os.listdir(p)):
            return f"read_parquet('{p}/**/*.parquet', hive_partitioning=1)"
        return f"read_parquet('{p}/*.parquet')"
    return f"read_parquet('{p}')"


def duck_connect(
    sf_dir: str, sanitize_specials: bool = False
) -> duckdb.DuckDBPyConnection:
    """Register the fixture tables as DuckDB views. With
    ``sanitize_specials`` the views mirror the engine's scan contract
    (catalog._MEASURE_DOUBLES: NaN/±Inf in measure doubles -> NULL) so
    a differential over special-injected files tests that the Spark
    normalization reaches every query."""
    from pandas_tsdb_spark.catalog import _MEASURE_DOUBLES

    con = duckdb.connect()
    for t in TABLE_NAMES:
        repl = ""
        if sanitize_specials and t in _MEASURE_DOUBLES:
            parts = ", ".join(
                f"CASE WHEN isnan({c}) OR isinf({c}) THEN NULL ELSE {c} END"
                f" AS {c}"
                for c in _MEASURE_DOUBLES[t]
            )
            repl = f" REPLACE ({parts})"
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT *{repl} FROM {_table_source(sf_dir, t)}"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    out = {}
    for c in sorted(df.columns):
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            if getattr(s.dtype, "tz", None) is not None:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            s = s.astype("datetime64[us]")
        elif s.dtype == object:
            s = s.map(
                lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v
            )
        elif pd.api.types.is_float_dtype(s):
            s = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            s = s.astype("int64") if not s.isna().any() else s.astype("float64")
        elif pd.api.types.is_bool_dtype(s):
            s = s.astype("bool") if not s.isna().any() else s
        out[c] = s.reset_index(drop=True)
    return pd.DataFrame(out)


def _sort_rows(df: pd.DataFrame) -> pd.DataFrame:
    if not len(df.columns):
        return df
    key = df.apply(lambda row: tuple("" if v is None else repr(v) for v in row), axis=1)
    return df.iloc[key.argsort(kind="stable")].reset_index(drop=True)


def compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str) -> list[str]:
    """Return list of mismatch descriptions (empty == pass)."""
    errs: list[str] = []
    if len(spark_pdf) != len(duck_pdf):
        errs.append(f"{name}: row count spark={len(spark_pdf)} duck={len(duck_pdf)}")
    sc, dc = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if sc != dc:
        errs.append(f"{name}: columns spark={sc} duck={dc}")
        return errs
    if errs:
        return errs
    a = _sort_rows(_normalize(spark_pdf))
    b = _sort_rows(_normalize(duck_pdf))
    for c in a.columns:
        av, bv = a[c], b[c]
        # numeric KIND must agree (int vs float): the driver's value hash
        # stringifies, where 44474 != 44474.0
        if av.dtype.kind in "if" and bv.dtype.kind in "if" and av.dtype.kind != bv.dtype.kind:
            errs.append(f"{name}.{c}: dtype kind spark={av.dtype} duck={bv.dtype}")
            continue
        if pd.api.types.is_float_dtype(av) and pd.api.types.is_float_dtype(bv):
            both_nan = av.isna() & bv.isna()
            eq = (av == bv) | both_nan
            if not eq.all():
                diff = (av - bv).abs()
                mx = float(np.nanmax(diff.to_numpy())) if len(diff) else math.nan
                n_bad = int((~eq).sum())
                errs.append(
                    f"{name}.{c}: {n_bad} float mismatches, max abs diff {mx:.3e}"
                )
        else:
            eq = (av == bv) | (av.isna() & bv.isna())
            if not eq.all():
                idx = int((~eq).idxmax())
                errs.append(
                    f"{name}.{c}: {int((~eq).sum())} mismatches, first at row {idx}: "
                    f"spark={av.iloc[idx]!r} duck={bv.iloc[idx]!r}"
                )
    return errs


def run_one(spark, con, spec, sf_dir: str) -> list[str]:
    sdf = spec.builder(spark, sf_dir)
    spark_pdf = sdf.toPandas()
    if spec.oracle is None:
        return [] if len(spark_pdf) >= 0 else [f"{spec.name}: spark query failed"]
    duck_pdf = con.execute(spec.oracle).fetchdf()
    return compare(spark_pdf, duck_pdf, spec.name)
