"""Local replica of the driver's Spark-vs-DuckDB comparison.

Sorts columns by name, sorts rows by every column, and compares values
exactly — stricter than a hash, so anything passing here should pass
the driver's value-hash gate."""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("string")
        elif df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: ",".join(map(str, v)) if isinstance(v, (list, tuple)) else v
            )
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(spark_df, oracle_df: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty == match)."""
    sp = _canon(spark_df.toPandas())
    oc = _canon(oracle_df)
    problems: list[str] = []
    if list(sp.columns) != list(oc.columns):
        problems.append(f"columns differ: spark={list(sp.columns)} oracle={list(oc.columns)}")
        return problems
    if len(sp) != len(oc):
        problems.append(f"row count differs: spark={len(sp)} oracle={len(oc)}")
        return problems
    for c in sp.columns:
        a, b = sp[c], oc[c]
        for i in range(len(a)):
            x, y = a.iloc[i], b.iloc[i]
            xnull = x is None or (isinstance(x, float) and math.isnan(x)) or x is pd.NA
            ynull = y is None or (isinstance(y, float) and math.isnan(y)) or y is pd.NA
            if xnull and ynull:
                continue
            if xnull != ynull or not _eq(x, y):
                problems.append(f"col {c} row {i}: spark={x!r} oracle={y!r}")
                if len(problems) > 5:
                    return problems
    return problems


def _eq(x, y) -> bool:
    if isinstance(x, float) or isinstance(y, float):
        try:
            return float(x) == float(y)
        except (TypeError, ValueError):
            return False
    return str(x) == str(y)
