"""Data-quality checks (SURVEY §2.12, Q1–Q5 — reference
defs/checks.py:14-159). Each check is one aggregation returning
(check_name, passed, observed) so a pipeline gate is a single
collect of a small frame."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _result(df: DataFrame, name: str, passed: F.Column, observed: F.Column) -> DataFrame:
    return df.agg(
        F.lit(name).alias("check_name"),
        passed.alias("passed"),
        observed.cast("string").alias("observed"),
    )


def check_no_nulls(df: DataFrame, cols: list[str], name: str = "no_nulls") -> DataFrame:
    """Q1/Q4/Q5 — zero nulls in key columns (checks.py:14-53,119-159)."""
    n_bad = None
    for c in cols:
        term = F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
        n_bad = term if n_bad is None else n_bad + term
    return _result(df, name, n_bad == 0, n_bad)


def check_no_duplicates(df: DataFrame, cols: list[str], name: str = "no_duplicates") -> DataFrame:
    """Q1 — zero duplicate keys (checks.py:32-41)."""
    dups = (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.sum(F.when(F.col("n") > 1, F.col("n")).otherwise(0)).alias("d"))
    )
    return dups.select(
        F.lit(name).alias("check_name"),
        (F.col("d") == 0).alias("passed"),
        F.col("d").cast("string").alias("observed"),
    )


def check_completeness_ratio(
    df: DataFrame, predicate: F.Column, min_ratio: float, name: str = "completeness"
) -> DataFrame:
    """Q2 — share of rows satisfying a predicate ≥ threshold
    (checks.py:56-86)."""
    ratio = F.avg(F.when(predicate, 1.0).otherwise(0.0))
    return _result(df, name, ratio >= min_ratio, ratio)


def check_ratio_per_key(
    df: DataFrame, key_col: str, min_ratio: float, name: str = "rows_per_key"
) -> DataFrame:
    """Q3 — count(*)/countDistinct(key) ≥ threshold (checks.py:89-116)."""
    ratio = F.count(F.lit(1)) / F.countDistinct(key_col)
    return _result(df, name, ratio >= min_ratio, ratio)


def run_checks(checks: list[DataFrame]) -> DataFrame:
    """Union all check frames into one gate table."""
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out
