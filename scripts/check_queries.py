#!/usr/bin/env python
"""Targeted oracle check: run named registry queries at a fixture dir
and hash-compare against their DuckDB oracles (driver methodology).

Usage: python scripts/check_queries.py [--sf DIR] query [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests"))

from pyspark.sql import SparkSession  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    if args and args[0] == "--sf":
        sf_dir = args[1]
        args = args[2:]
    from graphragdatapipeline_spark.registry import REGISTRY
    from oracle_utils import compare, duckdb_conn

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("check-queries")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb_conn(sf_dir)
    bad = 0
    for name in args:
        qd = REGISTRY[name]
        sdf = qd.fn(spark, sf_dir)
        if qd.oracle is None:
            print(f"{name}: no oracle, rows={sdf.count()}", flush=True)
            continue
        p = compare(sdf, con.sql(qd.oracle))
        if p:
            bad += 1
            print(f"{name}: MISMATCH {p[:3]}", flush=True)
        else:
            print(f"{name}: OK", flush=True)
    print("TOTAL_MISMATCHES:", bad, flush=True)
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
