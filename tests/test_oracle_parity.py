"""Oracle-parity gate: every registered query with an oracle must match
DuckDB exactly at sf0.001 — a stricter local replica of the driver's t2
check (which runs at sf0.01)."""

from __future__ import annotations

import pytest

from graphragdatapipeline_spark.registry import REGISTRY
from tests.oracle_utils import compare, duckdb_conn

ORACLE_QUERIES = sorted(n for n, q in REGISTRY.items() if q.oracle is not None)
ROWS_ONLY_QUERIES = sorted(n for n, q in REGISTRY.items() if q.oracle is None)


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_conn(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, sf_dir, con, name):
    qd = REGISTRY[name]
    spark_df = qd.fn(spark, sf_dir)
    problems = compare(spark_df, con.sql(qd.oracle))
    assert not problems, f"{name}: " + "; ".join(problems[:6])


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_queries_run(spark, sf_dir, name):
    qd = REGISTRY[name]
    df = qd.fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
