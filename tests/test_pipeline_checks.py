"""Pipeline runner + quality-gate tests: a 3-stage DAG over the
fixtures with partitioned output and a failing-check scenario."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphragdatapipeline_spark import checks as ck
from graphragdatapipeline_spark.io import read_table
from graphragdatapipeline_spark.pipeline import CheckFailure, Pipeline, Stage


def test_pipeline_topological_run(spark, sf_dir, tmp_path):
    def load_orders(s, cat):
        return read_table(s, sf_dir, "orders").withColumn(
            "order_year", F.year("o_orderdate")
        )

    def load_lineitem(s, cat):
        return read_table(s, sf_dir, "lineitem")

    def order_rollup(s, cat):
        o, li = cat["orders_enriched"], cat["lineitem_raw"]
        agg = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n_lines"))
        return o.join(agg, o.o_orderkey == agg.l_orderkey, "left").select(
            "o_orderkey", "o_custkey", "order_year", F.coalesce("n_lines", F.lit(0)).alias("n_lines")
        )

    pipe = Pipeline(
        warehouse=str(tmp_path / "wh"),
        stages=[
            # intentionally out of topological order — runner must sort
            Stage(
                name="order_rollup",
                fn=order_rollup,
                deps=["orders_enriched", "lineitem_raw"],
                checks=[
                    lambda df: ck.check_no_nulls(df, ["o_orderkey"], "rollup_keys"),
                    lambda df: ck.check_no_duplicates(df, ["o_orderkey"], "rollup_unique"),
                ],
            ),
            Stage(name="orders_enriched", fn=load_orders, partition_by=["order_year"]),
            Stage(name="lineitem_raw", fn=load_lineitem),
        ],
    )
    results = pipe.run(spark)
    assert set(results) == {"orders_enriched", "lineitem_raw", "order_rollup"}
    out = spark.read.parquet(results["order_rollup"])
    assert out.count() == read_table(spark, sf_dir, "orders").count()
    # partitioned layout exists (decade-partition analog)
    import os

    years = [p for p in os.listdir(results["orders_enriched"]) if p.startswith("order_year=")]
    assert len(years) >= 2


def test_pipeline_check_failure_raises(spark, sf_dir, tmp_path):
    def bad_stage(s, cat):
        return read_table(s, sf_dir, "orders").withColumn(
            "o_orderkey", F.lit(None).cast("long")
        )

    pipe = Pipeline(
        warehouse=str(tmp_path / "wh2"),
        stages=[
            Stage(
                name="bad",
                fn=bad_stage,
                checks=[lambda df: ck.check_no_nulls(df, ["o_orderkey"], "keys")],
            )
        ],
    )
    with pytest.raises(CheckFailure):
        pipe.run(spark)


def test_pipeline_cycle_detection(spark, tmp_path):
    pipe = Pipeline(
        warehouse=str(tmp_path / "wh3"),
        stages=[
            Stage(name="a", fn=lambda s, c: None, deps=["b"]),
            Stage(name="b", fn=lambda s, c: None, deps=["a"]),
        ],
    )
    with pytest.raises(ValueError, match="cycle"):
        pipe.run(spark)
