"""Mergeable-sketch properties: the storable/composable contract that
distinguishes HLL sketch columns from approx_count_distinct — daily
sketches must roll up to ANY coarser window without rescanning raw
rows, and merging must be order-insensitive."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphragdatapipeline_spark.io import read_table


def test_hll_daily_sketches_merge_to_global(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    merged = daily.agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
    direct = ev.agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est"))
    assert merged.first().est == direct.first().est
    # merge is order/partitioning-insensitive: shuffled daily table
    # unions to the same estimate
    merged2 = (
        daily.repartition(7)
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .first()
        .est
    )
    assert merged2 == merged.first().est
    # a partial range (first half of the days) estimates a subset —
    # never more than the global estimate
    days = sorted(r.day for r in daily.select("day").collect())
    cut = days[len(days) // 2]
    part = (
        daily.filter(F.col("day") <= F.lit(cut))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .first()
        .est
    )
    assert part <= merged.first().est
