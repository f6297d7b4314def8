#!/usr/bin/env python
"""Stage-by-stage wall profile of graphrag_end_to_end at a fixture dir
(bench session shape). Times each pipeline prefix with the noop sink so
the delta between consecutive rows is that stage's marginal cost.
Checkpointed stages (ER, LPA-internal) are timed where the
materialization actually happens.

Usage: python scripts/profile_graphrag_e2e.py [SF_DIR]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from graphragdatapipeline_spark.graph import algorithms as ga
    from graphragdatapipeline_spark.graph.entities import resolve_entities
    from graphragdatapipeline_spark.io import read_table
    from graphragdatapipeline_spark.operators import relational as _rel
    from graphragdatapipeline_spark.session import get_session

    spark = get_session(
        "profile-graphrag", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    spark.sparkContext.setLogLevel("ERROR")
    read_table(spark, sf_dir, "part").count()

    def tick(label, fn):
        spark.sparkContext.setJobDescription(label)
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        print(f"{label}: {dt:.3f}s", flush=True)
        spark.sparkContext.setJobDescription(None)
        return out

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    part = read_table(spark, sf_dir, "part").select(
        "p_partkey", "p_name", "p_brand", "p_size"
    )
    ents = tick(
        "1-entity-resolution (eager ckpt)",
        lambda: resolve_entities(
            part,
            id_col="p_partkey",
            name_col="p_name",
            block_col="p_brand",
            size_col="p_size",
            name_jaccard=0.5,
            max_size_gap=1,
        ).localCheckpoint(eager=True),
    )
    canon = (
        ents.filter(F.col("p_partkey") == F.col("canonical_id"))
        .join(part.select("p_partkey", F.col("p_brand").alias("brand")), "p_partkey")
        .select("canonical_id", "canonical_name", "brand", "cluster_size")
    )
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    baskets = (
        li.join(
            ents.select(F.col("p_partkey").alias("l_partkey"), "canonical_id"),
            "l_partkey",
        )
        .select(F.col("l_orderkey").alias("ord"), F.col("canonical_id").alias("ent"))
        .distinct()
    )
    kept = (
        baskets.groupBy("ord")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") <= 64)
        .select("ord")
    )
    bk = baskets.join(kept, "ord", "left_semi")
    a = bk.select("ord", F.col("ent").alias("src"))
    b = bk.select("ord", F.col("ent").alias("dst"))
    edges = (
        a.join(b, "ord")
        .filter(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("cooccur"))
        .filter(F.col("cooccur") >= 2)
    )
    tick("2-baskets+edges (noop)", lambda: noop(edges))
    comm = tick(
        "3-LPA (internal ckpts run here)",
        lambda: ga.label_propagation(
            edges.select("src", "dst"),
            vertices=canon.select(F.col("canonical_id").alias("id")),
            max_iter=3,
            seed=42,
        ),
    )
    members = comm.join(canon, comm.id == canon.canonical_id).select(
        "community", "canonical_id", "canonical_name", "brand", "cluster_size"
    )
    top_brands = _rel.top_n_frequency(members, "community", "brand", n=2).select(
        "community", F.array_join("top_brand", ",").alias("top_brands")
    )
    reps = (
        _rel.top_k_per_group(
            members, ["community"], [F.desc("cluster_size"), F.asc("canonical_id")], k=3
        )
        .groupBy("community")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("rank", "canonical_name"))),
                    lambda s: s["canonical_name"],
                ),
                ", ",
            ).alias("representatives")
        )
    )
    base = members.groupBy("community").agg(
        F.count(F.lit(1)).alias("member_count"),
        F.sum("cluster_size").alias("mention_count"),
    )
    report = base.join(top_brands, "community").join(reps, "community")
    tick("4-6 report rollup (noop)", lambda: noop(report))


if __name__ == "__main__":
    main()
