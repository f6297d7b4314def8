#!/usr/bin/env python
"""Quality-ladder comparison at a SECOND graph shape — the sf co-purchase
graph — to test whether the distributed-Louvain vs exact-Leiden RB-quality
plateau measured on the 99k planted-partition graph (SCALE.md graph
section) is fixture-specific.

Graph: parts co-purchased in the same order (basket = l_orderkey,
64-part mega-basket cap, co-occurrence >= 2) — a heavy-tailed real
association graph, structurally unlike both the planted partition (known
communities) and Erdős–Rényi (none).

Rungs at γ=2.0 (same as the reference's top resolution):
  singleton            quality of the all-singletons baseline
  lpa                  seeded label propagation (5 rounds)
  louvain_move         one parity-damped move phase (rounds=4)
  louvain_multilevel   full move→contract loop, default budget
  leiden_exact         vendored driver-side Leiden (|V|+|E| contract)

Usage: python scripts/bench_quality_ladder_shape2.py [SF_DIR]
Default: /tmp/sf1.0. Prints one JSON line per rung.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F  # noqa: E402

from graphragdatapipeline_spark.graph import algorithms as ga  # noqa: E402
from graphragdatapipeline_spark.io import read_table  # noqa: E402
from graphragdatapipeline_spark.session import get_session  # noqa: E402

GAMMA = 2.0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1.0"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_session(
        "quality-ladder-2", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    spark.sparkContext.setLogLevel("ERROR")

    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    baskets = li.select(
        F.col("l_orderkey").alias("ord"), F.col("l_partkey").alias("ent")
    ).distinct()
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
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 2)
        .select("src", "dst")
        .localCheckpoint(eager=True)
    )
    verts = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_v, n_e = verts.count(), edges.count()
    print(json.dumps({"graph": "co-purchase", "sf_dir": sf_dir,
                      "n_vertices": n_v, "n_edges": n_e}), flush=True)

    def quality(memb) -> float:
        return float(ga.rb_quality_agg(edges, memb, GAMMA).first()[0])

    def report(rung: str, memb, wall: float) -> None:
        q = quality(memb)
        n_c = memb.select("community").distinct().count()
        print(json.dumps({"rung": rung, "gamma": GAMMA,
                          "quality": round(q, 1), "n_communities": n_c,
                          "wall_sec": round(wall, 1)}), flush=True)

    singleton = verts.select("id", F.col("id").alias("community"))
    report("singleton", singleton, 0.0)

    t0 = time.perf_counter()
    lpa = ga.label_propagation(edges, vertices=verts, max_iter=5, seed=42)
    lpa.count()
    report("lpa", lpa, time.perf_counter() - t0)

    t0 = time.perf_counter()
    mv = ga.louvain_move(edges, gamma=GAMMA, rounds=4, vertices=verts)
    mv.count()
    report("louvain_move_1phase", mv, time.perf_counter() - t0)

    t0 = time.perf_counter()
    ml = ga.louvain_multilevel(edges, gamma=GAMMA, rounds=4, vertices=verts)
    ml.count()
    report("louvain_multilevel", ml, time.perf_counter() - t0)

    # exact rung: driver-side vendored Leiden under the |V|+|E| contract
    from graphragdatapipeline_spark.graph.leiden import leiden_membership

    t0 = time.perf_counter()
    vid = [r[0] for r in verts.orderBy("id").collect()]
    idx = {v: i for i, v in enumerate(vid)}
    e_list = [
        (idx[r[0]], idx[r[1]], 1.0) for r in edges.select("src", "dst").collect()
    ]
    labels = leiden_membership(len(vid), e_list, gamma=GAMMA, seed=42)
    memb_exact = spark.createDataFrame(
        [(vid[i], int(labels[i])) for i in range(len(vid))],
        "id long, community long",
    )
    report("leiden_exact", memb_exact, time.perf_counter() - t0)


if __name__ == "__main__":
    main()
