#!/usr/bin/env python
"""DOULION triangle estimate at a scale where exact enumeration is
workload-infeasible (SCALE.md r11: the 100× co-purchase graph is
4.82B capped wedges ≈ 116 GB of wedge shuffle — beyond this host's
scratch, and DuckDB dies on the identical SQL). Sampling at p cuts
wedge volume by p²; this measures the estimate's wall and value at
the sf10 fixture so the registered scale path rests on an executed
run, complementing the sf0.01 contract query where the estimate is
oracle-banded against the exact count.

Usage: python scripts/bench_triangle_estimate.py [SF_DIR] [P] [SEED]
Defaults: /tmp/sf10 0.1 42. Prints one JSON line.
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


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10"
    p = float(sys.argv[2]) if len(sys.argv) > 2 else 0.1
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 42
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_session(
        "triangle-estimate", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    spark.sparkContext.setLogLevel("ERROR")

    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("src"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("dst"))
    # no checkpoint on the full edge table — the estimator checkpoints
    # its p×-smaller SAMPLE instead (see triangle_count_estimate); the
    # co-purchase join is recomputed per linear pass, trading two
    # scans for bounded memory at 119.6M canonical edges
    edges = a.join(b, "ok").filter(F.col("src") < F.col("dst")).select("src", "dst")
    t0 = time.perf_counter()
    row = ga.triangle_count_estimate(
        edges, p=p, seed=seed, max_forward_degree=160
    ).first()
    wall = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "p": p,
                "seed": seed,
                "n_sampled_triangles": int(row.n_sampled_triangles),
                "est_triangles": round(float(row.est_triangles)),
                "wall_s": round(wall, 1),
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
