#!/usr/bin/env python
"""Dump .explain("formatted") for registry queries to plans/$SPARK_GRAFT_PLANS_ROUND (default r14)..

Usage: python scripts/capture_plans.py TAG [query ...]
With no query names, dumps every headline query. TAG is the filename
suffix (before/after). Plans are captured at sf0.1 (the bench scale)
on the bench session shape so Exchange counts match what bench.py
executes.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from graphragdatapipeline_spark.registry import REGISTRY  # noqa: E402
from graphragdatapipeline_spark.session import get_session  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:] or [n for n, q in sorted(REGISTRY.items()) if q.headline]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_session(
        "graphrag-spark-plans", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r14"),
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = REGISTRY[name].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        n_ex = plan.count("Exchange")
        print(f"{name}: {n_ex} Exchange -> {path}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
