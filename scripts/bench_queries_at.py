#!/usr/bin/env python
"""Time arbitrary registry queries at a given SF dir, bench.py
methodology (warm-up + untimed steady-state pass + best-of-3 noop-sink
runs). Used for the SCALE.md 1×/10× ratio tables.

Usage: python scripts/bench_queries_at.py SF_DIR query [query ...]
Prints one JSON line {"sf_dir": ..., "queries": {name: sec}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from graphragdatapipeline_spark.registry import REGISTRY  # noqa: E402
from graphragdatapipeline_spark.session import get_session  # noqa: E402


def main() -> None:
    sf_dir, names = sys.argv[1], sys.argv[2:]
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_session(
        "graphrag-spark-scale",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")

    from graphragdatapipeline_spark.io import read_table

    try:
        read_table(spark, sf_dir, "lineitem").count()
    except Exception:  # docs-only fixtures (mutate decades) have no lineitem
        read_table(spark, sf_dir, "documents").count()

    timings: dict[str, float] = {}
    for name in names:
        qd = REGISTRY[name]
        qd.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            qd.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
    print(json.dumps({"sf_dir": sf_dir, "queries": timings}))


if __name__ == "__main__":
    main()
