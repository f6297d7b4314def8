#!/usr/bin/env python
"""One-pass wall-clock sweep of EVERY registered query at a fixture
dir (default sf0.1): one untimed steady-state pass, then one timed
noop-sink run per query. Coarser than bench_queries_at.py best-of-3 —
the point is a complete cost ranking to aim optimization at, not a
publishable number. Prints one JSON line sorted slowest-first.

Usage: python scripts/sweep_query_times.py [SF_DIR] [--skip name,...]
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
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    skip: set[str] = set()
    if args and not args[0].startswith("--"):
        sf_dir = args[0]
        args = args[1:]
    if args and args[0] == "--skip":
        if len(args) < 2:
            raise SystemExit("--skip requires a comma-separated name list")
        skip = set(args[1].split(","))
        args = args[2:]
    if args:
        raise SystemExit(f"unrecognized arguments: {args}")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_session(
        "graphrag-spark-sweep", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    spark.sparkContext.setLogLevel("ERROR")

    from graphragdatapipeline_spark.io import read_table

    read_table(spark, sf_dir, "lineitem").count()

    out: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name, qd in sorted(REGISTRY.items()):
        if name in skip:
            continue
        spark.sparkContext.setJobDescription(f"sweep: {name}")
        try:
            qd.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            t0 = time.perf_counter()
            qd.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            out[name] = round(time.perf_counter() - t0, 3)
            print(f"{name}: {out[name]}", flush=True)
        except Exception as exc:  # noqa: BLE001 — sweep must finish
            # failures go under a separate key, never into the timing
            # map (a -1.0 sentinel reads as a fast timing to a ranker)
            errors[name] = str(exc)
            print(f"ERR {name}: {exc}", file=sys.stderr, flush=True)
        spark.sparkContext.setJobDescription(None)
    ranked = dict(sorted(out.items(), key=lambda kv: -kv[1]))
    print(json.dumps({"sf_dir": sf_dir, "queries": ranked, "errors": errors}))
    spark.stop()


if __name__ == "__main__":
    main()
