#!/usr/bin/env python
"""Plan-shape audit over every registry query: counts the operators
that matter for scale (Exchange, Python-boundary nodes, nested-loop /
cartesian joins, windows, scans without pushdown) so regressions and
optimization targets are one-line greppable.

Usage: python scripts/audit_plans.py [SF_DIR] > plan_audit.tsv
Plans are captured (not executed) — queries whose *construction* runs
driver-side jobs (kmeans training, query-vector fetch) do execute
those, which is why the default fixture is sf0.01.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from graphragdatapipeline_spark.registry import REGISTRY  # noqa: E402
from graphragdatapipeline_spark.session import get_session  # noqa: E402

PATTERNS = {
    "exchange": r"^\s*(?:[:+\- ]*)Exchange(?!.*Broadcast)",
    "bcast": r"BroadcastExchange",
    "smj": r"SortMergeJoin",
    "bnlj": r"BroadcastNestedLoopJoin",
    "cartesian": r"CartesianProduct",
    "window": r"^\s*(?:[:+\- ]*)Window ",
    "py_row": r"BatchEvalPython",
    "py_arrow": r"ArrowEvalPython|MapInPandas|MapInArrow|FlatMapGroupsInPandas",
    "sort": r"^\s*(?:[:+\- ]*)Sort ",
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_session("graphrag-spark-audit", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    cols = list(PATTERNS)
    print("\t".join(["query"] + cols + ["note"]))
    for name in sorted(REGISTRY):
        try:
            df = REGISTRY[name].fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            print("\t".join([name] + ["-"] * len(cols) + [f"ERR {exc}"[:120]]))
            continue
        counts = [
            str(sum(1 for ln in plan.splitlines() if re.search(p, ln)))
            for p in PATTERNS.values()
        ]
        note = ""
        if re.search(r"PushedFilters: \[\]", plan) and "Filter (" in plan:
            note = "scan-no-pushdown"
        print("\t".join([name] + counts + [note]), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
