#!/usr/bin/env python
"""Dump .explain("formatted") for the PER-ITERATION plans of the
driver-side training/move loops (louvain_move round, quality_classifier
gradient aggregation) — the plans a registry-level capture cannot see
because each round ends in a localCheckpoint.

Usage: python scripts/capture_loop_plans.py TAG
Writes plans/$SPARK_GRAFT_PLANS_ROUND (default r14)/louvain_move_round_<TAG>.txt and
plans/.../clf_grad_iter_<TAG>.txt, captured at sf0.01 (the loop shapes
are scale-independent).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F  # noqa: E402

from graphragdatapipeline_spark.session import get_session  # noqa: E402

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r14")
)


def _dump(df, path):
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    with open(path, "w") as f:
        f.write(plan)
    print(
        f"{os.path.basename(path)}: "
        f"{sum(1 for ln in plan.splitlines() if ln.lstrip().startswith(('Exchange', '+- Exchange', ':- Exchange')))} "
        f"exchange lines, {plan.count('SortMergeJoin')} SMJ, "
        f"{plan.count('HashAggregate') + plan.count('ObjectHashAggregate')} agg nodes",
        flush=True,
    )


def main() -> None:
    tag = sys.argv[1]
    sf_dir = "/root/testdata/sf0.01"
    spark = get_session(
        "graphrag-spark-loop-plans", master="local[8]", shuffle_partitions=8
    )
    spark.sparkContext.setLogLevel("ERROR")

    # --- louvain_move: capture one round's new-membership plan by
    # running the move phase with a plan hook: rebuild the round's
    # frame exactly as louvain_move does, stopping before the
    # checkpoint. We reach in via a 1-round call instrumented through
    # monkeypatching localCheckpoint is fragile; instead replicate the
    # documented round construction against the real inputs.
    import graphragdatapipeline_spark.registry  # noqa: F401 — load order
    from graphragdatapipeline_spark.graph import algorithms as ga
    from graphragdatapipeline_spark.registries.graph_queries import (
        build_tpch_graph,
    )

    g = build_tpch_graph(spark, sf_dir)
    cls = type(g.edges)  # the concrete (classic) DataFrame class
    captured: list = []
    orig = cls.localCheckpoint

    def spy(self, eager=True):
        captured.append(self)
        return orig(self, eager=eager)

    cls.localCheckpoint = spy
    try:
        ga.louvain_move(g.edges, gamma=1.0, rounds=1, vertices=g.vertices)
    finally:
        cls.localCheckpoint = orig
    # the round's membership frame is the LAST checkpoint in a
    # rounds=1 call (sym/nodes checkpoints come first)
    _dump(captured[-1], os.path.join(OUT, f"louvain_move_round_{tag}.txt"))

    # --- quality_classifier: the gradient aggregation of one GD
    # iteration over the (checkpointed) training frame, weights mid-fit.
    from graphragdatapipeline_spark.io import read_table
    from graphragdatapipeline_spark.operators import curation as cu

    d = read_table(spark, sf_dir, "documents")
    captured2: list = []
    orig_agg = cls.agg
    captured3: list = []

    def spy_agg(self, *a, **kw):
        out = orig_agg(self, *a, **kw)
        captured2.append(out)
        return out

    def spy_ckpt(self, eager=True):
        captured3.append(self)
        return orig(self, eager=eager)

    cls.agg = spy_agg
    cls.localCheckpoint = spy_ckpt
    try:
        cu.quality_classifier(d, "doc_id", "text", iters=1).write.format(
            "noop"
        ).mode("overwrite").save()
    finally:
        cls.agg = orig_agg
        cls.localCheckpoint = orig
    grad = [df for df in captured2 if "_g0" in df.columns]
    _dump(grad[0], os.path.join(OUT, f"clf_grad_iter_{tag}.txt"))
    # the FEATURE frame entering the fit (the first checkpoint the
    # classifier takes): the registered query's output plan cannot show
    # it — the checkpoint hides everything upstream behind ExistingRDD
    feats = [df for df in captured3 if "_r1" in df.columns]
    _dump(feats[0], os.path.join(OUT, f"clf_feats_{tag}.txt"))
    spark.stop()


if __name__ == "__main__":
    main()
