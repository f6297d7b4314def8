#!/usr/bin/env python
"""Extension-family bench block (r13, verdict item 6): a FIXED set of
best-of-3 walls for the engine's center of mass — dedup, curation,
graphrag, and the streaming vector index — so regressions in the big
families become one-line diffable beside BENCH_r* instead of living in
ad-hoc SCALE.md prose. Same methodology as bench.py (untimed
JIT/codegen pass, then best-of-3 noop-sink materialization); the
vector-index row additionally drains a small sink end-to-end (ingest →
auto-compact → gc-compact → probe), the maintenance path the registry
queries cannot time.

Usage: python scripts/bench_families.py  (env: SPARK_GRAFT_SF_DIR,
SPARK_GRAFT_CPUS — defaults /root/testdata/sf0.1, 32)
Prints ONE JSON line: {"metric": "family_queries_total_sec", ...}.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FAMILY = [
    "dedup_corpus_verified",      # exact+minhash+survivors end-to-end
    "dedup_substring_removal",    # span removal (the decontamination op)
    "curation_end_to_end",        # 7-stage curation pipeline
    "graphrag_end_to_end",        # extract → graph → communities → pack
    "graph_louvain_distributed",  # the heaviest community ladder rung
    "vector_ivfpq_residual_rerank",  # the ANN read path (r13 IVFADC)
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import functions as F

    from graphragdatapipeline_spark.io import read_table
    from graphragdatapipeline_spark.registry import REGISTRY
    from graphragdatapipeline_spark.session import get_session
    from graphragdatapipeline_spark.streaming import ops as so
    from graphragdatapipeline_spark.vector.similarity import kmeans_cells

    spark = get_session(
        "graphrag-spark-bench-families",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")
    read_table(spark, sf_dir, "documents").count()  # warm-up

    missing = [n for n in FAMILY if n not in REGISTRY]
    if missing:
        raise SystemExit(f"unknown family queries: {missing}")

    for name in FAMILY:  # untimed codegen/JIT pass
        REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    timings: dict[str, float] = {}
    for name in FAMILY:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    # vector index maintenance: drain sf embeddings through the sink
    # (2 slices, second upserts 10% of ids), gc-compact, probe — wall
    # for the WHOLE lifecycle, best of 1 (the sink is stateful).
    base = "/tmp/bench_families_vecsink"
    shutil.rmtree(base, ignore_errors=True)
    emb = read_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    n0 = emb.count()
    _, cents = kmeans_cells(emb, k=16, iters=3, assign_path="arrow")
    in_dir = os.path.join(base, "input")
    os.makedirs(in_dir)
    upserts = emb.filter(F.col("vec_id") % 10 == 0).select(
        "vec_id",
        F.transform("embedding", lambda x: (x + F.lit(0.25)).cast("float")).alias(
            "embedding"
        ),
    )
    for i, sl in enumerate([emb, upserts]):
        sl.coalesce(1).write.parquet(os.path.join(in_dir, f"slice={i}"))
        time.sleep(1.05)
    t0 = time.perf_counter()
    stream = (
        spark.readStream.schema("vec_id bigint, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir + "/slice=*")
    )
    index_dir = os.path.join(base, "index")
    so.vector_index_sink(
        stream, cents, index_dir, os.path.join(base, "ckpt")
    ).awaitTermination(600)
    so.compact_vector_index(spark, index_dir, gc=True)
    qvec = [float(x) for x in emb.orderBy("vec_id").first().embedding]
    so.vector_index_probe(spark, index_dir, cents, qvec, k=8, nprobe=1).collect()
    timings["vector_index_lifecycle"] = round(time.perf_counter() - t0, 3)
    assert so.read_vector_index(spark, index_dir).count() == n0

    sf = os.path.basename(os.path.normpath(sf_dir)).replace("sf", "")
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "family_queries_total_sec",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
