#!/usr/bin/env python
"""Measure the READ side of the streaming substring index — the half
round 10 left open (the r10 row measured sink drain throughput only):
scoring a fresh ingest batch against the ACCUMULATED shingle-df index
as a function of how many committed epoch partitions the index has
fragmented into, and what epoch compaction (streaming.ops
compact_substring_index) buys back.

Procedure (batch-mode replay of the sink's on-disk layout — the read
path is identical whether the epochs were landed by foreachBatch or
here):
1. replicate the sf0.1 documents table FACTOR× by disjoint key shift
   (500 k docs at the default 100×, the same corpus size as the r10
   drain row),
2. land its shingle-df deltas as E committed epoch partitions
   (doc_id-hash split, markers included),
3. score a fresh 5 k-doc batch with remove_spans_against_index through
   read_substring_index, forcing the full compute with an agg over
   n_removed + cleaned_text (count() would prune the heavy columns),
4. compact (gc=True) and score again,
5. land TAIL_E more epochs on top of the compacted generation and
   score again — the steady-state regime (compacted base + short
   tail) a production cadence maintains.

Prints one JSON line per measurement:
{"phase": ..., "epochs": ..., "files": ..., "bytes": ..., "score_wall_s": ...}

Usage: python scripts/bench_substring_index_read.py [SRC_SF_DIR] [WORK_DIR]
       [FACTOR] [EPOCHS] [TAIL_EPOCHS]
Defaults: /root/testdata/sf0.1 /tmp/subidx-read 100 64 8
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from functools import reduce  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

from graphragdatapipeline_spark.io import read_table  # noqa: E402
from graphragdatapipeline_spark.operators.dedup import (  # noqa: E402
    remove_spans_against_index,
    shingle_df_delta,
)
from graphragdatapipeline_spark.session import get_session  # noqa: E402
from graphragdatapipeline_spark.streaming import ops as so  # noqa: E402


def _dir_stats(d: str) -> tuple[int, int]:
    files = total = 0
    for root, _, fs in os.walk(d):
        for f in fs:
            if f.endswith(".parquet"):
                files += 1
                total += os.path.getsize(os.path.join(root, f))
    return files, total


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/subidx-read"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 100
    n_epochs = int(sys.argv[4]) if len(sys.argv) > 4 else 64
    tail_e = int(sys.argv[5]) if len(sys.argv) > 5 else 8
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_session(
        "subidx-read", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(work, ignore_errors=True)
    index_dir = os.path.join(work, "shidx")
    commits = index_dir + "/_commits"

    d = read_table(spark, src, "documents").select("doc_id", "text")
    base = d.agg(F.max("doc_id")).first()[0] + 1
    corpus = reduce(
        lambda a, b: a.unionByName(b),
        [
            d.withColumn("doc_id", (F.col("doc_id") + i * base).cast("long"))
            for i in range(factor)
        ],
    ).localCheckpoint()
    n_docs = corpus.count()

    # fresh ingest batch: 5k docs with ids beyond the corpus — shares
    # shingle content with the index (the realistic incoming slice)
    batch = (
        d.limit(5000)
        .withColumn("doc_id", (F.col("doc_id") + factor * base).cast("long"))
        .localCheckpoint()
    )
    batch.count()

    def land_epochs(df, first_epoch: int, count: int) -> None:
        for e in range(first_epoch, first_epoch + count):
            sl = df.filter(
                F.pmod(F.xxhash64("doc_id"), F.lit(count)) == (e - first_epoch)
            )
            delta = shingle_df_delta(sl, "doc_id", "text")
            delta.write.mode("overwrite").parquet(f"{index_dir}/epoch={e}")
            so._mark_committed(spark, commits, e)

    def score(phase: str, check=None) -> float:
        idx = so.read_substring_index(spark, index_dir)
        t0 = time.time()
        row = (
            remove_spans_against_index(batch, idx, "doc_id", "text")
            .agg(
                F.sum("n_removed").alias("nr"),
                F.sum(F.length("cleaned_text")).alias("nc"),
            )
            .first()
        )
        wall = time.time() - t0
        files, total = _dir_stats(index_dir)
        print(
            json.dumps(
                {
                    "phase": phase,
                    "corpus_docs": n_docs,
                    "epochs_visible": len(so.committed_epochs(spark, commits)),
                    "compacted_upto": so.compacted_upto(spark, index_dir),
                    "index_files": files,
                    "index_bytes": total,
                    "score_wall_s": round(wall, 2),
                    "sum_n_removed": row["nr"],
                    "sum_clean_chars": row["nc"],
                }
            ),
            flush=True,
        )
        if check is not None:
            assert (row["nr"], row["nc"]) == check, "view drifted!"
        return (row["nr"], row["nc"])

    t0 = time.time()
    land_epochs(corpus, 0, n_epochs)
    print(
        json.dumps(
            {"phase": "build", "epochs": n_epochs, "wall_s": round(time.time() - t0, 1)}
        ),
        flush=True,
    )
    want = score(f"fragmented_{n_epochs}e")

    t0 = time.time()
    so.compact_substring_index(spark, index_dir, gc=True)
    print(
        json.dumps({"phase": "compact", "wall_s": round(time.time() - t0, 1)}),
        flush=True,
    )
    score("compacted", check=want)

    # steady state: short tail of fresh epochs on top of the compacted
    # generation (new docs, so totals legitimately change)
    tail_docs = d.limit(20000).withColumn(
        "doc_id", (F.col("doc_id") + (factor + 1) * base).cast("long")
    )
    land_epochs(tail_docs, n_epochs, tail_e)
    score(f"compacted_plus_{tail_e}e_tail")

    t0 = time.time()
    so.compact_substring_index(spark, index_dir, gc=True)
    print(
        json.dumps({"phase": "recompact", "wall_s": round(time.time() - t0, 1)}),
        flush=True,
    )
    score("recompacted")
    spark.stop()


if __name__ == "__main__":
    main()
