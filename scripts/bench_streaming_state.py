#!/usr/bin/env python
"""Measure streaming STATE growth vs watermark width, plus the two
round-8 index sinks' drain throughput — the scale-killer class for
streaming is state-store growth, and this puts numbers on it.

1. Stream-stream interval join (click→purchase attribution,
   click_purchase_attribution) drained over the events fixture with
   watermark widths {10 minutes, 1 hour, 6 hours} on BOTH sides:
   reports wall, rows/sec, and the state-store trajectory from
   StreamingQueryProgress stateOperators — max numRowsTotal, max
   memoryUsedBytes (RocksDB), total numRowsRemoved (watermark
   EVICTION observed — rows leaving state as the watermark passes,
   the mechanism that bounds 100 TB join state).
2. cooccurrence_index_sink and incremental_neardup_sink drained over
   the documents fixture: wall, docs/sec, final on-disk index bytes —
   the per-ingest index-maintenance cost (state here lives in the
   epoch-partitioned parquet index, not the state store, by design).

Usage: python scripts/bench_streaming_state.py [SF10_DIR] [MAX_FILES]
       [SECTION: all|join|docs]
Defaults: /tmp/sf10 10 all. Prints one JSON line per run.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F  # noqa: E402

from graphragdatapipeline_spark.session import get_session  # noqa: E402
from graphragdatapipeline_spark.streaming import ops as so  # noqa: E402


def _state_metrics(progresses) -> dict:
    max_rows = max_mem = removed = 0
    for p in progresses:
        for op in p.get("stateOperators", []):
            max_rows = max(max_rows, op.get("numRowsTotal", 0))
            max_mem = max(max_mem, op.get("memoryUsedBytes", 0))
            removed += op.get("numRowsRemoved", 0)
    return {
        "max_state_rows": max_rows,
        "max_state_bytes": max_mem,
        "rows_removed_total": removed,
    }


def _dir_bytes(d: str) -> int:
    total = 0
    for root, _, files in os.walk(d):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10"
    mfpt = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    section = sys.argv[3] if len(sys.argv) > 3 else "all"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_session(
        "stream-state", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    spark.sparkContext.setLogLevel("ERROR")
    events_dir = os.path.join(sf_dir, "events")
    docs_dir = os.path.join(sf_dir, "documents")
    # docs-only fixtures (mutate decades) have no events table; the
    # docs section doesn't need it
    n_events = (
        spark.read.parquet(events_dir).count()
        if os.path.exists(events_dir)
        else 0
    )
    work = "/tmp/stream_state_bench"
    shutil.rmtree(work, ignore_errors=True)

    # ---- 1. stream-stream join state vs watermark width
    for wm in ("10 minutes", "1 hour", "6 hours") if section in ("all", "join") else ():
        tag = wm.replace(" ", "")
        ckpt = f"{work}/ss_{tag}/ckpt"

        def src():
            return so.read_events_stream(
                spark, events_dir, max_files_per_trigger=mfpt
            )

        joined = so.click_purchase_attribution(
            so.with_watermark(src().filter(F.col("event_type") == "click"), wm),
            so.with_watermark(src().filter(F.col("event_type") == "purchase"), wm),
            horizon_minutes=60,
        )
        out_rows = 0

        def sink(df, epoch_id):  # noqa: ARG001
            nonlocal out_rows
            out_rows += df.count()

        t0 = time.perf_counter()
        q = (
            joined.writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        wall = time.perf_counter() - t0
        rec = {
            "pipeline": "stream_stream_join",
            "watermark": wm,
            "wall_sec": round(wall, 2),
            "input_rows": n_events,
            "rows_per_sec": round(n_events / wall),
            "joined_rows": out_rows,
            **_state_metrics(q.recentProgress),
        }
        print(json.dumps(rec), flush=True)

    # ---- 2. document index sinks (state = on-disk epoch index)
    n_docs = spark.read.parquet(docs_dir).count()
    doc_files = len([f for f in os.listdir(docs_dir) if f.endswith(".parquet")])
    doc_mfpt = max(1, doc_files // 10)

    def doc_src():
        schema = spark.read.parquet(docs_dir).schema
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", doc_mfpt)
            .parquet(docs_dir)
        )

    # section=docs_auto: same drains with the r12 inline auto-
    # compaction cadence on (SCALE.md's "does compacting while
    # streaming cost or pay" row) — reports the final watermark too
    ace = 8 if section == "docs_auto" else None
    for name, launch in (
        (
            "cooccurrence_index_sink",
            lambda: so.cooccurrence_index_sink(
                doc_src(),
                f"{work}/cooc/index",
                f"{work}/cooc/ckpt",
                max_doc_terms=64,
                auto_compact_every=ace,
            ),
        ),
        (
            "incremental_neardup_sink",
            lambda: so.incremental_neardup_sink(
                doc_src(),
                f"{work}/neardup/corpus",
                f"{work}/neardup/bands",
                f"{work}/neardup/ckpt",
                auto_compact_every=ace,
            ),
        ),
        (
            "substring_index_sink",
            lambda: so.substring_index_sink(
                doc_src(),
                f"{work}/substr/index",
                f"{work}/substr/ckpt",
                auto_compact_every=ace,
            ),
        ),
    ):
        if section not in ("all", "docs", "docs_auto"):
            break
        t0 = time.perf_counter()
        q = launch()
        q.awaitTermination()
        wall = time.perf_counter() - t0
        idx_dir = {
            "cooccurrence_index_sink": f"{work}/cooc/index",
            "incremental_neardup_sink": f"{work}/neardup",
            "substring_index_sink": f"{work}/substr/index",
        }[name]
        wm_dir = {
            "cooccurrence_index_sink": f"{work}/cooc/index/edges",
            "incremental_neardup_sink": f"{work}/neardup/bands",
            "substring_index_sink": f"{work}/substr/index",
        }[name]
        rec = {
            "pipeline": name,
            "wall_sec": round(wall, 2),
            "input_rows": n_docs,
            "rows_per_sec": round(n_docs / wall),
            "index_bytes_on_disk": _dir_bytes(idx_dir),
            "auto_compact_every": ace,
            "compacted_upto": so.compacted_upto(spark, wm_dir),
        }
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
