#!/usr/bin/env python
"""Measure Structured Streaming DRAIN throughput at scale.

SCALE.md's streaming story is otherwise qualitative (state bounds,
TTL eviction, exactly-once epochs); this script puts a number on it:
the sf10 events table (10M rows, 100 parquet files) is drained
through the real pipelines as an availableNow stream in fixed-size
micro-batches (maxFilesPerTrigger), and we report end-to-end rows/sec
per pipeline — the figure a capacity plan divides ingest volume by.

Pipelines measured (all exactly the registered operators):
  passthrough   readStream → foreachBatch count         (source ceiling)
  windowed_agg  watermark 1h → tumbling_window_agg      (stateful agg)
  stream_dedup  watermark 1h → dropDuplicatesWithinWatermark(user_id,
                event_type)                             (keyed state)

Usage: python scripts/bench_streaming_throughput.py [EVENTS_DIR]
       [MAX_FILES_PER_TRIGGER]
Defaults: /tmp/sf10/events 10 (→ 10 micro-batches of ~1M rows).
Prints one JSON line per pipeline plus a summary line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from graphragdatapipeline_spark.session import get_session  # noqa: E402
from graphragdatapipeline_spark.streaming import ops as so  # noqa: E402


def drain(spark, stream_df, name: str, ckpt_root: str, output_mode: str) -> dict:
    """Run the stream to exhaustion under availableNow; time the drain."""
    ckpt = os.path.join(ckpt_root, name)
    shutil.rmtree(ckpt, ignore_errors=True)
    n_batches = 0

    def sink(df, epoch_id):  # noqa: ARG001 — noop sink, full materialization
        nonlocal n_batches
        df.write.format("noop").mode("overwrite").save()
        n_batches += 1

    t0 = time.perf_counter()
    q = (
        stream_df.writeStream.foreachBatch(sink)
        .outputMode(output_mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = time.perf_counter() - t0
    return {"pipeline": name, "wall_sec": round(wall, 2), "n_batches": n_batches}


def main() -> None:
    events_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10/events"
    mfpt = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_session(
        "stream-throughput", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    spark.sparkContext.setLogLevel("ERROR")
    total_rows = spark.read.parquet(events_dir).count()  # also warms the JVM
    ckpt_root = "/tmp/stream_bench_ckpt"

    def src():
        return so.read_events_stream(spark, events_dir, max_files_per_trigger=mfpt)

    results = [
        drain(spark, src(), "passthrough", ckpt_root, "append"),
        drain(
            spark,
            so.tumbling_window_agg(so.with_watermark(src(), "1 hour")),
            "windowed_agg",
            ckpt_root,
            "update",
        ),
        drain(
            spark,
            so.with_watermark(src(), "1 hour").dropDuplicatesWithinWatermark(
                ["user_id", "event_type"]
            ),
            "stream_dedup",
            ckpt_root,
            "append",
        ),
    ]
    for r in results:
        r["input_rows"] = total_rows
        r["rows_per_sec"] = round(total_rows / r["wall_sec"])
        print(json.dumps(r), flush=True)
    print(
        json.dumps(
            {
                "events_dir": events_dir,
                "max_files_per_trigger": mfpt,
                "total_rows": total_rows,
                "throughput_rows_per_sec": {
                    r["pipeline"]: r["rows_per_sec"] for r in results
                },
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
