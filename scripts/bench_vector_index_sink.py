"""Drain-rate measurement for the streaming vector index sink
(streaming/ops.vector_index_sink) at the 200 k-vector scale fixture —
the same evidence shape as the substring/co-occurrence/near-dup drain
rows in SCALE.md.

Builds the fixture inline (sf0.1 embeddings x FACTOR by key shift; the
LAST replica redelivers replica-0's ids with shifted vectors, so the
drain includes real upsert traffic, not just appends), trains k=16
centroids once (index metadata), then drains SLICES micro-batches
through the sink with auto_compact_every=AUTO and reports wall,
vectors/sec, on-disk bytes, and the latest-wins read wall before and
after a final full compaction.

Usage: python scripts/bench_vector_index_sink.py [SRC_SF_DIR] [FACTOR]
"""

from __future__ import annotations

import glob
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from graphragdatapipeline_spark.io import read_table
from graphragdatapipeline_spark.session import get_session
from graphragdatapipeline_spark.streaming import ops as so
from graphragdatapipeline_spark.vector.similarity import kmeans_cells

SLICES = 8
AUTO = 4


def _dir_bytes(d: str) -> int:
    return sum(
        os.path.getsize(p)
        for p in glob.glob(os.path.join(d, "**"), recursive=True)
        if os.path.isfile(p)
    )


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    base = "/tmp/vecsink_bench"
    shutil.rmtree(base, ignore_errors=True)
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_session(
        "vecsink-bench", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    spark.sparkContext.setLogLevel("ERROR")

    emb = read_table(spark, src, "embeddings").select("vec_id", "embedding")
    n0 = emb.count()

    # explode-based replication: one plan node regardless of factor (a
    # union of `factor` branches stops planning long before 1000×)
    def replicas(lo: int, hi: int):
        return emb.select(
            F.explode(F.sequence(F.lit(lo), F.lit(hi))).alias("_r"),
            "vec_id",
            "embedding",
        ).select((F.col("vec_id") + F.col("_r") * n0).alias("vec_id"), "embedding")

    whole = replicas(0, factor - 1)
    # upsert traffic: the final slice redelivers replica 0's ids with a
    # shifted vector — latest-wins must rewrite them at read
    upserts = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: (x + F.lit(0.25)).cast("float")).alias(
            "embedding"
        ),
    )
    total = factor * n0 + n0

    cents_t0 = time.time()
    _, cents = kmeans_cells(whole, k=16, iters=3, assign_path="arrow")
    cents_wall = time.time() - cents_t0

    in_dir = os.path.join(base, "input")
    os.makedirs(in_dir)
    per = factor // (SLICES - 1) or 1
    # evenly tile the replicas over SLICES-1 slices, upserts last
    staged = []
    for s in range(SLICES - 1):
        lo = s * per
        hi = factor - 1 if s == SLICES - 2 else min((s + 1) * per, factor) - 1
        if lo >= factor or lo > hi:
            continue
        staged.append(replicas(lo, hi))
    staged.append(upserts)
    for i, sl in enumerate(staged):
        sl.coalesce(4).write.parquet(os.path.join(in_dir, f"slice={i}"))
        time.sleep(1.05)

    stream = (
        spark.readStream.schema("vec_id bigint, embedding array<float>")
        .option("maxFilesPerTrigger", 4)
        .parquet(in_dir + "/slice=*")
    )
    index_dir = os.path.join(base, "index")
    t0 = time.time()
    q = so.vector_index_sink(
        stream,
        cents,
        index_dir,
        os.path.join(base, "ckpt"),
        auto_compact_every=AUTO,
    )
    q.awaitTermination(3600)
    drain = time.time() - t0

    def read_wall() -> tuple[float, int]:
        t = time.time()
        n = so.read_vector_index(spark, index_dir).count()
        return time.time() - t, n

    r_pre, n_pre = read_wall()
    bytes_pre = _dir_bytes(index_dir)
    t = time.time()
    upto = so.compact_vector_index(spark, index_dir, gc=True)
    compact_wall = time.time() - t
    r_post, n_post = read_wall()
    bytes_post = _dir_bytes(index_dir)
    assert n_pre == n_post == total - n0  # latest-wins: upserts replace

    print(
        f"vectors={total} (incl {n0} upserts) slices={len(staged)} "
        f"train_k16={cents_wall:.1f}s drain={drain:.1f}s "
        f"rate={total / drain:.0f} vec/s auto_compact_every={AUTO}"
    )
    print(
        f"read latest-wins: pre-final-compact {r_pre:.2f}s "
        f"({bytes_pre / 1e6:.1f} MB on disk) -> post gc-compact "
        f"{r_post:.2f}s ({bytes_post / 1e6:.1f} MB), "
        f"final compact {compact_wall:.1f}s upto={upto}, rows={n_post}"
    )

    qvec = [float(x) for x in emb.orderBy("vec_id").first().embedding]

    def probe_wall(nprobe: int) -> float:
        t = time.time()
        so.vector_index_probe(
            spark, index_dir, cents, qvec, k=8, nprobe=nprobe
        ).collect()
        return time.time() - t

    p1, pf = probe_wall(1), probe_wall(len(cents))
    print(
        f"probe top-8 over the compacted index: nprobe=1 {p1:.2f}s, "
        f"nprobe={len(cents)} (exact) {pf:.2f}s"
    )
    spark.stop()


if __name__ == "__main__":
    main()
