#!/usr/bin/env python
"""Residual-PQ (IVFADC) vs raw-vector PQ at EQUAL m,k — the r12
verdict's clustered-regime soft spot, measured.

r12 measured raw PQ-rerank on the clustered fixture at the production
shape (m=2, shortlist=128): recall@8 = 0.18 (k=16) → 0.32 (k=64) →
0.71 (k=256) — the codebooks spend their entries re-describing the
coarse cluster structure. IVFADC (Jégou 2011 §IV) trains the SAME
codebook budget on residuals v − centroid[cell]; the residuals
concentrate at the intra-cluster distance scale, which is exactly
where the true neighbors sit. This measures both variants side by
side on the same fixture, queries, and shortlist:

- raw:      pq_train → pq_rerank_topk over stored codes (full scan)
- residual: kmeans coarse cells → pq_train(centroids=...) →
            ivfpq_residual_topk over stored (cell, codes), at
            nprobe=n_cells (full scan — isolates quantization quality
            at identical scan cost) and nprobe=4 (the sublinear
            operating point).

Usage: python scripts/ann_recall_residual_pq.py [SF_DIR] [N_QUERIES] [SHORTLIST] [M] [COARSE_K]
Defaults: /tmp/emb-clustered, 16, 128, 2, 16.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F  # noqa: E402

from graphragdatapipeline_spark.io import read_table  # noqa: E402
from graphragdatapipeline_spark.session import get_session  # noqa: E402
from graphragdatapipeline_spark.vector import similarity as vs  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/emb-clustered"
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    shortlist = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    m = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    coarse_k = int(sys.argv[5]) if len(sys.argv) > 5 else 16
    kk = 8
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
    spark = get_session(
        "ann-residual-pq", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    spark.sparkContext.setLogLevel("ERROR")

    emb = read_table(spark, sf_dir, "embeddings").localCheckpoint(eager=True)
    n_corpus = emb.count()
    qrows = (
        emb.filter(F.col("vec_id").between(100, 100 + n_queries - 1))
        .select("vec_id", "embedding")
        .collect()
    )
    queries = [(int(r[0]), [float(x) for x in r[1]]) for r in qrows]
    truth = {
        qid: {
            int(r[0])
            for r in vs.cosine_topk(
                emb.filter(F.col("vec_id") != qid), q, k=kk
            ).collect()
        }
        for qid, q in queries
    }

    t0 = time.perf_counter()
    _, cents = vs.kmeans_cells(
        emb, k=coarse_k, iters=3, assign_path="arrow"
    )
    coarse_wall = time.perf_counter() - t0
    print(
        json.dumps(
            {"coarse_k": coarse_k, "coarse_train_wall_s": round(coarse_wall, 1)}
        ),
        flush=True,
    )

    for cb_k in (16, 64, 256):
        # RAW: same measurement as ann_recall_pq_codebook (context row)
        t0 = time.perf_counter()
        books = vs.pq_train(emb, m=m, k=cb_k, iters=2)
        raw_train = time.perf_counter() - t0
        code_cols = [f"pq_{i}" for i in range(m)]
        enc = emb.select(
            "vec_id",
            "embedding",
            *[
                c.alias(code_cols[i])
                for i, c in enumerate(vs.pq_encode_cols(books, F.col("embedding")))
            ],
        ).localCheckpoint(eager=True)
        rec = 0
        t0 = time.perf_counter()
        for qid, q in queries:
            top = vs.pq_rerank_topk(
                enc.filter(F.col("vec_id") != qid),
                books,
                q,
                k=kk,
                shortlist=shortlist,
                code_cols=code_cols,
            )
            rec += len({int(r[0]) for r in top.collect()} & truth[qid])
        raw_probe = (time.perf_counter() - t0) / len(queries)

        # RESIDUAL: same budget, codebooks trained on v − centroid[cell]
        t0 = time.perf_counter()
        books_r = vs.pq_train(emb, m=m, k=cb_k, iters=2, centroids=cents)
        res_train = time.perf_counter() - t0
        rcode_cols = [f"rpq_{i}" for i in range(m)]
        with_cell = emb.withColumn(
            "cell", vs.nearest_centroid_col(cents, F.col("embedding"))
        )
        renc = with_cell.select(
            "vec_id",
            "embedding",
            "cell",
            *[
                c.alias(rcode_cols[i])
                for i, c in enumerate(
                    vs.pq_encode_cols(
                        books_r,
                        vs.residual_col(
                            cents, F.col("embedding"), F.col("cell")
                        ),
                    )
                )
            ],
        ).localCheckpoint(eager=True)
        for nprobe in (coarse_k, 4):
            rec_r = 0
            t0 = time.perf_counter()
            for qid, q in queries:
                top = vs.ivfpq_residual_topk(
                    renc.filter(F.col("vec_id") != qid),
                    cents,
                    books_r,
                    q,
                    k=kk,
                    nprobe=nprobe,
                    shortlist=shortlist,
                    cell_col="cell",
                    code_cols=rcode_cols,
                )
                rec_r += len({int(r[0]) for r in top.collect()} & truth[qid])
            res_probe = (time.perf_counter() - t0) / len(queries)
            print(
                json.dumps(
                    {
                        "m": m,
                        "codebook_k": cb_k,
                        "shortlist": shortlist,
                        "raw_recall_at_8": round(rec / (kk * len(queries)), 4),
                        "residual_recall_at_8": round(
                            rec_r / (kk * len(queries)), 4
                        ),
                        "nprobe": nprobe,
                        "raw_train_s": round(raw_train, 1),
                        "residual_train_s": round(res_train, 1),
                        "raw_probe_per_q_s": round(raw_probe, 2),
                        "residual_probe_per_q_s": round(res_probe, 2),
                        "n_corpus": n_corpus,
                        "sf_dir": sf_dir,
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
