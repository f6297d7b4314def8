#!/usr/bin/env python
"""Addendum to ann_recall_curves.py: PQ-rerank recall as a function of
CODEBOOK SIZE k (centroids per sub-quantizer), at fixed shortlist.

Motivation (round 10): on the clustered fixture PQ-rerank recall
dropped vs the uniform fixture while every other path rose — the
hypothesis is that with tight clusters the true top-8 sit CLOSER than
the sub-quantizer grid pitch, so ADC can no longer order them and the
shortlist misses; i.e. the limiter is the k=16 codebook the registered
query keeps for oracle-fixture parity, not the PQ path itself. This
measures recall@8 at k in {16, 64, 256} (256 = the standard 1-byte PQ
code) to confirm or refute.

Usage: python scripts/ann_recall_pq_codebook.py [SF_DIR] [N_QUERIES] [SHORTLIST] [M]
Defaults: /tmp/emb-clustered, 16, 32, 8.

r12 addendum: M is an argument and each row carries train/probe walls,
so the registered-query shape (m=2, shortlist=128) can be measured at
k=256 on the 200 k-vector fixture where it trains soundly (~780
points/centroid) — the r11 verdict's "production default has never
run end-to-end" item.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F  # noqa: E402

from graphragdatapipeline_spark.io import read_table  # noqa: E402
from graphragdatapipeline_spark.session import get_session  # noqa: E402
from graphragdatapipeline_spark.vector import similarity as vs  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/emb-clustered"
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    shortlist = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    m = int(sys.argv[4]) if len(sys.argv) > 4 else 8
    kk = 8
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
    spark = get_session(
        "ann-recall-pq", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
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

    import time

    for cb_k in (16, 64, 256):
        t0 = time.perf_counter()
        books = vs.pq_train(emb, m=m, k=cb_k, iters=2)
        train_wall = time.perf_counter() - t0
        # encode ONCE (the production ingest shape, r12 code_cols
        # path): the inline per-query re-encode is k zip_with folds
        # per subspace per row and dominates probe wall at large k
        code_cols = [f"pq_{i}" for i in range(m)]
        t0 = time.perf_counter()
        enc = emb.select(
            "vec_id",
            "embedding",
            *[
                c.alias(code_cols[i])
                for i, c in enumerate(
                    vs.pq_encode_cols(books, F.col("embedding"))
                )
            ],
        ).localCheckpoint(eager=True)
        encode_wall = time.perf_counter() - t0
        rec = 0
        t0 = time.perf_counter()
        for qid, q in queries:
            body = enc.filter(F.col("vec_id") != qid)
            top = vs.pq_rerank_topk(
                body, books, q, k=kk, shortlist=shortlist, code_cols=code_cols
            )
            rec += len({int(r[0]) for r in top.collect()} & truth[qid])
        probe_wall = time.perf_counter() - t0
        print(
            json.dumps(
                {
                    "path": "pq_rerank",
                    "m": m,
                    "codebook_k": cb_k,
                    "shortlist": shortlist,
                    "recall_at_k": round(rec / (kk * len(queries)), 4),
                    "train_wall_s": round(train_wall, 1),
                    "encode_wall_s": round(encode_wall, 1),
                    "probe_wall_per_q_s": round(probe_wall / len(queries), 2),
                    "n_corpus": n_corpus,
                    "sf_dir": sf_dir,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
