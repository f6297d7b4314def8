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

Usage: python scripts/ann_recall_pq_codebook.py [SF_DIR] [N_QUERIES] [SHORTLIST]
Defaults: /tmp/emb-clustered, 16, 32.
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

    for cb_k in (16, 64, 256):
        books = vs.pq_train(emb, m=8, k=cb_k, iters=2)
        rec = 0
        for qid, q in queries:
            body = emb.filter(F.col("vec_id") != qid)
            top = vs.pq_rerank_topk(body, books, q, k=kk, shortlist=shortlist)
            rec += len({int(r[0]) for r in top.collect()} & truth[qid])
        print(
            json.dumps(
                {
                    "path": "pq_rerank",
                    "codebook_k": cb_k,
                    "shortlist": shortlist,
                    "recall_at_k": round(rec / (kk * len(queries)), 4),
                    "n_corpus": n_corpus,
                    "sf_dir": sf_dir,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
