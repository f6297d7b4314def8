#!/usr/bin/env python
"""Measured recall@k vs exact bruteforce for the composed ANN read
paths, across their cost knobs — the quality-vs-cost evidence behind
the registered defaults (the registered queries pin recall only at
pytest-fixture scale; this measures it at sf1.0 = 20k vectors).

For each of N_QUERIES query vectors and each (path, knob) config, runs
the REAL engine read path (the same vector/similarity.py functions the
registry queries call) and scores |retrieved ∩ exact-top-k| / k.
Also records the mean candidate fraction (rows whose full/quantized
vectors are scored) — the 100 TB cost axis.

Usage: python scripts/ann_recall_curves.py [SF_DIR] [N_QUERIES] [K]
Defaults: /tmp/sf1.0, 16 queries (vec_id 100..115), k=8.
Prints one JSON line per config plus a summary table on stderr.
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
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1.0"
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_session(
        "ann-recall", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    spark.sparkContext.setLogLevel("ERROR")

    emb = read_table(spark, sf_dir, "embeddings").localCheckpoint(eager=True)
    n_corpus = emb.count()
    # Query set: a contiguous id range clear of the hyperplane rows
    # (vec_id 1..8 double as LSH planes, per the registered query).
    qrows = (
        emb.filter(F.col("vec_id").between(100, 100 + n_queries - 1))
        .select("vec_id", "embedding")
        .collect()
    )
    queries = [(int(r[0]), [float(x) for x in r[1]]) for r in qrows]
    planes = emb.filter(F.col("vec_id").between(1, 8)).select(
        F.col("vec_id").alias("h_id"), "embedding"
    )

    # ---- shared indexes, trained ONCE (index build, not per-query)
    books = vs.pq_train(emb, m=8, k=16, iters=2)
    assigned, cents = vs.kmeans_cells(emb, k=16, iters=3)
    assigned = assigned.localCheckpoint(eager=True)
    codes = vs.sq8_encode(emb).localCheckpoint(eager=True)

    def exact_topk(qid: int, q: list[float]) -> set[int]:
        rows = vs.cosine_topk(emb.filter(F.col("vec_id") != qid), q, k=k).collect()
        return {int(r[0]) for r in rows}

    truth = {qid: exact_topk(qid, q) for qid, q in queries}

    results = []

    def record(path: str, knob: str, got: dict[int, set[int]], cand_frac: float) -> None:
        rec = sum(len(got[qid] & truth[qid]) for qid, _ in queries) / (
            k * len(queries)
        )
        row = {
            "path": path,
            "knob": knob,
            "recall_at_k": round(rec, 4),
            "k": k,
            "n_queries": len(queries),
            "mean_candidate_frac": round(cand_frac, 5),
            "sf_dir": sf_dir,
            "n_corpus": n_corpus,
        }
        results.append(row)
        print(json.dumps(row), flush=True)

    # ---- LSH multi-probe (R=8 planes) at Hamming radius 0 / 1 / 2
    h_rows = [
        (int(r[0]), [float(x) for x in r[1]])
        for r in planes.select("h_id", "embedding").collect()
    ]
    sig_col = vs.lsh_signature_col(h_rows, F.col("embedding"))
    sigs = emb.withColumn("_b", sig_col).select("vec_id", "_b").localCheckpoint(True)

    def lsh_run(radius: int) -> None:
        got, cand_total = {}, 0
        for qid, q in queries:
            qb = 0
            for h_id, h in h_rows:
                acc = 0.0
                for a, b in zip(q, h):
                    acc += a * b
                if acc > 0:
                    qb |= 1 << (h_id - 1)
            probe = {qb}
            if radius >= 1:
                probe |= {qb ^ (1 << (h - 1)) for h, _ in h_rows}
            if radius >= 2:
                ids = [h for h, _ in h_rows]
                for i in range(len(ids)):
                    for j in range(i + 1, len(ids)):
                        probe.add(qb ^ (1 << (ids[i] - 1)) ^ (1 << (ids[j] - 1)))
            cand_ids = sigs.filter(
                F.col("_b").isin(list(probe)) & (F.col("vec_id") != qid)
            ).select("vec_id")
            cand = emb.join(cand_ids, "vec_id")
            cand_total += cand.count()
            got[qid] = {
                int(r[0]) for r in vs.cosine_topk(cand, q, k=k).collect()
            }
        record("lsh_probe", f"hamming<={radius}", got, cand_total / len(queries) / n_corpus)

    for radius in (0, 1, 2):
        lsh_run(radius)

    # ---- PQ-ADC shortlist -> exact rerank (m=8, k=16 codebooks)
    def pq_run(shortlist: int) -> None:
        got = {}
        for qid, q in queries:
            body = emb.filter(F.col("vec_id") != qid)
            top = vs.pq_rerank_topk(body, books, q, k=k, shortlist=shortlist)
            got[qid] = {int(r[0]) for r in top.collect()}
        # ADC scans codes for ALL rows (cheap), full vectors only for
        # the shortlist: the candidate fraction is shortlist/N.
        record("pq_rerank", f"shortlist={shortlist}", got, shortlist / n_corpus)

    for shortlist in (8, 16, 32, 64, 128):
        pq_run(shortlist)

    # ---- SQ8 quantized scan (no knob; 1 byte/dim scan, no rerank)
    got = {}
    for qid, q in queries:
        top = vs.sq8_topk(codes.filter(F.col("vec_id") != qid), q, k=k)
        got[qid] = {int(r[0]) for r in top.collect()}
    record("sq8_scan", "direct", got, 1.0)

    # ---- IVF (nlist=16) -> SQ8 shortlist -> exact rerank, by nprobe
    cellsize = {
        int(r[0]): int(r[1])
        for r in assigned.groupBy("cell").agg(F.count(F.lit(1))).collect()
    }

    def ivf_run(nprobe: int, shortlist: int = 32) -> None:
        got, cand_total = {}, 0
        for qid, q in queries:
            def sqd(c):
                acc = 0.0
                for a, b in zip(q, c):
                    acc += (a - b) * (a - b)
                return acc

            order = sorted(range(len(cents)), key=lambda ci: (sqd(cents[ci]), ci))
            probe_cells = order[:nprobe]
            members = assigned.filter(F.col("cell").isin(probe_cells)).select("vec_id")
            cand_total += sum(cellsize.get(c, 0) for c in probe_cells)
            cand_codes = codes.join(members, "vec_id").filter(F.col("vec_id") != qid)
            short_ids = vs.sq8_topk(cand_codes, q, k=shortlist).select("vec_id")
            top = vs.cosine_topk(emb.join(short_ids, "vec_id"), q, k=k)
            got[qid] = {int(r[0]) for r in top.collect()}
        record(
            "ivf_sq8_rerank",
            f"nprobe={nprobe},shortlist={shortlist}",
            got,
            cand_total / len(queries) / n_corpus,
        )

    for nprobe in (1, 2, 4, 8):
        ivf_run(nprobe)

    print(
        "\n".join(
            f"{r['path']:16s} {r['knob']:24s} recall@{k}={r['recall_at_k']:.3f} "
            f"cand={r['mean_candidate_frac']:.4f}"
            for r in results
        ),
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
