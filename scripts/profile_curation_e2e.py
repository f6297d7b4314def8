#!/usr/bin/env python
"""Stage-by-stage wall profile of curation_end_to_end at a fixture dir
(bench session shape). Times each pipeline prefix with the noop sink so
the delta between consecutive rows is that stage's marginal cost.

Usage: python scripts/profile_curation_e2e.py [SF_DIR]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from graphragdatapipeline_spark.io import read_table
    from graphragdatapipeline_spark.operators import curation as cu
    from graphragdatapipeline_spark.operators import dedup as dd
    from graphragdatapipeline_spark.registries.dedup_oracles import (
        BANDS,
        MAX_BUCKET,
        NUM_HASHES,
    )
    from graphragdatapipeline_spark.session import ensure_parallelism, get_session

    spark = get_session(
        "profile-curation", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    spark.sparkContext.setLogLevel("ERROR")
    read_table(spark, sf_dir, "documents").count()

    def noop(df, label):
        spark.sparkContext.setJobDescription(label)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        print(f"{label}: {dt:.3f}s", flush=True)
        spark.sparkContext.setJobDescription(None)
        return dt

    d = read_table(spark, sf_dir, "documents")
    d1 = dd.exact_dedup(d, "doc_id", "text")
    noop(d1, "d1 exact_dedup")

    sig = dd.minhash_signatures_rowwise(
        ensure_parallelism(d1), "doc_id", "text", k=3, num_hashes=NUM_HASHES
    )
    bands = dd.lsh_bands(sig, "doc_id", NUM_HASHES, BANDS).localCheckpoint(eager=False)
    cands = dd.lsh_candidate_pairs(bands, "doc_id", max_bucket=MAX_BUCKET)
    mega = dd.lsh_mega_bucket_drops(bands, "doc_id", MAX_BUCKET)
    sh = dd.shingle_table(d1, "doc_id", "text", k=3)
    pairs = dd.jaccard_pairs(sh, "doc_id", threshold=0.2, candidates=cands)
    d2 = dd.dedup_corpus(d1, pairs.select("a", "b"), "doc_id").join(
        mega, "doc_id", "left_anti"
    )
    noop(d2, "d2 neardup corpus")

    sub = dd.remove_duplicated_spans(d2, "doc_id", "text", k=3, min_df=2)
    d3 = (
        d2.select("doc_id", "lang")
        .join(sub.select("doc_id", F.col("cleaned_text").alias("text")), "doc_id")
        .localCheckpoint(eager=False)
    )
    noop(d3, "d3 substring-clean checkpoint")

    t0 = time.perf_counter()
    clf = cu.quality_classifier(d3, "doc_id", "text", iters=25, lr=1.0)
    print(f"clf fit (25 driver iters): {time.perf_counter() - t0:.3f}s", flush=True)
    noop(clf, "clf scored output")

    d4 = d3.join(
        clf.filter(F.col("clf_keep")).select("doc_id", "n_tokens", "clf_score"),
        "doc_id",
    )
    bench = d.filter(F.col("doc_id") % 97 == 0)
    dec = cu.decontaminate(d4, bench, id_col="doc_id", text_col="text", k=3, min_shared=2)
    noop(dec, "dec decontaminate")

    d5 = d4.join(dec.filter(~F.col("contaminated")).select("doc_id"), "doc_id")
    d6 = cu.train_test_split(d5, "doc_id", test_rate=0.1)
    packed = cu.pack_into_sequences(
        d6.withColumn("_nc", F.length("text")),
        shard_col="lang", order_cols=["doc_id"], token_col="_nc", budget=4000,
    )
    out = packed.select(
        "doc_id", "lang", "split", "n_tokens", "clf_score",
        "seq_index", "seq_offset",
    )
    noop(out, "full e2e (warm subtrees)")
    spark.stop()


if __name__ == "__main__":
    main()
