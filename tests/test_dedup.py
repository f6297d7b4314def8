

def test_lsh_candidate_pairs_max_bucket_guardrail(spark):
    from graphragdatapipeline_spark.operators import dedup as dd
    from pyspark.sql import functions as F

    rows = []
    # mega-bucket: 30 ids share (0, 999); small bucket: 2 ids share (1, 7)
    for i in range(30):
        rows.append((i, 0, 999))
    rows += [(100, 1, 7), (101, 1, 7)]
    bands = spark.createDataFrame(rows, "doc_id LONG, band_idx INT, band_hash LONG")
    full = dd.lsh_candidate_pairs(bands, "doc_id").count()
    assert full == 30 * 29 // 2 + 1
    capped = dd.lsh_candidate_pairs(bands, "doc_id", max_bucket=10).collect()
    assert {(r.a, r.b) for r in capped} == {(100, 101)}


def test_simhash_near_dups_max_bucket_guardrail(spark):
    from graphragdatapipeline_spark.operators import dedup as dd

    # 12 identical fingerprints (mega-cluster) + one close pair
    rows = [(i, 0b1010101010101010) for i in range(12)]
    rows += [(100, 0b1111000011110000), (101, 0b1111000011110001)]
    fps = spark.createDataFrame(rows, "doc_id LONG, simhash LONG")
    full = dd.simhash_near_dups(fps, "doc_id").count()
    assert full == 12 * 11 // 2 + 1
    capped = dd.simhash_near_dups(fps, "doc_id", max_bucket=5).collect()
    assert {(r.a, r.b) for r in capped} == {(100, 101)}
