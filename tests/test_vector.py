

def test_near_dup_max_block_guardrail(spark):
    from graphragdatapipeline_spark.vector import similarity as vs

    rows = []
    # hot block: 20 identical vectors; small block: 3
    for i in range(20):
        rows.append((i, [1.0, 0.0], "hot"))
    for i in range(100, 103):
        rows.append((i, [0.0, 1.0], "cold"))
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>, label STRING")
    full = vs.embedding_near_dup_pairs(df, 0.99).collect()
    assert len(full) == 20 * 19 // 2 + 3  # hot pairs + cold pairs
    capped = vs.embedding_near_dup_pairs(df, 0.99, max_block=10).collect()
    # hot block dropped entirely; cold block untouched
    assert {(r.a, r.b) for r in capped} == {(100, 101), (100, 102), (101, 102)}
