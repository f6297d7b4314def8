

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


def test_lsh_probe_topk_recall_and_candidate_fraction(spark):
    """Probe-and-rerank must (a) recover planted cosine-near neighbors
    with high recall vs exact bruteforce and (b) score only a fraction
    of the corpus — the whole point of the probe."""
    import numpy as np

    from pyspark.sql import functions as F
    from graphragdatapipeline_spark.vector import similarity as vs

    rng = np.random.default_rng(42)
    dim, n_noise, n_planted, k = 32, 500, 20, 8
    q = rng.normal(size=dim)
    q /= np.linalg.norm(q)
    rows = []
    # planted near-neighbors: q + small noise → cosine ≈ 0.97
    for i in range(n_planted):
        v = q + 0.15 * rng.normal(size=dim)
        rows.append((i, [float(x) for x in v]))
    # background corpus: random directions (cosine ≈ 0)
    for i in range(n_planted, n_planted + n_noise):
        v = rng.normal(size=dim)
        rows.append((i, [float(x) for x in v]))
    corpus = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")
    planes = spark.createDataFrame(
        [(r + 1, [float(x) for x in rng.normal(size=dim)]) for r in range(8)],
        "h_id LONG, embedding ARRAY<DOUBLE>",
    )
    qv = [float(x) for x in q]

    exact = {r.vec_id for r in vs.cosine_topk(corpus, qv, k=k).collect()}
    probed = {r.vec_id for r in vs.lsh_probe_topk(corpus, planes, qv, k=k).collect()}
    recall = len(exact & probed) / k
    assert recall >= 0.75, f"recall@{k}={recall} (exact={exact}, probed={probed})"

    # candidate fraction: the probe filter must exclude most of the corpus
    h_rows = [(int(r[0]), [float(x) for x in r[1]]) for r in planes.collect()]
    sig = vs.lsh_signature_col(h_rows, F.col("embedding"))
    qb = 0
    for h_id, h_vec in h_rows:
        if sum(a * b for a, b in zip(qv, h_vec)) > 0:
            qb |= 1 << (h_id - 1)
    probe = [qb] + [qb ^ (1 << i) for i in range(len(h_rows))]
    n_cand = corpus.filter(sig.isin(probe)).count()
    assert n_cand < (n_noise + n_planted) * 0.25, n_cand


def test_lsh_signature_col_matches_bucket_join(spark, sf_dir):
    """The zero-shuffle map-side signature must agree exactly with the
    crossJoin+groupBy formulation for every corpus vector."""
    from pyspark.sql import functions as F
    from graphragdatapipeline_spark.io import read_table
    from graphragdatapipeline_spark.vector import similarity as vs

    e = read_table(spark, sf_dir, "embeddings")
    planes = e.filter(F.col("vec_id").between(1, 8)).select(
        F.col("vec_id").alias("h_id"), "embedding"
    )
    joined = vs.lsh_hyperplane_buckets(e, planes)
    h_rows = [
        (int(r[0]), [float(x) for x in r[1]])
        for r in planes.select("h_id", "embedding").collect()
    ]
    mapped = e.select(
        "vec_id", vs.lsh_signature_col(h_rows, F.col("embedding")).alias("bucket")
    )
    diff = joined.alias("a").join(mapped.alias("b"), "vec_id").filter(
        F.col("a.bucket") != F.col("b.bucket")
    )
    assert diff.count() == 0


def test_lsh_signature_col_plan_has_no_exchange(spark, sf_dir):
    """Signature computation is map-side: no Exchange in the plan."""
    from pyspark.sql import functions as F
    from graphragdatapipeline_spark.io import read_table
    from graphragdatapipeline_spark.vector import similarity as vs

    e = read_table(spark, sf_dir, "embeddings")
    planes = [(r + 1, [0.1 * (i - 3) for i in range(8)]) for r in range(4)]
    sig = e.select("vec_id", vs.lsh_signature_col(planes, F.col("embedding")).alias("b"))
    plan = sig._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_kmeans_cells_deterministic_and_separates(spark):
    """Quantized k-means: bit-identical across runs, and on clearly
    separated clusters it recovers the planted structure exactly."""
    import numpy as np

    from graphragdatapipeline_spark.vector import similarity as vs

    rng = np.random.default_rng(5)
    rows = []
    centers = [np.array([5.0, 0.0]), np.array([-5.0, 0.0]), np.array([0.0, 5.0])]
    for i in range(90):
        c = centers[i % 3]
        v = c + 0.3 * rng.normal(size=2)
        rows.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")
    a1, c1 = vs.kmeans_cells(df, k=3, iters=5)
    a2, c2 = vs.kmeans_cells(df, k=3, iters=5)
    s1 = sorted(tuple(r) for r in a1.collect())
    assert s1 == sorted(tuple(r) for r in a2.collect()) and c1 == c2
    # planted clusters recovered: all points of one residue class share a cell
    by_cell = {}
    for vid, cell in s1:
        by_cell.setdefault(vid % 3, set()).add(cell)
    assert all(len(cells) == 1 for cells in by_cell.values())
    assert len({next(iter(c)) for c in by_cell.values()}) == 3


def test_kmeans_arrow_assignment_matches_fold(spark, sf_dir):
    """The Arrow-vectorized nearest-centroid path (the 100 TB shape,
    auto-selected for k > 16) must produce the same training run as
    the oracle-exact fold expression on real fixture embeddings —
    same assignments AND same final centroids. Continuous embeddings
    have no equidistant boundary ties, so ulp-level distance
    differences cannot flip an argmin here."""
    from graphragdatapipeline_spark.io import read_table
    from graphragdatapipeline_spark.vector import similarity as vs

    e = read_table(spark, sf_dir, "embeddings")
    a_fold, c_fold = vs.kmeans_cells(e, k=8, iters=3, assign_path="fold")
    a_arrow, c_arrow = vs.kmeans_cells(e, k=8, iters=3, assign_path="arrow")
    assert c_fold == c_arrow
    assert sorted(map(tuple, a_fold.collect())) == sorted(
        map(tuple, a_arrow.collect())
    )


def test_lsh_probe_topk_gapped_hyperplane_ids(spark):
    """Probe bits must come from the actual h_id values (1 << (h_id-1)),
    not positional order: with gapped ids the positional flip probes
    buckets no signature can produce (ADVICE r6). Planes with ids
    {1,3,5} must give the same result as the same planes renumbered
    contiguously {1,2,3} — the signature remaps, but recall must not
    silently vanish."""
    import numpy as np

    from graphragdatapipeline_spark.vector import similarity as vs

    rng = np.random.default_rng(7)
    dim, k = 16, 5
    q = rng.normal(size=dim)
    rows = [
        (i, [float(x) for x in (q + 0.1 * rng.normal(size=dim))])
        for i in range(30)
    ]
    corpus = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")
    vecs = [[float(x) for x in rng.normal(size=dim)] for _ in range(3)]
    qv = [float(x) for x in q]
    gapped = spark.createDataFrame(
        [(hid, v) for hid, v in zip((1, 3, 5), vecs)],
        "h_id LONG, embedding ARRAY<DOUBLE>",
    )
    contiguous = spark.createDataFrame(
        [(hid, v) for hid, v in zip((1, 2, 3), vecs)],
        "h_id LONG, embedding ARRAY<DOUBLE>",
    )
    got_g = {r.vec_id for r in vs.lsh_probe_topk(corpus, gapped, qv, k=k).collect()}
    got_c = {r.vec_id for r in vs.lsh_probe_topk(corpus, contiguous, qv, k=k).collect()}
    assert got_g == got_c and len(got_c) == k


def test_kmeans_cells_corpus_smaller_than_k(spark):
    """k > |corpus| must clamp to the seedable cluster count instead of
    IndexError-ing in the empty-cluster branch (ADVICE r6); an empty
    corpus raises a clear ValueError."""
    import pytest

    from graphragdatapipeline_spark.vector import similarity as vs

    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "vec_id LONG, embedding ARRAY<DOUBLE>"
    )
    assigned, cents = vs.kmeans_cells(df, k=5, iters=2)
    assert len(cents) == 2
    assert {r.cell for r in assigned.collect()} <= {0, 1}

    empty = df.filter("vec_id < 0")
    with pytest.raises(ValueError, match="empty"):
        vs.kmeans_cells(empty, k=3)


def test_real_embedder_rung_contract(spark):
    """The SentenceTransformer rung is never an untested path (gated
    like exact Leiden): with the lib installed, the UDF must satisfy
    the embed contract (array<float>, unit L2 norm, None passthrough);
    without it, embed_text_udf_real raises the honest gate and
    embedder_from_env falls back to the hash projection with the SAME
    contract — checked here either way."""
    import math

    import pytest

    from pyspark.sql import functions as F
    from graphragdatapipeline_spark.vector import similarity as vs

    try:
        import sentence_transformers  # noqa: F401

        udf = vs.embed_text_udf_real()
    except ImportError:
        with pytest.raises(NotImplementedError, match="sentence-transformers"):
            vs.embed_text_udf_real()
        udf = vs.embedder_from_env(dim=16)

    df = spark.createDataFrame(
        [(0, "hello world"), (1, None), (2, "grete palucca")],
        "doc_id LONG, text STRING",
    )
    rows = {r.doc_id: r.emb for r in
            df.select("doc_id", udf(F.col("text")).alias("emb")).collect()}
    assert rows[1] is None
    for k in (0, 2):
        vec = rows[k]
        assert vec is not None and len(vec) >= 16
        assert abs(math.sqrt(sum(x * x for x in vec)) - 1.0) < 1e-5


def test_embedder_from_env_gates_on_variable(spark, monkeypatch):
    """Unset → hash projection (the oracle-able default). Set without
    the lib installed → the honest NotImplementedError, never a silent
    fallback that would mask a misconfigured production job."""
    import pytest

    from graphragdatapipeline_spark.vector import similarity as vs

    monkeypatch.delenv("SPARK_GRAFT_EMBED_MODEL", raising=False)
    assert vs.embedder_from_env(dim=8) is not None  # hash path builds

    monkeypatch.setenv("SPARK_GRAFT_EMBED_MODEL", "some/model")
    try:
        import sentence_transformers  # noqa: F401
    except ImportError:
        with pytest.raises(NotImplementedError):
            vs.embedder_from_env()


def test_pq_train_encode_adc_contract(spark):
    """PQ contract on a planted two-cluster corpus: codebooks are
    deterministic across retrains, codes stay in [0, k), and ADC
    ranks the query's own cluster ahead of the far cluster — the
    approximate distance must preserve the coarse geometry even
    though each vector is compressed to m codes."""
    from pyspark.sql import functions as F
    from graphragdatapipeline_spark.vector import similarity as vs

    rows = []
    for i in range(40):  # cluster A around +1 in the first half-space
        base = [1.0 + (i % 7) * 0.01] * 4 + [0.0] * 4
        rows.append((i, base))
    for i in range(40, 80):  # cluster B around -1 in the second half-space
        base = [0.0] * 4 + [-1.0 - (i % 5) * 0.01] * 4
        rows.append((i, base))
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")

    books = vs.pq_train(df, m=2, k=4, iters=2)
    books2 = vs.pq_train(df, m=2, k=4, iters=2)
    assert books == books2  # quantized training is run-deterministic
    assert len(books) == 2 and all(len(b) == 4 for b in books)
    assert all(len(c) == 4 for b in books for c in b)

    codes = df.select(
        "vec_id", *[c.alias(f"code_{i}") for i, c in enumerate(vs.pq_encode_cols(books, F.col("embedding")))]
    ).collect()
    for r in codes:
        assert 0 <= r.code_0 < 4 and 0 <= r.code_1 < 4

    query = [1.0] * 4 + [0.0] * 4  # sits in cluster A
    top = vs.pq_adc_topk(df, books, query, k=10).collect()
    assert len(top) == 10
    assert all(r.vec_id < 40 for r in top)  # all hits from cluster A
    # ADC distances are non-decreasing in rank and far cluster scores worse
    dists = [r.adc_dist for r in top]
    assert dists == sorted(dists)


def test_kmeans_shared_init_matches_per_subspace_init(spark):
    """pq_train's single shared init collect (r14) must seed each
    subspace k-means with exactly what that subspace's own TakeOrdered
    would have collected: train each slice BOTH ways and compare
    centroids AND assignments bit-for-bit."""
    import math

    from pyspark.sql import functions as F
    from graphragdatapipeline_spark.vector import similarity as vs

    def q6(x: float) -> float:
        return math.floor(x * 1_000_000 + 0.5) / 1_000_000

    rows = [
        (i, [float((i * 13 + d * 5) % 17) / 4.0 - 2.0 for d in range(8)])
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")
    k, subdim = 4, 4
    init_rows = (
        df.orderBy("vec_id")
        .limit(k)
        .select(
            F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("v")
        )
        .collect()
    )
    for mi in range(2):
        lo = mi * subdim
        seed = [
            [q6(float(x)) for x in r["v"][lo : lo + subdim]] for r in init_rows
        ]
        sub = df.select(
            "vec_id",
            F.slice(F.col("embedding"), lo + 1, subdim).alias("embedding"),
        )
        a_df, a_c = vs.kmeans_cells(sub, k=k, iters=2, init_centroids=seed)
        b_df, b_c = vs.kmeans_cells(sub, k=k, iters=2)
        assert a_c == b_c
        assert sorted(map(tuple, a_df.collect())) == sorted(
            map(tuple, b_df.collect())
        )


def test_pq_adc_matches_table_lookup_locally(spark):
    """ADC scores are exactly the sum of per-subspace table entries at
    each vector's code — recompute driver-side for every row."""
    from pyspark.sql import functions as F
    from graphragdatapipeline_spark.vector import similarity as vs

    rows = [(i, [float((i * 7 + d * 3) % 11) - 5.0 for d in range(8)]) for i in range(24)]
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")
    books = vs.pq_train(df, m=2, k=4, iters=2)
    query = [0.5] * 8
    out = {
        r.vec_id: r.adc_dist
        for r in vs.pq_adc_topk(df, books, query, k=24).collect()
    }
    codes = {
        r.vec_id: (r.c0, r.c1)
        for r in df.select(
            "vec_id",
            vs.pq_encode_cols(books, F.col("embedding"))[0].alias("c0"),
            vs.pq_encode_cols(books, F.col("embedding"))[1].alias("c1"),
        ).collect()
    }

    def table(book, qsub):
        out = []
        for c in book:
            acc = 0.0
            for a, b in zip(qsub, c):
                acc += (a - b) * (a - b)
            out.append(acc)
        return out

    t0, t1 = table(books[0], query[:4]), table(books[1], query[4:])
    for vid, (c0, c1) in codes.items():
        assert out[vid] == t0[c0] + t1[c1]


def test_pq_rerank_recovers_exact_topk(spark):
    """With a shortlist wide enough to cover the query's cluster, the
    ADC-shortlist → exact-rerank path returns exactly the bruteforce
    cosine top-k (the IVFPQ recall contract at full probe width)."""
    from graphragdatapipeline_spark.vector import similarity as vs

    rows = []
    for i in range(40):
        rows.append((i, [1.0 + (i % 7) * 0.01] * 4 + [0.01 * (i % 3)] * 4))
    for i in range(40, 80):
        rows.append((i, [0.0] * 4 + [-1.0 - (i % 5) * 0.01] * 4))
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")
    books = vs.pq_train(df, m=2, k=4, iters=2)
    query = [1.0] * 4 + [0.0] * 4
    exact = [r.vec_id for r in vs.cosine_topk(df, query, k=8).collect()]
    rr = [r.vec_id for r in
          vs.pq_rerank_topk(df, books, query, k=8, shortlist=40).collect()]
    assert rr == exact


def test_pq_stored_codes_match_inline(spark):
    """The encode-at-ingest path (code_cols over pq_encode_cols
    columns) must return exactly the inline-encode results for both
    pq_adc_topk and pq_rerank_topk — stored codes are the same
    expression materialized once, so this is a pure scan-shape swap
    (the 100 TB probe shape: m stored ints per row instead of a k-way
    nearest-centroid fold per query)."""
    from pyspark.sql import functions as F

    from graphragdatapipeline_spark.vector import similarity as vs

    rows = []
    for i in range(60):
        rows.append((i, [1.0 + (i % 7) * 0.01] * 4 + [0.01 * (i % 3)] * 4))
    for i in range(60, 120):
        rows.append((i, [0.0] * 4 + [-1.0 - (i % 5) * 0.01] * 4))
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")
    books = vs.pq_train(df, m=2, k=4, iters=2)
    enc = df.select(
        "vec_id",
        "embedding",
        *[
            c.alias(f"pq_{i}")
            for i, c in enumerate(vs.pq_encode_cols(books, F.col("embedding")))
        ],
    )
    query = [1.0] * 4 + [0.0] * 4
    inline_adc = [tuple(r) for r in vs.pq_adc_topk(df, books, query, k=10).collect()]
    stored_adc = [
        tuple(r)
        for r in vs.pq_adc_topk(
            enc, books, query, k=10, code_cols=["pq_0", "pq_1"]
        ).collect()
    ]
    assert stored_adc == inline_adc
    inline_rr = [
        r.vec_id for r in vs.pq_rerank_topk(df, books, query, k=8, shortlist=20).collect()
    ]
    stored_rr = [
        r.vec_id
        for r in vs.pq_rerank_topk(
            enc, books, query, k=8, shortlist=20, code_cols=["pq_0", "pq_1"]
        ).collect()
    ]
    assert stored_rr == inline_rr


def test_sq8_reconstruction_error_bound(spark):
    """Dequantized components sit within scale/2 of the originals —
    the SQ8 contract that bounds the similarity perturbation."""
    from graphragdatapipeline_spark.vector import similarity as vs

    df = spark.createDataFrame(
        [(1, [0.13, -2.7, 3.14, 0.0]), (2, [5.0, 5.0, 5.0, 5.0])],
        "vec_id long, embedding array<double>",
    )
    enc = {r.vec_id: r for r in vs.sq8_encode(df).collect()}
    orig = {1: [0.13, -2.7, 3.14, 0.0], 2: [5.0, 5.0, 5.0, 5.0]}
    for vid, r in enc.items():
        assert all(0 <= c <= 255 for c in r.codes)
        for c, x in zip(r.codes, orig[vid]):
            assert abs((r.mn + c * r.scale) - x) <= r.scale / 2 + 1e-12
    # constant vector: degenerate range → scale 1, all codes 0, exact
    assert enc[2].scale == 1.0 and enc[2].codes == [0, 0, 0, 0]
    assert enc[2].mn == 5.0


def test_sq8_topk_recall_vs_exact(spark, sf_dir):
    """SQ8 top-8 vs exact top-8 on the fixture corpus: quantization at
    8 bits barely moves cosine, so overlap must stay high (≥ 6/8)."""
    from graphragdatapipeline_spark.io import read_table
    from graphragdatapipeline_spark.vector import similarity as vs

    from pyspark.sql import functions as F

    emb = read_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") != 0)
    row = read_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") == 0).first()
    q = [float(x) for x in row.embedding]
    exact = {r.vec_id for r in vs.cosine_topk(emb, q, k=8).collect()}
    sq8 = {r.vec_id for r in vs.sq8_topk(vs.sq8_encode(emb), q, k=8).collect()}
    assert len(exact & sq8) >= 6


def test_ivf_sq8_full_shortlist_matches_ivf_probe(spark, sf_dir):
    """With the shortlist opened to the whole cell, the SQ8 stage
    cannot drop the true top-k — the rerank must reproduce the exact
    in-cell probe result (quantization only reorders the SHORTLIST
    boundary, never the exact-rescored survivors)."""
    from graphragdatapipeline_spark.io import read_table
    from graphragdatapipeline_spark.registry import REGISTRY
    from graphragdatapipeline_spark.vector import similarity as vs
    from pyspark.sql import functions as F

    e = read_table(spark, sf_dir, "embeddings")
    assigned, cents = vs.kmeans_cells(e, k=4, iters=3)
    row = e.filter(F.col("vec_id") == 0).first()
    q = [float(x) for x in row.embedding]

    def sqd(c):
        acc = 0.0
        for a, b in zip(q, c):
            acc += (a - b) * (a - b)
        return acc

    qcell = min(range(len(cents)), key=lambda ci: (sqd(cents[ci]), ci))
    members = assigned.filter(F.col("cell") == qcell).select("vec_id")
    cand = e.join(members, "vec_id").filter(F.col("vec_id") != 0)
    n_cell = cand.count()
    short = vs.sq8_topk(vs.sq8_encode(cand), q, k=n_cell).select("vec_id")
    reranked = [
        r.vec_id
        for r in vs.cosine_topk(cand.join(short, "vec_id"), q, k=5).collect()
    ]
    probe = [
        r.vec_id
        for r in REGISTRY["vector_ivf_probe_trained"].fn(spark, sf_dir).collect()
    ]
    assert reranked == probe


def test_residual_col_subtracts_assigned_centroid(spark):
    """residual_col must equal v − centroid[nearest cell], component
    by component, both inline and with a stored cell column."""
    from pyspark.sql import functions as F

    from graphragdatapipeline_spark.vector import similarity as vs

    cents = [[0.0, 0.0, 0.0, 0.0], [10.0, 10.0, 10.0, 10.0]]
    rows = [(1, [0.5, -0.25, 0.0, 1.0]), (2, [9.0, 10.5, 11.0, 10.0])]
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")
    got = {
        r.vec_id: (r.cell, r.res)
        for r in df.select(
            "vec_id",
            vs.nearest_centroid_col(cents, F.col("embedding")).alias("cell"),
            vs.residual_col(cents, F.col("embedding")).alias("res"),
        ).collect()
    }
    assert got[1][0] == 0 and got[1][1] == [0.5, -0.25, 0.0, 1.0]
    assert got[2][0] == 1 and got[2][1] == [-1.0, 0.5, 1.0, 0.0]
    # stored-cell variant is identical
    with_cell = df.withColumn(
        "cell", vs.nearest_centroid_col(cents, F.col("embedding"))
    )
    got2 = {
        r.vec_id: r.res
        for r in with_cell.select(
            "vec_id",
            vs.residual_col(
                cents, F.col("embedding"), F.col("cell")
            ).alias("res"),
        ).collect()
    }
    assert {v: r[1] for v, r in got.items()} == got2


def test_ivfpq_residual_full_probe_recovers_exact_topk(spark):
    """IVFADC recall floor: with nprobe = n_cells and a shortlist
    covering the corpus, the residual-PQ read path returns exactly the
    bruteforce cosine top-k (same contract as pq_rerank's)."""
    from graphragdatapipeline_spark.vector import similarity as vs

    rows = []
    for i in range(40):
        rows.append((i, [1.0 + (i % 7) * 0.01] * 4 + [0.01 * (i % 3)] * 4))
    for i in range(40, 80):
        rows.append((i, [0.0] * 4 + [-1.0 - (i % 5) * 0.01] * 4))
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")
    _, cents = vs.kmeans_cells(df, k=2, iters=3)
    books = vs.pq_train(df, m=2, k=4, iters=2, centroids=cents)
    assert len(books) == 2 and all(len(b) == 4 for b in books)
    query = [1.0] * 4 + [0.0] * 4
    exact = [r.vec_id for r in vs.cosine_topk(df, query, k=8).collect()]
    got = [
        r.vec_id
        for r in vs.ivfpq_residual_topk(
            df, cents, books, query, k=8, nprobe=2, shortlist=80
        ).collect()
    ]
    assert got == exact
    # residual training is run-deterministic like raw pq_train
    assert books == vs.pq_train(df, m=2, k=4, iters=2, centroids=cents)


def test_ivfpq_residual_stored_codes_match_inline(spark):
    """Encode-at-ingest for IVFADC: stored (cell, residual codes) must
    return exactly the inline-encode results — same expressions
    materialized once (the scan-shape contract the raw-PQ twin pins in
    test_pq_stored_codes_match_inline)."""
    from pyspark.sql import functions as F

    from graphragdatapipeline_spark.vector import similarity as vs

    rows = []
    for i in range(60):
        rows.append((i, [1.0 + (i % 7) * 0.01] * 4 + [0.01 * (i % 3)] * 4))
    for i in range(60, 120):
        rows.append((i, [0.0] * 4 + [-1.0 - (i % 5) * 0.01] * 4))
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")
    _, cents = vs.kmeans_cells(df, k=2, iters=3)
    books = vs.pq_train(df, m=2, k=4, iters=2, centroids=cents)
    with_cell = df.withColumn(
        "cell", vs.nearest_centroid_col(cents, F.col("embedding"))
    )
    enc = with_cell.select(
        "vec_id",
        "embedding",
        "cell",
        *[
            c.alias(f"rpq_{i}")
            for i, c in enumerate(
                vs.pq_encode_cols(
                    books,
                    vs.residual_col(cents, F.col("embedding"), F.col("cell")),
                )
            )
        ],
    )
    query = [1.0] * 4 + [0.2] * 4
    for nprobe in (1, 2):
        inline = [
            tuple(r)
            for r in vs.ivfpq_residual_topk(
                df, cents, books, query, k=6, nprobe=nprobe, shortlist=12
            ).collect()
        ]
        stored = [
            tuple(r)
            for r in vs.ivfpq_residual_topk(
                enc,
                cents,
                books,
                query,
                k=6,
                nprobe=nprobe,
                shortlist=12,
                cell_col="cell",
                code_cols=["rpq_0", "rpq_1"],
            ).collect()
        ]
        assert stored == inline


def test_cosine_topk_arrow_matches_fold(spark, sf_dir):
    """score_path="arrow" (numpy matmul kernel) must rank exactly like
    the default interpreted fold on distinct-sim data, agree that a
    NULL embedding scores NULL (desc-sorts to the back), and score a
    zero-norm vector NULL — never NaN (which would sort to the FRONT
    of Spark's double ordering and corrupt top-k), and unlike the
    fold, which raises DIVIDE_BY_ZERO under ANSI (Spark 4 default)."""
    from pyspark.sql import functions as F
    from graphragdatapipeline_spark.io import read_table
    from graphragdatapipeline_spark.vector import similarity as vs

    e = read_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    q = [float(x) for x in e.filter(F.col("vec_id") == 0).first().embedding]
    fold = vs.cosine_topk(e, q, k=10).collect()
    arrow = vs.cosine_topk(e, q, k=10, score_path="arrow").collect()
    assert [r.vec_id for r in arrow] == [r.vec_id for r in fold]
    for fa, ar in zip(fold, arrow):
        assert abs(fa.sim - ar.sim) < 1e-9

    dim = len(q)
    deg = spark.createDataFrame(
        [
            (1, [1.0] * dim),
            (2, None),
            (3, [0.0] * dim),
            (4, [float(i) for i in range(dim)]),
        ],
        "vec_id long, embedding array<float>",
    )
    import pytest
    from pyspark.errors.exceptions.captured import ArithmeticException

    a = {
        r.vec_id: r.sim
        for r in vs.cosine_topk(deg, q, k=10, score_path="arrow").collect()
    }
    assert set(a) == {1, 2, 3, 4}
    assert a[2] is None and a[3] is None
    nondeg = deg.filter(F.col("vec_id") != 3)
    f = {r.vec_id: r.sim for r in vs.cosine_topk(nondeg, q, k=10).collect()}
    assert f[2] is None
    for i in (1, 4):
        assert abs(f[i] - a[i]) < 1e-9
    # the fold's zero-norm behavior under ANSI (Spark 4 default) is an
    # error — the arrow path's NULL is the deliberate serving-side
    # divergence the docstring records
    with pytest.raises(ArithmeticException):
        vs.cosine_topk(deg, q, k=10).collect()


def test_vector_index_probe_arrow_score_path(spark, tmp_path):
    """The probe's score_path="arrow" must return the same top-k as
    the default fold over a maintained index (upserts + a tombstone in
    the tail, both compaction states)."""
    import os
    import time

    import graphragdatapipeline_spark.streaming.ops as so

    cents = [[0.0, 0.0], [10.0, 10.0]]
    ddl = "vec_id bigint, embedding array<float>"
    in_dir = str(tmp_path / "input")
    os.makedirs(in_dir)
    s0 = spark.createDataFrame(
        [(i, [float(i % 7) + 0.1, float((i * 3) % 5) + 0.2]) for i in range(1, 31)]
        + [(100, [9.0, 9.1]), (101, [9.5, 9.0])],
        ddl,
    )
    s1 = spark.createDataFrame([(5, [0.4, 0.6]), (9, None)], ddl)
    for i, sl in enumerate([s0, s1]):
        sl.coalesce(1).write.parquet(os.path.join(in_dir, f"slice={i}"))
        time.sleep(1.1)
    index_dir = str(tmp_path / "index")
    stream = (
        spark.readStream.schema(ddl)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir + "/slice=*")
    )
    so.vector_index_sink(
        stream, cents, index_dir, str(tmp_path / "ckpt")
    ).awaitTermination(120)

    def both(qvec, nprobe):
        fold = so.vector_index_probe(
            spark, index_dir, cents, qvec, k=8, nprobe=nprobe
        ).collect()
        arrow = so.vector_index_probe(
            spark, index_dir, cents, qvec, k=8, nprobe=nprobe,
            score_path="arrow",
        ).collect()
        assert [r.vec_id for r in arrow] == [r.vec_id for r in fold]
        for fa, ar in zip(fold, arrow):
            assert abs(fa.sim - ar.sim) < 1e-9

    for qvec in ([0.3, 0.4], [9.2, 9.3]):
        for nprobe in (1, 2):
            both(qvec, nprobe)
    so.compact_vector_index(spark, index_dir, gc=True)
    for qvec in ([0.3, 0.4], [9.2, 9.3]):
        for nprobe in (1, 2):
            both(qvec, nprobe)


def test_cosine_topk_batch_arrow_matches_fold(spark, sf_dir):
    """The batch k-NN scale path (mapInPandas matmul + per-batch local
    top-k + global window) must return exactly the fold cross-join
    ranking — including across partition boundaries, where a wrong
    local-top-k order (e.g. ties broken by position instead of id)
    would surface as a different global top-k."""
    from pyspark.sql import functions as F
    from graphragdatapipeline_spark.io import read_table
    from graphragdatapipeline_spark.vector import similarity as vs

    e = read_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    queries = e.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    # repartition so every query's top-k spans several corpus partitions
    corpus = e.filter(F.col("vec_id") % 50 != 0).repartition(7)
    fold = vs.cosine_topk_batch(corpus, queries, k=6).collect()
    arrow = vs.cosine_topk_batch(
        corpus, queries, k=6, score_path="arrow"
    ).collect()
    fkey = sorted((r.q_id, r.rank, r.vec_id) for r in fold)
    akey = sorted((r.q_id, r.rank, r.vec_id) for r in arrow)
    assert akey == fkey
    fsim = {(r.q_id, r.vec_id): r.sim for r in fold}
    for r in arrow:
        assert abs(fsim[(r.q_id, r.vec_id)] - r.sim) < 1e-9
    n_q = queries.count()
    assert len(arrow) == n_q * 6
    # NULL corpus rows are excluded by the arrow kernel, not crashed on
    corpus2 = corpus.unionByName(
        spark.createDataFrame(
            [(999999, None)], "vec_id long, embedding array<float>"
        )
    )
    arrow2 = vs.cosine_topk_batch(
        corpus2, queries, k=6, score_path="arrow"
    ).collect()
    assert sorted((r.q_id, r.rank, r.vec_id) for r in arrow2) == fkey


def test_cosine_topk_score_path_guards(spark, sf_dir):
    """The arrow knobs fail LOUD: unknown score_path raises (a typo
    must not silently measure the slow fold), a zero-norm/NULL QUERY
    vector raises up front (its NaN sims would rank k arbitrary rows
    first), an empty query table returns an empty result, and the
    derived kernel schema carries non-bigint id columns."""
    import pytest

    from pyspark.sql import functions as F
    from graphragdatapipeline_spark.io import read_table
    from graphragdatapipeline_spark.vector import similarity as vs

    e = read_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    q = [float(x) for x in e.first().embedding]
    dim = len(q)
    with pytest.raises(ValueError, match="score_path"):
        vs.cosine_topk(e, q, k=3, score_path="Arrow")
    with pytest.raises(ValueError, match="query vector"):
        vs.cosine_score_udf([0.0] * dim)

    queries = e.limit(3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    with pytest.raises(ValueError, match="score_path"):
        vs.cosine_topk_batch(e, queries, k=3, score_path="numpy")
    zq = spark.createDataFrame(
        [(1, [0.0] * dim), (2, q)], "q_id long, q_vec array<float>"
    )
    with pytest.raises(ValueError, match="query vectors"):
        vs.cosine_topk_batch(e, zq, k=3, score_path="arrow")
    nq = spark.createDataFrame(
        [(1, None), (2, q)], "q_id long, q_vec array<float>"
    )
    with pytest.raises(ValueError, match="NULL query vectors"):
        vs.cosine_topk_batch(e, nq, k=3, score_path="arrow")
    empty = queries.filter(F.col("q_id") < 0)
    assert vs.cosine_topk_batch(e, empty, k=3, score_path="arrow").count() == 0

    # string ids survive the arrow kernel's derived schema on both sides
    sc = e.limit(40).select(
        F.concat(F.lit("d-"), F.col("vec_id")).alias("doc"), "embedding"
    )
    sq = queries.select(
        F.concat(F.lit("q-"), F.col("q_id")).alias("q_id"), "q_vec"
    )
    fold = vs.cosine_topk_batch(
        sc, sq, k=4, id_col="doc"
    ).collect()
    arrow = vs.cosine_topk_batch(
        sc, sq, k=4, id_col="doc", score_path="arrow"
    ).collect()
    assert sorted((r.q_id, r.rank, r.doc) for r in arrow) == sorted(
        (r.q_id, r.rank, r.doc) for r in fold
    )
