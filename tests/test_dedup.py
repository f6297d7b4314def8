

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


def test_lsh_mega_bucket_drops_keeps_min_representative(spark):
    """Buckets over the cap resolve cluster-level: min-id survives,
    every other member is returned as a drop; small buckets untouched.
    A doc in BOTH a mega and a small bucket is still dropped (full-band
    agreement with a mega cluster wins)."""
    from graphragdatapipeline_spark.operators import dedup as dd

    rows = []
    # mega-bucket: ids 0..29 share (0, 999); small: (100, 101) share (1, 7);
    # id 5 also appears in a small bucket (2, 8)
    for i in range(30):
        rows.append((i, 0, 999))
    rows += [(100, 1, 7), (101, 1, 7), (5, 2, 8), (102, 2, 8)]
    bands = spark.createDataFrame(rows, "doc_id LONG, band_idx INT, band_hash LONG")
    drops = {r.doc_id for r in dd.lsh_mega_bucket_drops(bands, "doc_id", 10).collect()}
    assert drops == set(range(1, 30))  # 0 is the representative; 100/101/102 kept


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


def test_exact_dedup_incremental_equals_batch_at_once(spark, sf_dir):
    """Two-batch incremental ingest (id-ordered batches) must keep
    exactly the docs that a whole-corpus exact_dedup keeps, and the
    index must accumulate one fp per kept doc."""
    from pyspark.sql import functions as F

    from graphragdatapipeline_spark.io import read_table
    from graphragdatapipeline_spark.operators import dedup as dd

    d = read_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    mid = d.approxQuantile("doc_id", [0.5], 0.001)[0]
    b1, b2 = d.filter(F.col("doc_id") <= mid), d.filter(F.col("doc_id") > mid)

    c1, idx1 = dd.exact_dedup_incremental(b1, None, "doc_id", "text")
    idx1 = idx1.localCheckpoint()
    c2, idx2 = dd.exact_dedup_incremental(b2, idx1, "doc_id", "text")

    got = {r.doc_id for r in c1.collect()} | {r.doc_id for r in c2.collect()}
    want = {r.doc_id for r in dd.exact_dedup(d, "doc_id", "text").collect()}
    assert got == want
    assert idx1.count() + idx2.count() == len(want)


def test_minhash_dedup_incremental_equals_batch_at_once(spark, sf_dir):
    """Incremental LSH ingest keeps exactly the docs the one-shot
    minhash corpus dedup keeps (id-ordered batches => first-seen ==
    min-id representative), and the band index grows by bands-per-doc
    for every kept doc. Equality requires each duplicate cluster to be
    band-connected to its surviving representative — true on this
    corpus (and typical duplication); where it isn't, incremental
    keeps the newcomer (index semantics) while one-shot drops it."""
    from pyspark.sql import functions as F

    from graphragdatapipeline_spark.io import read_table
    from graphragdatapipeline_spark.operators import dedup as dd

    d = read_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    mid = d.approxQuantile("doc_id", [0.5], 0.001)[0]
    b1, b2 = d.filter(F.col("doc_id") <= mid), d.filter(F.col("doc_id") > mid)

    c1, bd1 = dd.minhash_dedup_incremental(b1, None, "doc_id", "text")
    bd1 = bd1.localCheckpoint()
    c2, bd2 = dd.minhash_dedup_incremental(b2, bd1, "doc_id", "text")

    got = {r.doc_id for r in c1.collect()} | {r.doc_id for r in c2.collect()}
    pairs = dd.minhash_dedup_pairs(d, "doc_id", "text")
    want = {
        r.doc_id for r in dd.dedup_corpus(d.select("doc_id"), pairs, "doc_id").collect()
    }
    assert got == want
    assert bd1.count() + bd2.count() == 4 * len(got)


def test_dup_cluster_assignments_transitive_and_singletons(spark):
    """A~B, B~C must land A, B, C in ONE cluster labeled by the min id
    even though A~C was never scored; docs in no pair are singletons of
    size 1."""
    from graphragdatapipeline_spark.operators import dedup as dd

    docs = spark.createDataFrame([(i,) for i in (1, 2, 3, 9)], "doc_id LONG")
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "a LONG, b LONG")
    rows = {r.doc_id: r for r in dd.dup_cluster_assignments(docs, pairs, "doc_id").collect()}
    assert {rows[i].cluster_id for i in (1, 2, 3)} == {1}
    assert all(rows[i].cluster_size == 3 for i in (1, 2, 3))
    assert rows[9].cluster_id == 9 and rows[9].cluster_size == 1


def test_keep_best_by_quality_prefers_fluent_member(spark, sf_dir):
    """On a crafted cluster the kept member must be the lowest-CE doc
    (common-vocabulary copy), NOT the min id — the semantic difference
    from dedup_corpus's min-id rule."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from graphragdatapipeline_spark.operators import dedup as dd
    from graphragdatapipeline_spark.text.analysis import (
        lm_score_against_index,
        lm_token_index_delta,
    )

    docs = spark.createDataFrame(
        [
            (1, "zzq vvk wwj zzq"),          # rare tokens → high CE
            (2, "the the cat the the cat"),  # common tokens → low CE
            (7, "the cat"),
        ],
        "doc_id LONG, text STRING",
    )
    pairs = spark.createDataFrame([(1, 2)], "a LONG, b LONG")
    clusters = dd.dup_cluster_assignments(docs, pairs, "doc_id")
    scores = lm_score_against_index(docs, lm_token_index_delta(docs))
    ranked = (
        clusters.join(scores, "doc_id", "left")
        .withColumn("_q", (-F.col("sum_lq")) / F.col("n_tokens"))
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("cluster_id").orderBy(F.asc("_q"), F.asc("doc_id"))
            ),
        )
        .filter("_rn = 1")
    )
    kept = {r.doc_id for r in ranked.collect()}
    assert kept == {2, 7}  # doc 2 beats min-id doc 1 on fluency


def test_remove_duplicated_spans_semantics(spark):
    """Hand-computed span removal: shared 5-token tail covered by its
    3-grams is cut from both hosts; the unique doc is untouched
    (modulo whitespace normalization); identical short docs vanish;
    sub-k unique docs keep their whole-doc shingle and survive."""
    from graphragdatapipeline_spark.operators import dedup as dd

    docs = spark.createDataFrame(
        [
            (1, "Alpha beta gamma delta shared tail one two three"),
            (2, "omega Shared tail one two three unique ending here"),
            (3, "totally  different\ttext with no overlap at all"),
            (4, "tiny doc"),
            (5, "same small text"),
            (6, "same small text"),
        ],
        "doc_id LONG, text STRING",
    )
    out = {
        r.doc_id: r
        for r in dd.remove_duplicated_spans(docs, "doc_id", "text").collect()
    }
    # shared tail "shared tail one two three" (case-insensitive match,
    # original case kept elsewhere) is excised from both hosts
    assert out[1].cleaned_text == "Alpha beta gamma delta"
    assert out[2].cleaned_text == "omega unique ending here"
    assert out[1].n_removed == 5 and out[2].n_removed == 5
    # unique doc: untouched tokens, whitespace normalized
    assert out[3].cleaned_text == "totally different text with no overlap at all"
    assert out[3].n_removed == 0 and not out[3].flag_dup
    # sub-k unique doc: whole-doc shingle, no other doc has it
    assert out[4].cleaned_text == "tiny doc"
    assert out[4].n_shingles == 1 and out[4].n_shared == 0
    # exact short duplicates: fully covered, removed entirely
    assert out[5].cleaned_text == "" and out[6].cleaned_text == ""
    assert out[5].n_removed == 3 and out[5].flag_dup


def test_remove_duplicated_spans_subsequence_and_counts(spark):
    """Invariants on fixture data: cleaned tokens are an ordered
    subsequence of the original tokens, n_removed + len(cleaned) ==
    n_tokens, and a doc with zero shared shingles round-trips."""
    from pyspark.sql import functions as F

    from graphragdatapipeline_spark.io import read_table
    from graphragdatapipeline_spark.operators import dedup as dd

    d = read_table(spark, "/root/testdata/sf0.001", "documents").limit(200)
    out = dd.remove_duplicated_spans(d, "doc_id", "text").join(
        d, "doc_id"
    )
    for r in out.collect():
        orig = [t for t in r.text.split() if t]
        kept = [t for t in r.cleaned_text.split() if t]
        assert r.n_tokens == len(orig)
        assert r.n_removed + len(kept) == r.n_tokens
        # ordered-subsequence check
        it = iter(orig)
        assert all(any(o == k for o in it) for k in kept), r.doc_id


def test_remove_spans_incremental_equals_one_shot(spark):
    """Two-batch ingest (delta-merged shingle-df index, each batch
    scored against the MERGED index) must equal the one-shot removal
    over the union — the accumulation-exactness contract of
    shingle_df_delta."""
    from pyspark.sql import functions as F

    from graphragdatapipeline_spark.operators import dedup as dd

    rows = [
        (1, "Alpha beta gamma delta shared tail one two three"),
        (2, "omega Shared tail one two three unique ending here"),
        (3, "totally different text with no overlap at all"),
        (4, "same small text"),
    ]
    rows2 = [
        (5, "same small text"),
        (6, "prefix words then shared tail one two three trailing bit"),
    ]
    b1 = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    b2 = spark.createDataFrame(rows2, "doc_id LONG, text STRING")
    merged = (
        dd.shingle_df_delta(b1, "doc_id", "text")
        .unionByName(dd.shingle_df_delta(b2, "doc_id", "text"))
        .groupBy("shingle")
        .agg(F.sum("nd").alias("nd"))
    )
    incremental = dd.remove_spans_against_index(
        b1, merged, "doc_id", "text"
    ).unionByName(dd.remove_spans_against_index(b2, merged, "doc_id", "text"))
    one_shot = dd.remove_duplicated_spans(b1.unionByName(b2), "doc_id", "text")
    got = {tuple(r) for r in incremental.collect()}
    want = {tuple(r) for r in one_shot.collect()}
    assert got == want
    # the cross-batch duplicate pair (4, 5) must actually be cut
    by_id = {r.doc_id: r for r in one_shot.collect()}
    assert by_id[4].cleaned_text == "" and by_id[5].cleaned_text == ""


def test_remove_spans_external_reference_decontamination(spark):
    """min_df=1 against an EXTERNAL index is span-level
    decontamination: any span the reference corpus contains is cut,
    everything else survives — including shingles absent from the
    index (nd=0 via the left join)."""
    from graphragdatapipeline_spark.operators import dedup as dd

    reference = spark.createDataFrame(
        [(900, "the quick brown fox jumps")], "doc_id LONG, text STRING"
    )
    batch = spark.createDataFrame(
        [(1, "intro words here the quick brown fox jumps and more text")],
        "doc_id LONG, text STRING",
    )
    idx = dd.shingle_df_delta(reference, "doc_id", "text")
    out = dd.remove_spans_against_index(
        batch, idx, "doc_id", "text", min_df=1
    ).collect()[0]
    assert out.cleaned_text == "intro words here and more text"
    assert out.n_removed == 5
