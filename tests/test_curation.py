"""Property tests for training-data curation operators: stability of
hash sampling/splits, packing budget invariants, decontamination hits.
Value parity vs DuckDB is covered by test_oracle_parity.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphragdatapipeline_spark.io import read_table
from graphragdatapipeline_spark.operators import curation as cu


def _docs(spark, sf_dir):
    return read_table(spark, sf_dir, "documents")


def test_split_disjoint_exhaustive_and_stable(spark, sf_dir):
    d = _docs(spark, sf_dir)
    s = cu.train_test_split(d, "doc_id", test_rate=0.2)
    rows = {r["split"]: r["count"] for r in s.groupBy("split").count().collect()}
    assert set(rows) <= {"train", "test"}
    assert sum(rows.values()) == d.count()
    # membership is a row property: identical under any repartitioning
    a = {r.doc_id: r.split for r in s.select("doc_id", "split").collect()}
    s2 = cu.train_test_split(d.repartition(7, "lang"), "doc_id", test_rate=0.2)
    b = {r.doc_id: r.split for r in s2.select("doc_id", "split").collect()}
    assert a == b
    # rate lands near the target (hash uniformity, 500 rows)
    assert 0.1 < rows.get("test", 0) / sum(rows.values()) < 0.3


def test_deterministic_sample_is_subset_property_not_run_property(spark, sf_dir):
    d = _docs(spark, sf_dir)
    s1 = {r.doc_id for r in cu.deterministic_sample(d, "doc_id", 0.25).collect()}
    s2 = {
        r.doc_id
        for r in cu.deterministic_sample(d.repartition(11), "doc_id", 0.25).collect()
    }
    assert s1 == s2 and 0 < len(s1) < d.count()
    # nested rates: a 10% sample is a subset of the 25% sample
    s3 = {r.doc_id for r in cu.deterministic_sample(d, "doc_id", 0.10).collect()}
    assert s3 <= s1


def test_mixture_sample_weights_oversampling_and_shuffle_key(spark, sf_dir):
    """Each source draws an independent salted coin at its own weight;
    weight > 1 replicates rows across epochs; the union tags
    provenance; the shuffle key is a deterministic row property whose
    ORDER BY realizes a reproducible permutation."""
    d = _docs(spark, sf_dir).select("doc_id", "lang")
    en, rest = d.filter(F.col("lang") == "en"), d.filter(F.col("lang") != "en")
    mixed = cu.mixture_sample([(en, 0.7), (rest, 1.4)], key="doc_id")
    got = {(r.doc_id, r.source_id, r.epoch) for r in mixed.collect()}
    n_en, n_rest = en.count(), rest.count()
    k0 = sum(1 for _, s, _ in got if s == 0)
    k1 = sum(1 for _, s, _ in got if s == 1)
    # rates land near the per-source targets (hash uniformity); the
    # oversampled source yields MORE rows than it has
    assert 0.55 < k0 / n_en < 0.85
    assert 1.2 < k1 / n_rest < 1.6
    # every oversampled row has epoch 0; only a ~0.4 fraction epoch 1
    e0 = {i for i, s, e in got if s == 1 and e == 0}
    e1 = {i for i, s, e in got if s == 1 and e == 1}
    assert len(e0) == n_rest and e1 < e0
    # stable under repartitioning — membership is a row property
    mixed2 = cu.mixture_sample(
        [(en.repartition(5), 0.7), (rest.repartition(3), 1.4)], key="doc_id"
    )
    assert {(r.doc_id, r.source_id, r.epoch) for r in mixed2.collect()} == got
    # a different seed draws a DIFFERENT fractional epoch (salting works)
    other = cu.mixture_sample([(en, 0.7), (rest, 1.4)], key="doc_id", seed="m2")
    assert {(r.doc_id, r.source_id, r.epoch) for r in other.collect()} != got
    # shuffle key: epoch-aware (replicas land at independent spots),
    # deterministic across runs and partitionings
    sk = cu.shuffle_key(
        F.concat(F.col("doc_id").cast("string"), F.lit("|"), F.col("epoch").cast("string"))
    )
    perm1 = [(r.doc_id, r.epoch) for r in mixed.select("doc_id", "epoch", sk.alias("sk")).orderBy("sk").collect()]
    perm2 = [(r.doc_id, r.epoch) for r in mixed2.select("doc_id", "epoch", sk.alias("sk")).orderBy("sk").collect()]
    assert perm1 == perm2
    assert perm1 != sorted(perm1)  # it actually permutes
    # replicas are not adjacent: epoch-0/epoch-1 copies of the same doc
    # separated by at least one other row almost surely
    pos = {pair: idx for idx, pair in enumerate(perm1)}
    adjacent = sum(
        1 for i in e1 if abs(pos[(i, 0)] - pos[(i, 1)]) == 1
    )
    assert adjacent < max(3, len(e1) // 10)


def test_pack_sequences_budget_invariants(spark, sf_dir):
    budget = 4000
    d = _docs(spark, sf_dir).select("doc_id", "lang", "n_chars")
    p = cu.pack_into_sequences(d, "lang", ["doc_id"], "n_chars", budget)
    rows = p.collect()
    assert len(rows) == d.count()
    by_shard: dict[str, list] = {}
    for r in rows:
        by_shard.setdefault(r.lang, []).append(r)
    for lang, rs in by_shard.items():
        rs.sort(key=lambda r: r.doc_id)
        # offsets replay the exclusive prefix sum
        prefix = 0
        for r in rs:
            assert r.seq_index == prefix // budget
            assert r.seq_offset == prefix % budget
            prefix += r.n_chars
        # each sequence overruns by at most its last chunk
        totals: dict[int, int] = {}
        for r in rs:
            totals[r.seq_index] = totals.get(r.seq_index, 0) + r.n_chars
        maxc = max(r.n_chars for r in rs)
        for tot in totals.values():
            assert tot < budget + maxc
        # sequence indexes are contiguous from 0
        assert sorted(totals) == list(range(len(totals)))


def test_decontaminate_flags_benchmark_members_and_spares_unique(spark, sf_dir):
    d = _docs(spark, sf_dir)
    bench = d.filter(F.col("doc_id") % 97 == 0)
    out = cu.decontaminate(d, bench, "doc_id", "text", k=3, min_shared=2)
    flagged = {r.doc_id for r in out.filter("contaminated").collect()}
    # every benchmark doc with >= 4 words shares >= 2 shingles with itself
    wc = bench.select(
        "doc_id", F.size(F.split(F.lower("text"), r"\s+")).alias("n")
    ).collect()
    for r in wc:
        if r.n >= 4:
            assert r.doc_id in flagged
    # output covers every doc exactly once
    assert out.count() == d.count()
    assert out.filter(F.col("shared_shingles").isNull()).count() == 0


def test_hash_bucket_range(spark, sf_dir):
    d = _docs(spark, sf_dir)
    b = d.select(cu.hash_bucket(F.col("doc_id")).alias("b"))
    mn, mx = b.agg(F.min("b"), F.max("b")).first()
    assert 0 <= mn and mx < 10_000


def test_repetition_stats_invariants(spark, sf_dir):
    from graphragdatapipeline_spark.text.analysis import word_repetition_stats

    d = _docs(spark, sf_dir)
    out = word_repetition_stats(d, "doc_id", "text")
    rows = out.collect()
    assert len(rows) == d.count()
    for r in rows:
        assert 0 < r.n_distinct_tokens <= r.n_tokens
        assert 0.0 < r.distinct_frac <= 1.0
        # most-frequent token covers at least the mean share
        assert r.top_token_frac >= 1.0 / r.n_distinct_tokens - 1e-4
        assert 0.0 < r.top_bigram_frac <= 1.0
    # hand-checked tiny doc: "a a a b" -> 4 tokens, 2 distinct,
    # top token 3/4, top bigram "a a" 2/3
    tiny = spark.createDataFrame([(1, "a a a b")], "doc_id long, text string")
    t = word_repetition_stats(tiny, "doc_id", "text").first()
    assert (t.n_tokens, t.n_distinct_tokens) == (4, 2)
    assert abs(t.top_token_frac - 0.75) < 1e-9
    assert abs(t.top_bigram_frac - 0.6667) < 1e-4


def test_redact_pii_masks_all_patterns(spark):
    from graphragdatapipeline_spark.operators.curation import redact_pii

    df = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@corp.example.org now"),
            (2, "call +1-555-0199 or 44-123-456 today"),
            (3, "host 192.168.0.1 and 10.0.255.3"),
            (4, "clean text with no pii at all"),
            (5, "combo a@b.io +1-555-0000 1.2.3.4"),
        ],
        "doc_id long, t string",
    )
    out = {r.doc_id: r for r in redact_pii(df, "doc_id", "t").collect()}
    assert (out[1].n_email, out[2].n_phone, out[3].n_ip) == (1, 2, 2)
    assert (out[4].n_email, out[4].n_phone, out[4].n_ip) == (0, 0, 0)
    assert (out[5].n_email, out[5].n_phone, out[5].n_ip) == (1, 1, 1)
    # redaction removed every match: counts on the redacted text are 0
    from pyspark.sql import functions as SF
    from graphragdatapipeline_spark.operators.curation import PII_PATTERNS

    red = df.select("doc_id", "t")
    for _, pat, repl in PII_PATTERNS:
        red = red.withColumn("t", SF.regexp_replace("t", pat, repl))
    for _, pat, _ in PII_PATTERNS:
        assert red.filter(SF.regexp_count("t", SF.lit(pat)) > 0).count() == 0


def test_stratified_sample_rates_and_stability(spark, sf_dir):
    d = _docs(spark, sf_dir)
    rates = {"en": 0.2, "de": 0.5, "es": 0.5, "fr": 0.5, "zh": 0.5}
    s = cu.stratified_sample(d, "doc_id", "lang", rates, default_rate=0.5)
    tot = {r.lang: r["count"] for r in d.groupBy("lang").count().collect()}
    kept = {r.lang: r["count"] for r in s.groupBy("lang").count().collect()}
    # en downsampled well below the others' rate
    assert kept["en"] / tot["en"] < 0.35
    for lang in ("de", "es", "fr", "zh"):
        assert 0.3 < kept.get(lang, 0) / tot[lang] < 0.7
    # partitioning-invariant membership
    a = {r.doc_id for r in s.select("doc_id").collect()}
    s2 = cu.stratified_sample(d.repartition(13), "doc_id", "lang", rates, 0.5)
    assert a == {r.doc_id for r in s2.select("doc_id").collect()}
    # a stratum's sample nests inside the plain sample at the same rate
    plain = {
        r.doc_id
        for r in cu.deterministic_sample(d, "doc_id", 0.5).collect()
    }
    non_en = {r.doc_id for r in s.filter("lang <> 'en'").collect()}
    assert non_en <= plain


def test_tfidf_top_terms_hand_checked(spark):
    from graphragdatapipeline_spark.text.analysis import tfidf_top_terms

    docs = spark.createDataFrame(
        [
            (1, "apple apple banana"),
            (2, "banana cherry"),
            (3, "cherry cherry cherry date"),
        ],
        "doc_id long, text string",
    )
    out = tfidf_top_terms(docs, "doc_id", "text", k=2)
    got = {
        (r.doc_id, r.rank): (r.term, r.tf, r.df) for r in out.collect()
    }
    # df: apple 1, banana 2, cherry 2, date 1
    assert got[(1, 1)] == ("apple", 2, 1)   # 2/1 beats 1/2
    assert got[(1, 2)] == ("banana", 1, 2)
    assert got[(2, 1)] == ("banana", 1, 2)  # tie 0.5 -> term asc
    assert got[(2, 2)] == ("cherry", 1, 2)
    assert got[(3, 1)] == ("cherry", 3, 2)  # 1.5 beats date 1/1
    assert got[(3, 2)] == ("date", 1, 1)


def test_quality_filter_rules_and_audit_trail(spark, sf_dir):
    d = _docs(spark, sf_dir)
    out = cu.quality_filter(d, "doc_id", "text")
    rows = out.collect()
    assert len(rows) == d.count()
    kept = [r for r in rows if r.keep]
    dropped = [r for r in rows if not r.keep]
    # non-vacuous: both sides populated
    assert kept and dropped
    # audit trail consistent with the verdict
    for r in rows:
        assert r.keep == (r.fail_reasons == "")
    # every short doc carries the too_short reason
    for r in rows:
        if r.n_tokens < 30:
            assert "too_short" in r.fail_reasons


def test_sample_per_group_deterministic_and_bounded(spark, sf_dir):
    d = _docs(spark, sf_dir)
    s = cu.sample_per_group(d, "doc_id", "lang", k=3)
    rows = s.collect()
    per = {}
    for r in rows:
        per[r.lang] = per.get(r.lang, 0) + 1
    assert all(n <= 3 for n in per.values()) and len(per) == 5
    # run-to-run and partitioning-invariant
    s2 = cu.sample_per_group(d.repartition(17), "doc_id", "lang", k=3)
    assert {r.doc_id for r in rows} == {r.doc_id for r in s2.collect()}
    # nested: the k=1 pick is a subset of the k=3 pick
    s1 = cu.sample_per_group(d, "doc_id", "lang", k=1)
    assert {r.doc_id for r in s1.collect()} <= {r.doc_id for r in rows}


def test_funnel_counts_hand_checked(spark):
    from datetime import datetime

    from graphragdatapipeline_spark.operators.relational import funnel_counts

    T = datetime
    rows = [
        # u1 completes in order: view@1h, click@2h, buy@3h
        (1, T(2024, 1, 1, 1), "view"), (1, T(2024, 1, 1, 2), "click"),
        (1, T(2024, 1, 1, 3), "purchase"),
        # u2 clicks BEFORE first view -> stops at view
        (2, T(2024, 1, 1, 2), "view"), (2, T(2024, 1, 1, 1), "click"),
        # u3 same-ts click (not strictly after) -> stops at view
        (3, T(2024, 1, 1, 1), "view"), (3, T(2024, 1, 1, 1), "click"),
        # u4 converts but outside the 24h window -> stops at view
        (4, T(2024, 1, 1, 1), "view"), (4, T(2024, 1, 3, 1), "click"),
        # u5 never views -> in no stage
        (5, T(2024, 1, 1, 1), "click"), (5, T(2024, 1, 1, 2), "purchase"),
    ]
    ev = spark.createDataFrame(rows, "user_id LONG, ts TIMESTAMP, event_type STRING")
    out = {r.stage: r.n_users for r in funnel_counts(
        ev, ["view", "click", "purchase"], max_gap_seconds=24 * 3600
    ).collect()}
    assert out == {"view": 4, "click": 1, "purchase": 1}


def test_cohort_retention_hand_checked(spark):
    from datetime import datetime

    from graphragdatapipeline_spark.operators.relational import cohort_retention

    T = datetime
    rows = [
        # u1 signs up week A, active weeks A and A+1
        (1, T(2024, 1, 1), "signup"), (1, T(2024, 1, 10), "click"),
        # u2 signs up week A, active only week A
        (2, T(2024, 1, 2), "signup"),
        # u3 never signs up -> excluded
        (3, T(2024, 1, 3), "click"),
        # u4 clicked BEFORE signup week -> pre-cohort activity excluded
        (4, T(2024, 1, 1), "click"), (4, T(2024, 1, 10), "signup"),
    ]
    ev = spark.createDataFrame(rows, "user_id LONG, ts TIMESTAMP, event_type STRING")
    out = {(r.cohort_week, r.week_offset): r.n_active
           for r in cohort_retention(ev, "signup").collect()}
    wA = (T(2024, 1, 1) - T(1970, 1, 1)).days // 7
    assert out[(wA, 0)] == 2          # u1 + u2 active in signup week
    assert out[(wA, 1)] == 1          # only u1 returns next week
    wB = (T(2024, 1, 10) - T(1970, 1, 1)).days // 7
    assert out[(wB, 0)] == 1          # u4's cohort starts at signup
    assert (wA, -1) not in out        # no negative offsets


def test_rolling_distinct_users_hand_checked(spark):
    from datetime import datetime

    from graphragdatapipeline_spark.operators.relational import rolling_distinct_users

    T = datetime
    rows = [
        (1, T(2024, 1, 1)), (2, T(2024, 1, 1)),     # day D: users 1,2
        (1, T(2024, 1, 5)),                          # day D+4: user 1
        (3, T(2024, 1, 20)),                         # far later: user 3
    ]
    ev = spark.createDataFrame(rows, "user_id LONG, ts TIMESTAMP")
    out = {r.day: r.n_active for r in rolling_distinct_users(ev, 7).collect()}
    d = (T(2024, 1, 1) - T(1970, 1, 1)).days
    assert out[d] == 2                      # window ending day D sees 1,2
    assert out[d + 4] == 2                  # D+4 sees 1 (twice) and 2 -> 2 distinct
    assert out[d + 7] == 1                  # D's events aged out; only D+4's user 1
    assert out[d + 19] == 1                 # user 3 alone
    assert d - 1 not in out                 # nothing before first event


def test_mixture_sample_rejects_bad_inputs(spark, sf_dir):
    import pytest

    import graphragdatapipeline_spark.operators.curation as cu
    from graphragdatapipeline_spark.io import read_table

    docs = read_table(spark, sf_dir, "documents")
    with pytest.raises(ValueError, match="non-empty"):
        cu.mixture_sample([], key="doc_id")
    with pytest.raises(ValueError, match="negative"):
        cu.mixture_sample([(docs, -0.5)], key="doc_id")


def test_global_row_number_matches_global_window(spark):
    """The distributed rank (range partition + local rank + offsets)
    must equal the single-partition global window bit-for-bit on a
    total order."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from graphragdatapipeline_spark.operators.relational import global_row_number

    df = spark.range(0, 1000).select(
        F.col("id"), F.md5(F.col("id").cast("string")).alias("k")
    )
    got = {
        (r.id, r.rn)
        for r in global_row_number(df, ["k", "id"], n_partitions=7).collect()
    }
    want = {
        (r.id, r.rn)
        for r in df.withColumn(
            "rn", F.row_number().over(Window.orderBy("k", "id")).cast("long")
        ).collect()
    }
    assert got == want and len(got) == 1000


def test_global_row_number_empty(spark):
    from graphragdatapipeline_spark.operators.relational import global_row_number

    empty = spark.createDataFrame([], "id LONG, k STRING")
    assert global_row_number(empty, ["k", "id"]).count() == 0


def test_dsir_weights_separate_domains(spark):
    """Planted two-domain corpus: target-domain docs must get positive
    log-likelihood ratios (target-like), the off-domain docs negative,
    and a fresh unseen doc written in target vocabulary must score
    target-like — the actual selection use case."""
    from pyspark.sql import functions as F

    from graphragdatapipeline_spark.operators.curation import dsir_importance_weights

    tgt_words = "alpha beta gamma delta epsilon"
    raw_words = "zork mumble frobnicate xyzzy plugh"
    rows = [(i, tgt_words, "en") for i in range(10)]
    rows += [(100 + i, raw_words, "de") for i in range(10)]
    rows.append((999, "alpha beta epsilon", "de"))  # unseen mix, target vocab
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {
        r.doc_id: r
        for r in dsir_importance_weights(df, F.col("lang") == "en").collect()
    }
    assert all(out[i].target_like and out[i].log_ratio > 0 for i in range(10))
    assert all(
        not out[100 + i].target_like and out[100 + i].log_ratio < 0
        for i in range(10)
    )
    assert out[999].target_like
    # n_features = unigrams + bigrams
    assert out[999].n_features == 3 + 2


def test_perplexity_bucket_sample_terciles(spark):
    """9 docs with cross-entropies 1..9: quantile_cont cutoffs put
    docs 1-3 in head, 4-6 in middle, 7-9 in tail. Rates (1,1,0)
    keep exactly head+middle; (1,0,0) keeps exactly head."""
    from graphragdatapipeline_spark.operators import curation as cu

    scored = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 10)], "doc_id LONG, cross_entropy DOUBLE"
    )
    both = cu.perplexity_bucket_sample(scored, rates=(1.0, 1.0, 0.0))
    rows = {r.doc_id: r.bucket for r in both.collect()}
    assert rows == {1: "head", 2: "head", 3: "head",
                    4: "middle", 5: "middle", 6: "middle"}
    head_only = cu.perplexity_bucket_sample(scored, rates=(1.0, 0.0, 0.0))
    assert {r.doc_id for r in head_only.collect()} == {1, 2, 3}


def test_temperature_sample_upsamples_tail_group(spark):
    """alpha<1 keeps a LARGER fraction of the small group: with 100
    big / 10 small docs, alpha=0.5, target=50, the small group's
    derived rate caps at 1.0 (every doc kept) while the big group is
    genuinely subsampled. Determinism: identical reruns."""
    from graphragdatapipeline_spark.operators import curation as cu

    rows = [(i, "big") for i in range(100)] + [(1000 + i, "small") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id LONG, lang STRING")
    kept = cu.temperature_sample(df, "lang", "doc_id", alpha=0.5, target=50)
    out = kept.collect()
    small = [r for r in out if r.lang == "small"]
    big = [r for r in out if r.lang == "big"]
    assert len(small) == 10            # rate capped at 1.0 — all kept
    assert 0 < len(big) < 100          # genuinely subsampled
    assert len(big) / 100 < 1.0
    rerun = cu.temperature_sample(df, "lang", "doc_id", alpha=0.5, target=50)
    assert sorted(r.doc_id for r in rerun.collect()) == sorted(r.doc_id for r in out)


def test_quality_classifier_learns_and_supersets_gate(spark):
    """The trained gate must (a) re-emit the quality_filter contract
    bit-identically, (b) learn a real ranking on a separable corpus:
    every rule-dropped doc scores strictly below every rule-kept doc,
    and the above-corpus-mean flag separates them."""
    from pyspark.sql import functions as F

    from graphragdatapipeline_spark.operators import curation as cu

    good = (
        "the cat sat on the mat and the dog lay in the sun by the door "
        "and a bird sang of the morning to the town in a calm clear way"
    )
    rows = [(i, good + f" extra word number {i}") for i in range(1, 9)]
    # short, stopword-free, long-word garbage — fails every rule
    rows += [(100 + i, f"zzzzqqqqwwww{i} xxxxyyyyzzzz{i}") for i in range(4)]
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")

    out = cu.quality_classifier(docs, "doc_id", "text", iters=25, lr=1.0)
    gate = {r.doc_id: r for r in cu.quality_filter(docs, "doc_id", "text").collect()}
    got = {r.doc_id: r for r in out.collect()}
    assert set(got) == set(gate)
    for i, g in gate.items():
        assert got[i].n_tokens == g.n_tokens
        assert got[i].keep == g.keep
        assert got[i].fail_reasons == g.fail_reasons
    kept_scores = [r.clf_score for r in got.values() if r.keep]
    drop_scores = [r.clf_score for r in got.values() if not r.keep]
    assert drop_scores and kept_scores
    assert max(drop_scores) < min(kept_scores)
    assert all(r.clf_keep for r in got.values() if r.keep)
    assert not any(r.clf_keep for r in got.values() if not r.keep)


def test_quality_classifier_deterministic_weights(spark):
    """Two independent runs must produce byte-identical scores — the
    quantized-GD loop is a pure function of the corpus (exact integer
    gradient sums, no float aggregation order-dependence)."""
    from graphragdatapipeline_spark.io import read_table
    from graphragdatapipeline_spark.operators import curation as cu

    d = read_table(spark, "/root/testdata/sf0.001", "documents")
    a = {r.doc_id: r.clf_score for r in cu.quality_classifier(d, "doc_id", "text").collect()}
    b = {
        r.doc_id: r.clf_score
        for r in cu.quality_classifier(
            d.repartition(7), "doc_id", "text"
        ).collect()
    }
    assert a == b
