"""Physical-plan assertions: the scale properties SURVEY §4 promises
are pinned here so a refactor can't silently regress them.

What a 100 TB run needs from these plans:
- dimension joins broadcast (no shuffle of the fact side's join key),
- filters and column pruning reaching the parquet scan,
- whole-stage codegen around the relational hot path,
- no row-at-a-time Python eval (BatchEvalPython) in any registered
  query — Python only ever appears as Arrow-batched kernels,
- rank-limited windows using WindowGroupLimit pushdown.
"""

from __future__ import annotations

import pytest

from graphragdatapipeline_spark.registry import REGISTRY


def _plan(spark, name, sf_dir):
    df = REGISTRY[name].fn(spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_dimension_joins_broadcast(spark, sf_dir):
    plan = _plan(spark, "community_metadata_rollup", sf_dir)
    assert "BroadcastHashJoin" in plan
    # the fact side must not sort-merge against the tiny dim
    assert plan.count("BroadcastHashJoin") >= 1


def test_filter_and_projection_pushdown(spark, sf_dir):
    plan = _plan(spark, "filter_project_pushdown", sf_dir)
    assert "PushedFilters: [IsNotNull" in plan
    # pruned read schema — 2 projected + 4 filter columns, never all 16
    assert "ReadSchema: struct<" in plan
    scan_schema = plan.split("ReadSchema: struct<", 1)[1].split("...", 1)[0]
    assert len(scan_schema.split(",")) <= 6


def test_no_row_at_a_time_python_in_any_query(spark, sf_dir):
    """Python may only appear Arrow-batched (ArrowEvalPython /
    MapInPandas / FlatMapGroupsInPandas) — BatchEvalPython is the
    10-100x-slower row-serialization path."""
    offenders = []
    for name, qd in sorted(REGISTRY.items()):
        plan = qd.fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        if "BatchEvalPython" in plan:
            offenders.append(name)
    assert offenders == []


def test_whole_stage_codegen_on_relational_path(spark, sf_dir):
    # toString() renders WholeStageCodegen stages as "*(n)" prefixes;
    # under AQE the final plan only exists after execution.
    df = REGISTRY["pricing_summary"].fn(spark, sf_dir)
    df.collect()  # finalize the AQE plan on THIS QueryExecution
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert "*(1)" in plan


def test_topk_window_uses_group_limit_pushdown(spark, sf_dir):
    """row_number()<=k filters must push a WindowGroupLimit below the
    sort — at scale this is the difference between sorting every
    group fully and keeping k rows per group."""
    plan = _plan(spark, "topk_per_group", sf_dir)
    assert "WindowGroupLimit" in plan


def test_minhash_signatures_have_no_exchange(spark, sf_dir):
    """The row-wise MinHash signature stage is map-only: no Exchange
    may appear below the LSH band join."""
    from graphragdatapipeline_spark.io import read_table
    from graphragdatapipeline_spark.operators import dedup as dd

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    sig = dd.minhash_signatures_rowwise(docs, "doc_id", "text")
    plan = sig._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_events_scan_prunes_partitions(spark, sf_dir, tmp_path):
    """Hive-partitioned layout + partition-key filter → PartitionFilters
    populated, unselected partitions never scanned."""
    from pyspark.sql import functions as F

    from graphragdatapipeline_spark.io import read_table, write_parquet

    events = read_table(spark, sf_dir, "events").withColumn(
        "day", F.to_date("ts")
    )
    path = str(tmp_path / "events_part")
    write_parquet(events, path, partition_by=["day"])
    scan = spark.read.parquet(path).filter(F.col("day") == "2024-01-01")
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "isnotnull(day" in plan or "day#" in plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]


def test_bucketed_join_has_no_join_exchange(spark, sf_dir, tmp_path):
    """Tables bucketed on the join key join WITHOUT shuffling — the
    write-time bucketing satisfies the join's distribution. (Broadcast
    disabled to force the sort-merge path a 100 TB fact-fact join
    takes.)"""
    import os

    from pyspark.sql import functions as F

    from graphragdatapipeline_spark.io import read_table, write_bucketed

    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    write_bucketed(o, "t_orders_b", ["o_custkey"], 8, path=os.path.join(str(tmp_path), "ob"))
    write_bucketed(c, "t_customer_b", ["c_custkey"], 8, path=os.path.join(str(tmp_path), "cb"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = spark.table("t_orders_b").join(
            spark.table("t_customer_b"), F.col("o_custkey") == F.col("c_custkey")
        )
        j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_salted_join_matches_plain_join(spark, sf_dir):
    """salted_join must be semantically identical to the plain equi
    join while spreading each key over salt_buckets partitions."""
    from pyspark.sql import functions as F

    from graphragdatapipeline_spark.io import read_table
    from graphragdatapipeline_spark.operators.relational import salted_join

    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_name"
    )
    plain = o.join(c, "o_custkey")
    salted = salted_join(o, c, "o_custkey", salt_buckets=4)
    assert sorted(salted.columns) == sorted(plain.columns)
    a = {tuple(r) for r in plain.collect()}
    b = {tuple(r) for r in salted.select(*plain.columns).collect()}
    assert a == b


def test_tfidf_broadcasts_df_table_and_group_limits(spark, sf_dir):
    """The df-count join must be broadcast (shuffling postings on
    token alone would hot-spot stopwords) and the per-doc top-k must
    be a WindowGroupLimit, not a full sort."""
    plan = _plan(spark, "text_tfidf_top_terms", sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "WindowGroupLimit" in plan


def test_map_side_curation_ops_have_no_shuffle(spark, sf_dir):
    """PII redaction and the quality gate are pure map expressions —
    any Exchange in their plans is a regression. The stratified sample
    may only exchange for the broadcast of the threshold table. (The
    gate rides the quality_filter OPERATOR now that its registry slot
    belongs to the trained classifier, which aggregates by design.)"""
    from graphragdatapipeline_spark.io import read_table
    from graphragdatapipeline_spark.operators.curation import quality_filter

    gate_plan = (
        quality_filter(read_table(spark, sf_dir, "documents"), "doc_id", "text")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in gate_plan
    for name in (
        "curation_pii_redaction",
        "curation_mixture_shuffle",
    ):
        plan = _plan(spark, name, sf_dir)
        assert "Exchange" not in plan, name
    plan = _plan(spark, "curation_sample_per_group", sf_dir)
    assert "WindowGroupLimit" in plan
    plan = _plan(spark, "curation_stratified_sample", sf_dir)
    import re
    non_broadcast = [
        ln for ln in plan.splitlines()
        if "Exchange" in ln and "BroadcastExchange" not in ln
    ]
    assert non_broadcast == []


def test_community_rollup_single_exchange_no_joins(spark, sf_dir):
    """r13 single-pass shape: the rollup must plan as ONE repartition
    exchange feeding both aggregation grains — no SortMergeJoin, no
    Window, no second shuffle. (The pre-r13 three-branch form planned
    3 customer scans + 3 Exchanges + 2 SMJs + 2 Windows because column
    pruning specialized each branch's projection below the 'shared'
    repartition; this pins the rewrite that removed them.)"""
    df = REGISTRY["community_metadata_rollup"].fn(spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # AQE toString() appends the pre-execution "== Initial Plan ==" after
    # the final plan; count exchanges in the executed section only.
    plan = plan.split("== Initial Plan ==", 1)[0]
    non_broadcast = [
        ln
        for ln in plan.splitlines()
        if "Exchange" in ln
        and "BroadcastExchange" not in ln
        and "ReusedExchange" not in ln
    ]
    assert len(non_broadcast) == 1, plan
    assert "SortMergeJoin" not in plan
    assert "Window" not in plan


def test_compact_parquet_merges_small_files_and_clusters(spark, sf_dir, tmp_path):
    """Compaction sizes output files from actual input bytes; with
    cluster_by, each output file covers a narrow disjoint key range
    (range partition + in-file sort), which is what lets parquet
    row-group stats prune key-range scans after the rewrite."""
    import os

    from pyspark.sql import functions as F

    from graphragdatapipeline_spark.io import compact_parquet, read_table

    src = os.path.join(str(tmp_path), "frag")
    dst = os.path.join(str(tmp_path), "compact")
    orders = read_table(spark, sf_dir, "orders")
    orders.repartition(64).write.parquet(src)  # 64 tiny fragments
    n_in = len(spark.read.parquet(src).inputFiles())
    total = sum(
        os.path.getsize(os.path.join(src, f))
        for f in os.listdir(src)
        if f.endswith(".parquet")
    )
    n_out = compact_parquet(spark, src, dst, target_bytes_per_file=total // 4 + 1)
    assert n_in == 64 and n_out <= 5
    a = spark.read.parquet(dst)
    assert a.count() == orders.count()

    dst2 = os.path.join(str(tmp_path), "clustered")
    compact_parquet(
        spark, src, dst2, target_bytes_per_file=total // 4 + 1,
        cluster_by=["o_orderkey"],
    )
    b = spark.read.parquet(dst2)
    assert b.count() == orders.count()
    ranges = (
        b.select("o_orderkey", F.input_file_name().alias("f"))
        .groupBy("f")
        .agg(F.min("o_orderkey").alias("lo"), F.max("o_orderkey").alias("hi"))
        .collect()
    )
    # disjoint key ranges across files = skippable layout
    spans = sorted((r.lo, r.hi) for r in ranges)
    assert len(spans) >= 2
    assert all(spans[i][1] <= spans[i + 1][0] for i in range(len(spans) - 1))


def test_key_skew_profile_values_and_plan(spark, sf_dir):
    """Profile values match a Python replay on a known-skewed key and
    the plan contains no global sort of the raw table (TakeOrdered on
    the per-key counts only)."""
    import collections

    from graphragdatapipeline_spark.io import read_table
    from graphragdatapipeline_spark.operators.relational import key_skew_profile

    li = read_table(spark, sf_dir, "lineitem").select("l_suppkey")
    prof = key_skew_profile(li, "l_suppkey", top_k=5)
    rows = prof.collect()
    cnt = collections.Counter(r.l_suppkey for r in li.collect())
    total, n_keys = sum(cnt.values()), len(cnt)
    expect = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert [(r.l_suppkey, r.n_rows) for r in rows] == expect
    top = rows[0]
    assert abs(top.share - top.n_rows / total) < 1e-12
    assert abs(top.skew_factor - top.n_rows * n_keys / total) < 1e-9
    plan = prof._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_zorder_compaction_bounds_both_dimensions(spark, sf_dir, tmp_path):
    """Z-order rewrite must give every output file a small bounding box
    in BOTH clustered columns; single-column clustering only bounds its
    own column. Bounding boxes are measured as normalized (max-min)
    spans per file."""
    import os

    from pyspark.sql import functions as F

    from graphragdatapipeline_spark.io import compact_parquet, read_table

    src = os.path.join(str(tmp_path), "src")
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    orders.repartition(16).write.parquet(src)
    total = sum(
        os.path.getsize(os.path.join(src, f))
        for f in os.listdir(src)
        if f.endswith(".parquet")
    )
    target = total // 16 + 1  # → ~16 output files

    def spans(path):
        d = spark.read.parquet(path)
        lo = {c: d.agg(F.min(c)).first()[0] for c in ("o_custkey", "o_totalprice")}
        hi = {c: d.agg(F.max(c)).first()[0] for c in ("o_custkey", "o_totalprice")}
        per_file = (
            d.select("o_custkey", "o_totalprice", F.input_file_name().alias("f"))
            .groupBy("f")
            .agg(
                F.min("o_custkey").alias("c_lo"), F.max("o_custkey").alias("c_hi"),
                F.min("o_totalprice").alias("p_lo"), F.max("o_totalprice").alias("p_hi"),
            )
            .collect()
        )
        c_w = hi["o_custkey"] - lo["o_custkey"]
        p_w = hi["o_totalprice"] - lo["o_totalprice"]
        cs = [(r.c_hi - r.c_lo) / c_w for r in per_file]
        ps = [(r.p_hi - r.p_lo) / p_w for r in per_file]
        return sum(cs) / len(cs), sum(ps) / len(ps)

    zdst = os.path.join(str(tmp_path), "zorder")
    n = compact_parquet(spark, src, zdst, target, zorder_by=["o_custkey", "o_totalprice"])
    assert n >= 4
    zc, zp = spans(zdst)

    cdst = os.path.join(str(tmp_path), "bykey")
    compact_parquet(spark, src, cdst, target, cluster_by=["o_custkey"])
    cc, cp = spans(cdst)

    # fragmented input: every file spans ~everything in both dims
    fc, fp = spans(src)
    assert fc > 0.9 and fp > 0.9
    # single-column clustering: tight on custkey, wide on price
    assert cc < 0.25 and cp > 0.9
    # z-order: meaningfully bounded in BOTH dimensions
    assert zc < 0.6 and zp < 0.6


def test_gap_fill_broadcasts_spine_joins(spark, sf_dir):
    """Gap filling must broadcast the spine-side joins — the fact
    table shuffles once for the hourly aggregate and never again."""
    plan = _plan(spark, "events_gap_fill", sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" in plan  # tiny spine × types cross


def test_zorder_key_validates_bit_budget(spark, sf_dir):
    """bits × len(cols) beyond a long must be rejected loudly, and a
    3-column key must still fit and produce distinct values."""
    import pytest
    from pyspark.sql import functions as F

    from graphragdatapipeline_spark.io import read_table, zorder_key

    o = read_table(spark, sf_dir, "orders")
    with pytest.raises(ValueError):
        zorder_key(o, ["o_orderkey", "o_custkey"], bits=32)
    z = o.withColumn(
        "_z", zorder_key(o, ["o_orderkey", "o_custkey", "o_totalprice"], bits=6)
    )
    n_distinct = z.select("_z").distinct().count()
    assert n_distinct > 100  # 2^18 key space actually spreads the data


def test_compact_parquet_rejects_same_src_dst(spark, tmp_path):
    import pytest

    from graphragdatapipeline_spark.io import compact_parquet

    d = str(tmp_path / "t")
    spark.range(10).write.parquet(d)
    with pytest.raises(ValueError, match="must differ"):
        compact_parquet(spark, d, d)


def test_histogram_and_moments_single_shuffle(spark, sf_dir):
    """The distribution-profile queries must stay one-shuffle: the
    histogram's min/max domain is a broadcast scalar (no extra
    exchange on the fact), and the moments aggregation is one
    partial-agg shuffle on the grouping key."""
    from graphragdatapipeline_spark.registry import REGISTRY

    for name in ("events_value_histogram", "events_value_moments"):
        df = REGISTRY[name].fn(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        n = plan.count("Exchange hashpartitioning")
        assert n <= 1, f"{name}: {n} hash exchanges\n{plan}"


def test_outliers_broadcasts_stats_not_fact(spark, sf_dir):
    """MAD outlier detection joins tiny per-type stats back to the
    fact table: both joins must be broadcast — the fact table is never
    shuffled for a join."""
    from graphragdatapipeline_spark.registry import REGISTRY

    df = REGISTRY["events_value_outliers"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "SortMergeJoin" not in plan, plan


def test_kmeans_assignment_is_map_side(spark, sf_dir):
    """The k-means ASSIGNMENT (the part that touches the corpus) is a
    pure map-side expression over broadcast centroid literals — no
    Exchange: at 100 TB each training iteration costs one scan plus a
    k·dim-row partial agg, never a corpus shuffle."""
    from graphragdatapipeline_spark.io import read_table
    from graphragdatapipeline_spark.vector import similarity as vs

    e = read_table(spark, sf_dir, "embeddings")
    assigned, _ = vs.kmeans_cells(e, k=4, iters=1)
    plan = assigned._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_vector_lsh_buckets_signature_is_mapside(spark, sf_dir):
    """The registered LSH bucketing query must compute signatures as a
    per-row expression: no join anywhere in the plan, and the ONLY
    Exchange is the bucket-histogram aggregation (plus AQE's possible
    read nodes) — never a crossJoin against the hyperplane table."""
    plan = _plan(spark, "vector_lsh_buckets", sf_dir)
    assert "Join" not in plan, plan
    assert "CartesianProduct" not in plan
    # one shuffle total: the groupBy("bucket") histogram
    assert plan.count("Exchange") <= 1, plan


def test_semantic_dedup_intracell_join_is_equi(spark, sf_dir):
    """SemDeDup's pairwise scoring must stay an equi join on the
    learned cell id (co-partitionable at scale) — a CartesianProduct
    here would mean the blocking key silently fell out of the join."""
    plan = _plan(spark, "dedup_semantic_kmeans", sf_dir)
    assert "CartesianProduct" not in plan
    # At fixture scale a dropped blocking key would surface as a
    # BroadcastNestedLoopJoin rather than a CartesianProduct — forbid both.
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Join" in plan


def test_sq8_plan_is_mapside_topk(spark, sf_dir):
    """SQ8 search must stay one scan: encode + dequantize + cosine as
    row-wise expressions under a TakeOrdered — zero Exchange means the
    4×-narrower code scan is the ONLY corpus-sized cost at 100 TB."""
    plan = _plan(spark, "vector_sq8_topk", sf_dir)
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan.split("TakeOrderedAndProject")[1]
    assert "BatchEvalPython" not in plan


def test_entity_resolution_pairs_are_blocked_equi(spark, sf_dir):
    """ER candidate generation must stay an equi join on the blocking
    key (Σ|block|², co-partitionable); a dropped key would surface as
    CartesianProduct / BroadcastNestedLoopJoin."""
    plan = _plan(spark, "graph_entity_resolution", sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_containment_single_pass_self_join(spark, sf_dir):
    """Both containment directions must come from ONE inverted-index
    self-join (exploded row-wise) — a union of per-direction selects
    would run the join + groupBy twice."""
    plan = _plan(spark, "dedup_containment", sf_dir)
    assert "Union" not in plan
    assert "Generate explode" in plan
    # exactly ONE inner shingle-keyed self-join (the max_posting cap
    # adds one LeftSemi on the shingle — that one is not the pair join)
    import re

    shingle_joins = [
        m.group(0)
        for m in re.finditer(
            r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin) \[shingle[^\n]*", plan
        )
        if "LeftSemi" not in m.group(0)
    ]
    assert len(shingle_joins) == 1, plan


def test_pq_adc_scan_is_mapside_topk(spark, sf_dir):
    """The PQ ADC read path must be ONE scan under TakeOrdered — the
    per-row cost is m array lookups on driver-computed distance
    tables, and no Exchange may appear (at 100 TB the scan reads
    m-byte codes; a shuffle or global sort here would move the whole
    corpus). Codebook training runs eagerly before this plan exists,
    so the plan IS the read path."""
    plan = _plan(spark, "vector_pq_adc_topk", sf_dir)
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan


def test_dsir_scoring_join_broadcasts_model(spark, sf_dir):
    """DSIR's B-row cell model must BROADCAST into the corpus-sized
    feature stream; a sort-merge join would shuffle every hashed
    feature occurrence by cell id. The only allowed corpus-sized
    Exchange is the per-doc aggregation."""
    plan = _plan(spark, "curation_dsir_weights", sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_cooccurrence_pair_join_is_doc_keyed_equi(spark, sf_dir):
    """Term-pair generation must stay a doc-keyed equi self-join of
    the (checkpointed) exploded term table — a dropped doc key would
    pair every term with every term. The ONE BroadcastNestedLoopJoin
    allowed is the scalar cross join attaching the 1-row corpus count
    N for PMI; the pair join itself must be hash-keyed on the doc id."""
    plan = _plan(spark, "graph_text_cooccurrence", sf_dir)
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") == 1  # the 1-row N join
    # the term table is localCheckpointed (ExistingRDD), and the pair
    # join consumes it through a doc-keyed equi hash join
    assert "Scan ExistingRDD" in plan
    assert "Join [_d" in plan.replace("BroadcastHashJoin [_d", "Join [_d").replace(
        "SortMergeJoin [_d", "Join [_d"
    )


def test_jaccard_verify_join_is_merge_not_broadcast(spark, sf_dir):
    """The candidate-keyed verification's (b, shingle) join is
    corpus-sized on both sides AND its shuffle output compresses ~10×
    (repeated shingle strings), so AQE's compressed-size estimate can
    slip under the broadcast threshold while the in-memory relation is
    GBs — observed as a driver OOM at the 100× fixture. The merge hint
    pins it to SortMergeJoin; this test pins the hint. The shingle-
    keyed join must appear as SMJ and never as a broadcast build."""
    plan = _plan(spark, "dedup_corpus_verified", sf_dir)
    smj_keys = [f.split("]", 1)[0] for f in plan.split("SortMergeJoin [")[1:]]
    assert any("shingle" in k for k in smj_keys), plan
    # no broadcast is ever keyed on the shingle column
    for frag in plan.split("BroadcastHashJoin")[1:]:
        keys = frag.split("]", 1)[0]
        assert "shingle" not in keys, plan


def test_aqe_splits_skewed_join_with_force_flag(spark):
    """AQE's skew-join split is the runtime half of the skew story
    (salted_join is the compile-time half). Two facts pinned here,
    both learned from the zipf fixture work:

    1. With thresholds scaled to the data, AQE splits the skewed
       partition of a SortMergeJoin — `skew=true` lands in the final
       adaptive plan and the skewed side's AQEShuffleRead says so.
    2. The split does NOT happen by default when the join output feeds
       another shuffle (the common analytic shape: join → agg): Spark
       declines to break the partitioning unless
       `spark.sql.adaptive.forceOptimizeSkewedJoin` is on. At 100 TB
       that conf — or pre-salting via key_skew_profile/salted_join —
       is what actually engages skew handling in real pipelines, and
       this test fails loudly if an upgrade changes that contract.
    """
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64k",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32k",
        "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        big = spark.range(200_000).select(
            F.when(F.col("id") < 150_000, 0)
            .otherwise(F.col("id") % 100 + 1)
            .alias("k"),
            F.col("id").alias("v"),
        )
        dim = spark.range(101).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        j = big.join(dim, "k").select(F.sum(F.col("v") + F.col("w")).alias("s"))
        [row] = j.collect()
        # values survive the split (same sum as the unsplit plan)
        expect = sum(
            v + 2 * (0 if v < 150_000 else v % 100 + 1) for v in range(200_000)
        )
        assert row.s == expect
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan
        assert "AQEShuffleRead" in plan and "skewed" in plan, plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_substring_removal_single_pass_plan(spark, sf_dir):
    """The stats+coverage aggregation of dedup_substring_removal is ONE
    pass: a split stats/coverage plan gave the shingle subtree two
    consumers and Catalyst re-derived the whole pipeline per branch
    (observed: 5 document scans / 16 exchanges before the rewrite, 3 /
    9 after). Pin the collapsed shape so a refactor cannot silently
    reintroduce the recomputation — and pin that the token-array
    payload column never rides a shuffle (slim positional rows only;
    the payload re-attaches once by id)."""
    plan = _plan(spark, "dedup_substring_removal", sf_dir)
    assert plan.count("FileScan") <= 3
    assert plan.count("Exchange") <= 9
    # no Exchange row may carry the materialized token arrays (_w):
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "_w#" not in line, line


def test_curation_e2e_bench_side_broadcasts(spark, sf_dir):
    """In the composed curation pipeline the decontamination join must
    broadcast the benchmark shingle side (it is eval-set sized, never
    corpus sized) — the property that keeps stage 4 map-side at
    100 TB."""
    plan = _plan(spark, "curation_end_to_end", sf_dir)
    assert "BroadcastHashJoin" in plan


def test_jaccard_verify_never_broadcasts_shingle_sides(spark, sf_dir):
    """Both corpus-shingle joins of the candidate-keyed Jaccard verify
    must be sort-merge: the shingle table is corpus-sized, highly
    compressible, and (when checkpointed) an ExistingRDD with no
    reliable size stats — the planner has twice chosen to BUILD a
    broadcast HashedRelation from it (r8: the (b, shingle) join; r11:
    the (a) join, once the mutate fixture stopped collapsing the
    corpus), a guaranteed driver OOM at scale. The merge hints pin the
    only join shape that survives any corpus size; per-doc size
    aggregates (sa/sb) staying broadcast is fine — they are slim."""
    from graphragdatapipeline_spark.io import read_table
    from graphragdatapipeline_spark.operators import dedup as dd

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    sh = dd.shingle_table(docs, "doc_id", "text", k=3)
    cands = dd.minhash_dedup_pairs(docs, "doc_id", "text")
    pairs = dd.jaccard_pairs(sh, "doc_id", threshold=0.2, candidates=cands)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    # the two shingle-keyed joins appear as SortMergeJoin on
    # (a) and on (b, shingle); no broadcast may carry a shingle column
    assert plan.count("SortMergeJoin") >= 2
    for ln in plan.splitlines():
        if "BroadcastExchange" in ln or "BroadcastHashJoin" in ln:
            assert "shingle" not in ln, ln


def test_span_removal_payload_join_is_sort_merge(spark, sf_dir):
    """The tokens⋈per re-attach of span removal joins two sides that
    are corpus-sized in every regime (token-array payload × covered-
    position arrays), and a checkpointed upstream strips the size
    stats the planner would need to know better — at sf10 it broadcast
    one side. Must be sort-merge; the sh⋈index df-lookup staying
    adaptive (broadcast while the vocabulary fits) is correct."""
    from graphragdatapipeline_spark.io import read_table
    from graphragdatapipeline_spark.operators import dedup as dd

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    out = dd.remove_duplicated_spans(docs, "doc_id", "text", k=3, min_df=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    for ln in plan.splitlines():
        if "BroadcastHashJoin" in ln and "doc_id" in ln:
            raise AssertionError(f"payload join broadcast: {ln.strip()}")
    assert "SortMergeJoin" in plan
