"""Structured Streaming layer (SURVEY §2.13 — engine extension).

The reference has no true streaming; its closest analogues are
micro-batch slicing (ingest_vector_db.py:76-93) and async batch
fan-out (network_helpers.py:129-173). This module adds the real
thing over event tables: watermarked tumbling/sliding/session
windows, streaming dedup, and foreachBatch sinks mirroring the batch
ingestion assets.

Every operator is written against a plain DataFrame so the SAME code
runs in batch mode (driver correctness checks, backfills) and in
streaming mode (readStream input) — the Structured Streaming
unification. Window keys are emitted as epoch seconds: timezone-proof
across engines and serialization boundaries.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from graphragdatapipeline_spark.registry import dsum

EVENTS_DDL = (
    "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
    "event_type STRING, value DOUBLE, props STRING"
)


def read_events_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """S7-analog as a true stream: file-source readStream over a
    parquet directory (each new file = a micro-batch)."""
    return (
        spark.readStream.schema(EVENTS_DDL)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def with_watermark(df: DataFrame, delay: str = "1 hour") -> DataFrame:
    """Late-data bound; no-op on batch frames."""
    return df.withWatermark("ts", delay) if df.isStreaming else df


def tumbling_window_agg(df: DataFrame, width: str = "1 hour") -> DataFrame:
    """Tumbling event-time window per event_type: count + value sum.
    Batch and streaming share this plan; upstream adds the watermark
    in streaming mode."""
    w = F.window("ts", width)
    return (
        df.groupBy(w.alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value"), 2).alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_window_counts(
    df: DataFrame, width: str = "1 hour", slide: str = "30 minutes"
) -> DataFrame:
    """Sliding windows: each event lands in width/slide windows."""
    w = F.window("ts", width, slide)
    return (
        df.groupBy(w.alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "event_type",
            "n_events",
        )
    )


def session_windows(df: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Session windows per user: events within `gap` of each other
    merge. Native session_window works in both batch and streaming."""
    sw = F.session_window("ts", gap)
    return (
        df.groupBy(sw.alias("s"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value"), 2).alias("sum_value"),
        )
        .select(
            "user_id",
            F.unix_timestamp(F.col("s.start")).alias("session_start"),
            "n_events",
            "sum_value",
        )
    )


def windowed_distinct_users(
    df: DataFrame, width: str = "1 day", slide: str | None = None
) -> DataFrame:
    """Distinct active users per (optionally sliding) event-time
    window — the streaming-safe form of countDistinct.

    Streaming cannot run countDistinct inside a windowed aggregation
    (per-group distinct state is unbounded), so this uses the
    production two-phase pattern: project each event onto its
    window(s), drop duplicate (window, user) pairs — state is one row
    per pair, expired by the upstream watermark — then count rows per
    window. The batch twin is the identical plan with a plain
    dropDuplicates; both sides count each user once per window."""
    w = F.window("ts", width, slide or width)
    proj = df.select(w.alias("w"), "user_id")
    dd = proj.dropDuplicates(["w", "user_id"])
    return (
        dd.groupBy("w")
        .agg(F.count(F.lit(1)).alias("n_active"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "n_active",
        )
    )


def dedup_keep_first(
    df: DataFrame, keys: list[str], order_col: str = "ts", tiebreak: str = "event_id"
) -> DataFrame:
    """Streaming-dedup semantics in batch: keep the earliest row per
    key (deterministic tiebreak). In streaming mode use
    dropDuplicatesWithinWatermark(keys) — same contract under the
    watermark."""
    if df.isStreaming:
        return df.dropDuplicatesWithinWatermark(keys)
    w = Window.partitionBy(*keys).orderBy(F.asc(order_col), F.asc(tiebreak))
    return (
        df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
    )


def write_foreach_batch(
    stream_df: DataFrame,
    batch_fn,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
):
    """foreachBatch sink — the streaming mirror of the reference's
    batched upsert sinks (ingest_vector_db.py:181-204): each
    micro-batch DataFrame is handed to `batch_fn(df, epoch_id)`."""
    writer = stream_df.writeStream.foreachBatch(batch_fn).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def incremental_dedup_sink(
    stream_df: DataFrame,
    corpus_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Streaming corpus maintenance: every micro-batch of documents is
    exact-deduped against the ACCUMULATED fingerprint index
    (operators.dedup.exact_dedup_incremental), survivors appended to
    the corpus, their fingerprints to the index. Micro-batches run
    sequentially, so each sees every prior batch's index rows — the
    streaming form of the per-ingest maintenance job.

    Exactly-once caveat, stated honestly: two plain-parquet appends
    are not atomic under a retry between them; production pins this
    with a transactional table format (Delta/Iceberg) in the same
    foreachBatch. Until then the write ORDER makes a retry fail-safe:
    the fingerprint delta lands BEFORE the corpus append, so a retry
    that re-runs the batch sees its own fingerprints in the index and
    drops the docs — worst case a doc is missing (recoverable from the
    source), never duplicated in the corpus."""
    from pyspark.sql.utils import AnalysisException

    from graphragdatapipeline_spark.operators.dedup import (
        exact_dedup_incremental,
        fingerprint,
    )

    def batch_fn(df: DataFrame, epoch_id: int) -> None:
        spark = df.sparkSession
        try:
            idx = spark.read.parquet(index_dir)
        except AnalysisException:
            idx = None
        clean, _delta = exact_dedup_incremental(df, idx, id_col, text_col)
        clean = clean.localCheckpoint()  # one computation feeds both appends
        # Index first: a retry between the two appends re-filters the
        # batch against its own fingerprints → drops, never duplicates.
        clean.select(fingerprint(F.col(text_col)).alias("fp")).write.mode(
            "append"
        ).parquet(index_dir)
        clean.write.mode("append").parquet(corpus_dir)

    return write_foreach_batch(stream_df, batch_fn, checkpoint_dir)


def incremental_neardup_sink(
    stream_df: DataFrame,
    corpus_dir: str,
    band_index_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Near-duplicate streaming corpus maintenance — the MinHash twin
    of incremental_dedup_sink: each micro-batch computes its band
    table map-side, drops docs whose bands hit the ACCUMULATED index
    (a kept near-duplicate already represents them), LSH-dedups the
    survivors within the batch, then appends survivors to the corpus
    and their bands to the index. Same sequential-micro-batch and
    exactly-once caveats as the exact sink — and the same fail-safe
    write order: band delta BEFORE corpus, so a micro-batch retry
    drops rather than duplicates."""
    from pyspark.sql.utils import AnalysisException

    from graphragdatapipeline_spark.operators.dedup import minhash_dedup_incremental

    def batch_fn(df: DataFrame, epoch_id: int) -> None:
        spark = df.sparkSession
        try:
            idx = spark.read.parquet(band_index_dir)
        except AnalysisException:
            idx = None
        clean, band_delta = minhash_dedup_incremental(df, idx, id_col, text_col)
        clean = clean.localCheckpoint()
        band_delta = band_delta.localCheckpoint()
        band_delta.write.mode("append").parquet(band_index_dir)
        clean.write.mode("append").parquet(corpus_dir)

    return write_foreach_batch(stream_df, batch_fn, checkpoint_dir)


def click_purchase_attribution(
    clicks: DataFrame, purchases: DataFrame, horizon_minutes: int = 60
) -> DataFrame:
    """Stream-stream interval join: attribute each purchase to the
    same user's clicks in the preceding horizon (click ≤ purchase <
    click + horizon). In streaming mode both inputs carry watermarks
    and the time-bound lets Spark expire join state — unbounded
    stream-stream joins are impossible without it. Identical plan
    runs in batch for the oracle."""
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
    )
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (
            F.col("purchase_ts")
            < F.col("click_ts") + F.expr(f"INTERVAL {horizon_minutes} MINUTES")
        )
    )
    return c.join(p, cond).select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "purchase_id",
        (F.unix_timestamp("purchase_ts") - F.unix_timestamp("click_ts")).alias(
            "lag_seconds"
        ),
    )


def windowed_percentile(
    df: DataFrame, width: str = "1 hour", p: float = 0.5, accuracy: int = 10000
) -> DataFrame:
    """Windowed median monitoring — the latency-dashboard aggregation
    in its STREAMING-safe form: exact percentile needs every value
    (unbounded state), so the window aggregates the mergeable
    approx_percentile sketch instead, whose state is bounded by
    `accuracy` regardless of window volume. For windows smaller than
    `accuracy` rows the sketch stores all samples and the answer is
    the exact order statistic (merge-order independent), which is what
    makes the batch twin deterministic for the oracle. Same plan in
    batch and streaming; upstream adds the watermark."""
    w = F.window("ts", width)
    return (
        df.groupBy(w.alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.percentile_approx("value", F.lit(p), F.lit(accuracy)).alias("p_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "event_type",
            "n_events",
            "p_value",
        )
    )
