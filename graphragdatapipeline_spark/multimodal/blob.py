"""Multimodal columns: opaque binary payloads + typed metadata
(north-star extension — image/audio/video for LLM training data).

Design: media is an opaque `binary` column with a media_type and a
typed metadata struct (BLOB_SCHEMA). Decode / feature-extract /
resize / frame-sample run as Arrow-batched kernels over mapInPandas —
the Spark-side plumbing (schema, batching, partitioning) is real and
tested; the codec step itself is STUBBED (image/audio libraries are
not in this container): `decode_media` raises NotImplementedError
for real codecs and provides a deterministic fake for `text/plain`
payloads so the batch shape and schema contract are exercised
end-to-end.

At 100 TB: blobs dominate bytes, so the table is written with the
payload column LAST (parquet column pruning skips it for metadata
queries), partitioned by media_type, and feature extraction uses
mapInPandas with small `maxRecordsPerBatch` to bound executor memory
per Arrow batch.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DDL = (
    "blob_id STRING, media_type STRING, n_bytes BIGINT, "
    "content_hash STRING, feature_dim INT, features ARRAY<FLOAT>"
)


def blob_table_from_documents(documents: DataFrame) -> DataFrame:
    """Build a blob table from the documents fixture: payload = UTF-8
    bytes of the text, media_type = text/plain. (Real sources land
    image/audio bytes the same way.)"""
    return documents.select(
        F.concat(F.lit("doc-"), F.col("doc_id")).alias("blob_id"),
        F.lit("text/plain").alias("media_type"),
        F.length(F.col("text")).cast("long").alias("n_bytes"),
        F.struct(
            F.lit(None).cast("long").alias("width"),
            F.lit(None).cast("long").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.lit("utf-8").alias("codec"),
        ).alias("meta"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),  # payload LAST
    )


def decode_media(payload: bytes, media_type: str):
    """Codec dispatch. Real codecs are stubbed in this environment."""
    if media_type == "text/plain":
        return payload.decode("utf-8")
    raise NotImplementedError(
        f"codec for {media_type} not available in this environment; "
        "plug a decoder (PIL/librosa/pyav) into this dispatch point"
    )


def blob_features(blobs: DataFrame, feature_dim: int = 8, batch_size: int = 256) -> DataFrame:
    """Feature extraction over mapInPandas: per Arrow batch, decode
    (stub) and emit (hash, deterministic pseudo-features). The
    features for text/plain are a stable md5-seeded projection —
    a faithful stand-in for an image/audio encoder's output shape."""

    def extract(batches: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        for pdf in batches:
            out_rows = []
            for _, row in pdf.iterrows():
                payload = bytes(row["payload"])
                digest = hashlib.md5(payload).hexdigest()
                feats = [
                    (int(hashlib.md5(f"{i}|{digest}".encode()).hexdigest()[:8], 16) / 2**32)
                    for i in range(feature_dim)
                ]
                out_rows.append(
                    {
                        "blob_id": row["blob_id"],
                        "media_type": row["media_type"],
                        "n_bytes": len(payload),
                        "content_hash": digest,
                        "feature_dim": feature_dim,
                        "features": feats,
                    }
                )
            yield pd.DataFrame(out_rows)

    spark = blobs.sparkSession
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_size))
    return blobs.mapInPandas(extract, FEATURE_DDL)


def resize_media(blobs: DataFrame, target_bytes: int = 256, batch_size: int = 256) -> DataFrame:
    """Resize/downsample plumbing over mapInPandas: per Arrow batch,
    decode (stub dispatch), clip the payload to target_bytes, emit the
    resized blob + its hash. For real images this is where
    PIL.Image.resize plugs in; the deterministic byte-clip keeps the
    schema/batching/hash contract testable without codecs."""
    out_ddl = (
        "blob_id STRING, media_type STRING, orig_bytes BIGINT, "
        "resized_bytes BIGINT, resized_hash STRING, payload BINARY"
    )

    def resize(batches: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        for pdf in batches:
            out_rows = []
            for _, row in pdf.iterrows():
                payload = bytes(row["payload"])
                decode_media(payload, row["media_type"])  # codec dispatch point
                resized = payload[:target_bytes]
                out_rows.append(
                    {
                        "blob_id": row["blob_id"],
                        "media_type": row["media_type"],
                        "orig_bytes": len(payload),
                        "resized_bytes": len(resized),
                        "resized_hash": hashlib.md5(resized).hexdigest(),
                        "payload": resized,
                    }
                )
            yield pd.DataFrame(out_rows)

    spark = blobs.sparkSession
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_size))
    return blobs.mapInPandas(resize, out_ddl)


def frame_sample_stub(blobs: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: emits (blob_id, frame_idx) rows
    for blobs with a duration, one per `every_ms`. The decode of the
    actual frame bytes is the stubbed codec step."""
    n_frames = F.greatest(
        (F.col("meta.duration_ms") / every_ms).cast("long"), F.lit(1)
    )
    return blobs.filter(F.col("meta.duration_ms").isNotNull()).select(
        "blob_id",
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
    )


def waveform_stats(blobs: DataFrame, batch_size: int = 256) -> DataFrame:
    """Audio-style numeric feature extraction plumbing: treat the
    payload as 8-bit samples and emit mean amplitude + RMS. Real
    audio decode (librosa/pyav) plugs into the same kernel; sums are
    computed in exact integer arithmetic so the oracle (ASCII codes in
    SQL for text payloads) matches bit-for-bit."""
    out_ddl = (
        "blob_id STRING, n_samples BIGINT, mean_amp DOUBLE, rms_amp DOUBLE"
    )

    def stats(batches: Iterator) -> Iterator:
        import math

        import pandas as pd

        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                payload = bytes(row["payload"])
                decode_media(payload, row["media_type"])  # codec dispatch point
                n = len(payload)
                s = sum(payload)
                sq = sum(b * b for b in payload)
                rows.append(
                    {
                        "blob_id": row["blob_id"],
                        "n_samples": n,
                        "mean_amp": s / n if n else None,
                        "rms_amp": math.sqrt(sq / n) if n else None,
                    }
                )
            yield pd.DataFrame(rows)

    spark = blobs.sparkSession
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_size))
    return blobs.mapInPandas(stats, out_ddl)
