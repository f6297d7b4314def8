"""Declared StructType schemas for the engine's domain tables.

The reference auto-derives Polars schemas from msgspec models
(reference: src/data_pipeline/models.py:16-202). We declare the Spark
equivalents explicitly: all fields nullable, list[str] → ArrayType,
nested metadata → nested StructType.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def _s(name: str) -> StructField:
    return StructField(name, StringType(), True)


def _arr(name: str) -> StructField:
    return StructField(name, ArrayType(StringType(), True), True)


def _i(name: str) -> StructField:
    return StructField(name, LongType(), True)


# Artist model (models.py:16-27)
ARTIST_SCHEMA = StructType(
    [
        _s("id"),
        _s("name"),
        _s("mbid"),
        _s("country"),
        _arr("aliases"),
        _arr("genres"),
        _arr("tags"),
        _arr("similar_artists"),
    ]
)

# Genre model (models.py:30-37)
GENRE_SCHEMA = StructType([_s("id"), _s("name"), _arr("aliases"), _arr("parent_ids")])

# Release model (models.py:40-47)
RELEASE_SCHEMA = StructType([_s("id"), _s("title"), _i("year"), _s("artist_id")])

# Track model (models.py:50-56) + engine-added stable ordering column
# (Spark shuffles destroy implicit row order — SURVEY §7.3).
TRACK_SCHEMA = StructType([_s("id"), _s("title"), _s("album_id"), _i("src_order")])

# Country model (models.py:59-65)
COUNTRY_SCHEMA = StructType([_s("id"), _s("name"), _arr("aliases")])

# Article with nested metadata (models.py:68-97)
ARTICLE_METADATA_SCHEMA = StructType(
    [
        _s("title"),
        _s("name"),
        _s("entity_type"),
        _arr("aliases"),
        _arr("tags"),
        _arr("similar_artists"),
        _arr("genres"),
        _i("inception_year"),
        _s("country"),
        _s("wikipedia_url"),
        _s("wikidata_uri"),
        _i("chunk_index"),
        _i("total_chunks"),
    ]
)
ARTICLE_SCHEMA = StructType(
    [_s("id"), StructField("metadata", ARTICLE_METADATA_SCHEMA, True), _s("article")]
)

# Community assignment / community metadata (models.py:104-134)
COMMUNITY_ASSIGNMENT_SCHEMA = StructType(
    [
        _s("artist_id"),
        _s("artist_name"),
        _i("community_L0"),
        _i("community_L1"),
        _i("community_L2"),
    ]
)
COMMUNITY_SCHEMA = StructType(
    [
        _i("community_id"),
        _i("level"),
        _s("entity_type"),
        _i("member_count"),
        _arr("top_tags"),
        _arr("top_genres"),
        _arr("top_countries"),
        _arr("representative_artists"),
        _arr("member_ids"),
        _s("name"),
        _s("summary"),
    ]
)

# Property-graph tables (SURVEY §1.1)
VERTEX_SCHEMA = StructType([_s("id"), _s("label"), _s("name")])
EDGE_SCHEMA = StructType([_s("src"), _s("dst"), _s("rel_type")])

# Multimodal blob table: opaque binary payload + typed metadata
# (engine extension for LLM training-data pipelines).
BLOB_SCHEMA = StructType(
    [
        _s("blob_id"),
        StructField("payload", BinaryType(), True),
        _s("media_type"),  # image/png, audio/wav, video/mp4, text/plain
        _i("n_bytes"),
        StructField(
            "meta",
            StructType([_i("width"), _i("height"), _i("duration_ms"), _s("codec")]),
            True,
        ),
    ]
)
