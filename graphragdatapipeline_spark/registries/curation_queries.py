"""Training-data curation registry queries (engine extensions beyond
the reference's chunk→embed→ingest surface — its pipeline ends at
ChromaDB upsert, scripts/create_chunks_embeddings.py:1-120). These are
the corpus-curation steps an LLM training pipeline runs downstream:
reproducible sampling/splits, token-budget sequence packing, and
benchmark decontamination. All pure DataFrame expressions with exact
DuckDB value oracles."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphragdatapipeline_spark.io import read_table
from graphragdatapipeline_spark.operators import curation as cu
from graphragdatapipeline_spark.registry import register

# DuckDB twin of curation.hash_bucket: first 8 md5 nibbles of the
# string-cast key as an unsigned 32-bit int, mod the bucket count.
_BUCKET_SQL = (
    "(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 10000)"
)


@register(
    "curation_sample_split",
    oracle=f"""
SELECT doc_id,
       CASE WHEN {_BUCKET_SQL} < 1000 THEN 'test' ELSE 'train' END AS split
FROM documents
WHERE {_BUCKET_SQL} < 2500
""",
)
def curation_sample_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 25% sample of documents with a 10% test split.

    Membership is a property of the row's key hash, not the run —
    stable across partitionings, retries, and engines (df.sample()
    guarantees none of these). Map-side only: no shuffle at any scale.
    """
    d = read_table(spark, sf_dir, "documents")
    labeled = cu.train_test_split(d, "doc_id", test_rate=0.1)
    return cu.deterministic_sample(labeled, "doc_id", rate=0.25).select(
        "doc_id", "split"
    )


@register(
    "curation_pack_sequences",
    oracle="""
SELECT doc_id, lang,
       CAST(floor((sum(n_chars) OVER w - n_chars) / 4000.0) AS BIGINT)
         AS seq_index,
       CAST((sum(n_chars) OVER w - n_chars) % 4000 AS BIGINT) AS seq_offset
FROM documents
WINDOW w AS (PARTITION BY lang ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
""",
)
def curation_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offset-pack documents into ~4000-char training sequences per
    language shard: seq_index = floor(exclusive prefix sum / budget).

    One window (= one shuffle on the shard key) regardless of corpus
    size; no sequential driver loop, identical at any parallelism."""
    d = read_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return cu.pack_into_sequences(
        d, shard_col="lang", order_cols=["doc_id"], token_col="n_chars", budget=4000
    ).select("doc_id", "lang", "seq_index", "seq_offset")


@register(
    "curation_decontaminate",
    oracle=r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS w
  FROM documents
), sh AS (
  SELECT doc_id, unnest(list_distinct(
    CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
         ELSE list_transform(generate_series(1, len(w) - 2),
              i -> concat_ws(' ', w[i], w[i+1], w[i+2])) END)) AS shingle
  FROM toks
), bench AS (
  SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0
), shared AS (
  SELECT s.doc_id, count(DISTINCT s.shingle) AS shared_shingles
  FROM sh s JOIN bench USING (shingle)
  GROUP BY 1
)
SELECT d.doc_id,
       COALESCE(x.shared_shingles, 0) AS shared_shingles,
       COALESCE(x.shared_shingles, 0) >= 2 AS contaminated
FROM documents d LEFT JOIN shared x USING (doc_id)
""",
)
def curation_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flag documents sharing >=2 distinct 3-gram shingles with a
    benchmark set (here: every 97th doc, standing in for an eval set).

    Inverted-index shaped: docs meet benchmark rows only on shared
    shingles and the benchmark side is broadcast — at 100 TB this is a
    map-side join plus one doc-keyed aggregation, never a cross join."""
    d = read_table(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 97 == 0)
    return cu.decontaminate(
        d, bench, id_col="doc_id", text_col="text", k=3, min_shared=2
    )
