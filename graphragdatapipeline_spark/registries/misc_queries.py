"""Quality-check gates + multimodal registry queries."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphragdatapipeline_spark import checks as ck
from graphragdatapipeline_spark.io import read_table
from graphragdatapipeline_spark.multimodal.blob import (
    blob_features,
    blob_table_from_documents,
)
from graphragdatapipeline_spark.registry import register


@register(
    "quality_check_gates",
    oracle="""
SELECT 'customer_no_nulls' AS check_name,
       sum(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END)
         + sum(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END) = 0 AS passed
FROM customer
UNION ALL
SELECT 'customer_unique_keys',
       COALESCE(sum(CASE WHEN n > 1 THEN n ELSE 0 END), 0) = 0
FROM (SELECT c_custkey, count(*) AS n FROM customer GROUP BY c_custkey)
UNION ALL
SELECT 'orders_completeness',
       avg(CASE WHEN o_totalprice > 0 THEN 1.0 ELSE 0.0 END) >= 0.5
FROM orders
UNION ALL
SELECT 'lineitems_per_order',
       CAST(count(*) AS DOUBLE) / count(DISTINCT l_orderkey) >= 1.0
FROM lineitem
UNION ALL
SELECT 'lineitem_no_null_keys',
       sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END)
         + sum(CASE WHEN l_partkey IS NULL THEN 1 ELSE 0 END) = 0
FROM lineitem
""",
)
def quality_check_gates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1–Q5 — the reference's five asset checks (defs/checks.py:14-159)
    mapped onto the fixture tables, one gate table."""
    customer = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    lineitem = read_table(spark, sf_dir, "lineitem")
    gates = ck.run_checks(
        [
            ck.check_no_nulls(customer, ["c_custkey", "c_name"], "customer_no_nulls"),
            ck.check_no_duplicates(customer, ["c_custkey"], "customer_unique_keys"),
            ck.check_completeness_ratio(
                orders, F.col("o_totalprice") > 0, 0.5, "orders_completeness"
            ),
            ck.check_ratio_per_key(lineitem, "l_orderkey", 1.0, "lineitems_per_order"),
            ck.check_no_nulls(
                lineitem, ["l_orderkey", "l_partkey"], "lineitem_no_null_keys"
            ),
        ]
    )
    return gates.select("check_name", "passed")


@register(
    "multimodal_blob_features",
    oracle="""
SELECT concat('doc-', doc_id) AS blob_id,
       'text/plain' AS media_type,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(text) AS content_hash
FROM documents
""",
)
def multimodal_blob_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing end-to-end: documents → binary blob table →
    mapInPandas feature extraction (deterministic stub codec). The
    oracle pins byte counts + content hashes — proof the binary
    round-trip is faithful."""
    d = read_table(spark, sf_dir, "documents")
    blobs = blob_table_from_documents(d)
    feats = blob_features(blobs, feature_dim=8)
    return feats.select("blob_id", "media_type", "n_bytes", "content_hash")
