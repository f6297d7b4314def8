"""Engine-extension queries: analytic frames, grouping sets,
pagination, normalization — capabilities SURVEY §2 marks as absent in
the reference but cheap/valuable on Spark (§2.5/§2.4 notes)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from graphragdatapipeline_spark import functions as ef
from graphragdatapipeline_spark.io import read_table
from graphragdatapipeline_spark.registry import dround, register


@register(
    "window_running_total",
    oracle="""
SELECT o_custkey AS custkey, o_orderkey AS orderkey,
       floor((sum(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS UNBOUNDED PRECEDING)) * 100 + 0.5) / 100 AS running_total
FROM orders
""",
)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running aggregate over an explicit frame (extension: reference
    has no rowsBetween — SURVEY §2.5 note). Frame order is a total
    order, so the fold sequence — and the doubles — match engines."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return read_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("orderkey"),
        dround(F.sum("o_totalprice").over(w), 2).alias("running_total"),
    )


@register(
    "window_lead_lag",
    oracle="""
SELECT o_custkey AS custkey, o_orderkey AS orderkey,
       CAST(epoch(o_orderdate) - epoch(lag(o_orderdate) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)) AS BIGINT)
       AS secs_since_prev,
       lead(o_orderstatus) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_status
FROM orders
""",
)
def window_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lead/lag analytics (extension)."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    o = read_table(spark, sf_dir, "orders")
    return o.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("orderkey"),
        (
            F.unix_timestamp("o_orderdate")
            - F.unix_timestamp(F.lag("o_orderdate").over(w))
        ).alias("secs_since_prev"),
        F.lead("o_orderstatus").over(w).alias("next_status"),
    )


@register(
    "grouping_rollup",
    oracle="""
SELECT COALESCE(r.r_name, '<all>') AS region,
       COALESCE(n.n_name, '<all>') AS nation,
       count(*) AS n_customers
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY ROLLUP (r.r_name, n.n_name)
""",
)
def grouping_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (extension — SURVEY §2.4 note: free via
    Catalyst)."""
    c = read_table(spark, sf_dir, "customer")
    n = F.broadcast(read_table(spark, sf_dir, "nation"))
    r = F.broadcast(read_table(spark, sf_dir, "region"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .select(
            F.coalesce("r_name", F.lit("<all>")).alias("region"),
            F.coalesce("n_name", F.lit("<all>")).alias("nation"),
            "n_customers",
        )
    )


@register(
    "offset_pagination",
    oracle="""
SELECT o_orderkey AS orderkey, o_custkey AS custkey
FROM orders ORDER BY o_orderkey LIMIT 50 OFFSET 100
""",
)
def offset_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3 — LIMIT/OFFSET pagination (reference SPARQL pagination at
    build_artist_index.py:66-68), native offset since Spark 3.4."""
    return (
        read_table(spark, sf_dir, "orders")
        .orderBy("o_orderkey")
        .offset(100)
        .limit(50)
        .select(F.col("o_orderkey").alias("orderkey"), F.col("o_custkey").alias("custkey"))
    )


@register(
    "normalize_text_chain",
    oracle=r"""
SELECT doc_id,
       trim(regexp_replace(regexp_replace(regexp_replace(
         text, '\\"', '"', 'g'), '[\n\r]+', ' ', 'g'), '\s+', ' ', 'g')) AS normalized
FROM documents
""",
)
def normalize_text_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 (native chain) — unescape, newline collapse, whitespace
    collapse, trim (reference data_transformation_helpers.py:20-86;
    the NFKC repair step is the optional pandas-UDF variant,
    unit-tested separately)."""
    d = read_table(spark, sf_dir, "documents")
    return d.select("doc_id", ef.normalize_text(F.col("text")).alias("normalized"))


@register(
    "approx_count_distinct",
    oracle="""
SELECT count(DISTINCT l_partkey) AS exact_parts, true AS within_10pct
FROM lineitem
""",
)
def approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 scale path — HLL approximate distinct. Sketch values differ
    per engine, so the oracle pins the checkable contract instead:
    the exact count plus a 10%-band accuracy flag (rsd=0.02 → a 10%
    miss is a 5-sigma event, deterministic in practice)."""
    li = read_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.countDistinct("l_partkey").alias("exact_parts"),
        (
            F.abs(
                F.approx_count_distinct("l_partkey", 0.02)
                - F.countDistinct("l_partkey")
            )
            <= F.countDistinct("l_partkey") * 0.10
        ).alias("within_10pct"),
    )


@register(
    "grouping_cube",
    oracle="""
SELECT COALESCE(c_mktsegment, '<all>') AS segment,
       COALESCE(n.n_name, '<all>') AS nation,
       count(*) AS n_customers
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY CUBE (c_mktsegment, n.n_name)
""",
)
def grouping_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets (extension — SURVEY §2.4: absent in the
    reference, free via Catalyst; completes rollup/cube pair)."""
    c = read_table(spark, sf_dir, "customer")
    n = F.broadcast(read_table(spark, sf_dir, "nation"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .cube("c_mktsegment", "n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .select(
            F.coalesce("c_mktsegment", F.lit("<all>")).alias("segment"),
            F.coalesce("n_name", F.lit("<all>")).alias("nation"),
            "n_customers",
        )
    )
