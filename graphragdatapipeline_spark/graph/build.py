"""Graph construction: edge derivation from domain tables (SURVEY §2.9
G4–G8) and from the driver's TPC-H-ish fixtures.

The reference derives 5 edge types inside Neo4j Cypher
(ingest_graph_db.py:218-296); here each derivation is a DataFrame
transform producing rows for the ``edges`` table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphragdatapipeline_spark.graph.model import PropertyGraph
from graphragdatapipeline_spark.io import read_table


# --- Domain derivations (artist/genre/country/release tables) -------------


def plays_genre_edges(artists: DataFrame) -> DataFrame:
    """G4 — explode artists.genres → (artist, genre) edges
    (ingest_graph_db.py:218-230)."""
    return (
        artists.filter(F.col("genres").isNotNull())
        .select(F.col("id").alias("src"), F.explode("genres").alias("dst"))
        .filter(F.col("dst").isNotNull())
        .withColumn("rel_type", F.lit("PLAYS_GENRE"))
    )


def similar_to_edges(artists: DataFrame) -> DataFrame:
    """G5/J5 — SIMILAR_TO via the name-OR-alias disjunctive match
    (ingest_graph_db.py:234-248), rewritten as a union of two equi
    joins (SURVEY §4: Catalyst won't split an OR join itself; the
    nested-loop fallback is O(n·m) and dies at scale).

    Edge (a → t) exists when a lists s in similar_artists and
    t.name == s  OR  s ∈ t.aliases, with self-loops excluded."""
    sim = (
        artists.filter(F.col("similar_artists").isNotNull())
        .select(F.col("id").alias("src"), F.explode("similar_artists").alias("sim_name"))
    )
    by_name = sim.join(
        artists.select(F.col("id").alias("dst"), F.col("name").alias("sim_name")),
        "sim_name",
    )
    by_alias = sim.join(
        artists.filter(F.col("aliases").isNotNull()).select(
            F.col("id").alias("dst"), F.explode("aliases").alias("sim_name")
        ),
        "sim_name",
    )
    return (
        by_name.select("src", "dst")
        .unionByName(by_alias.select("src", "dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .withColumn("rel_type", F.lit("SIMILAR_TO"))
    )


def performed_by_edges(releases: DataFrame) -> DataFrame:
    """G6 — (release → artist) projection (ingest_graph_db.py:252-263)."""
    return (
        releases.filter(F.col("artist_id").isNotNull())
        .select(F.col("id").alias("src"), F.col("artist_id").alias("dst"))
        .withColumn("rel_type", F.lit("PERFORMED_BY"))
    )


def subgenre_of_edges(genres: DataFrame) -> DataFrame:
    """G7 — explode parent_ids, exclude self-loops
    (ingest_graph_db.py:266-280)."""
    return (
        genres.filter(F.col("parent_ids").isNotNull())
        .select(F.col("id").alias("src"), F.explode("parent_ids").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .withColumn("rel_type", F.lit("SUBGENRE_OF"))
    )


def from_country_edges(artists: DataFrame, countries: DataFrame) -> DataFrame:
    """G8/J6 — natural-key join on country *name* (not id)
    (ingest_graph_db.py:284-295). Country dim is tiny → broadcast."""
    return (
        artists.filter(F.col("country").isNotNull())
        .join(
            F.broadcast(countries.select(F.col("id").alias("dst"), F.col("name").alias("country"))),
            "country",
        )
        .select(F.col("id").alias("src"), "dst")
        .withColumn("rel_type", F.lit("FROM_COUNTRY"))
    )


def build_domain_graph(
    artists: DataFrame,
    genres: DataFrame,
    countries: DataFrame,
    releases: DataFrame,
) -> PropertyGraph:
    """Full 5-edge-type property graph, mirroring the reference's Neo4j
    schema (README.md:344-388) as two DataFrames."""
    vertices = (
        artists.select("id", F.lit("Artist").alias("label"), "name")
        .unionByName(genres.select("id", F.lit("Genre").alias("label"), "name"))
        .unionByName(countries.select("id", F.lit("Country").alias("label"), "name"))
        .unionByName(releases.select("id", F.lit("Release").alias("label"), F.col("title").alias("name")))
    )
    edges = (
        plays_genre_edges(artists)
        .unionByName(similar_to_edges(artists))
        .unionByName(performed_by_edges(releases))
        .unionByName(subgenre_of_edges(genres))
        .unionByName(from_country_edges(artists, countries))
    )
    return PropertyGraph(vertices=vertices, edges=edges)


# --- Fixture graph (driver tables) -----------------------------------------


def build_tpch_graph(spark: SparkSession, sf_dir: str) -> PropertyGraph:
    """Analog graph over the driver fixtures: Customer/Supplier/Nation/
    Region vertices; IN_NATION / LOCATED_IN / IN_REGION edges."""
    c = read_table(spark, sf_dir, "customer")
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region")
    vertices = (
        c.select(
            F.concat(F.lit("C"), F.col("c_custkey")).alias("id"),
            F.lit("Customer").alias("label"),
            F.col("c_name").alias("name"),
        )
        .unionByName(
            s.select(
                F.concat(F.lit("S"), F.col("s_suppkey")).alias("id"),
                F.lit("Supplier").alias("label"),
                F.col("s_name").alias("name"),
            )
        )
        .unionByName(
            n.select(
                F.concat(F.lit("N"), F.col("n_nationkey")).alias("id"),
                F.lit("Nation").alias("label"),
                F.col("n_name").alias("name"),
            )
        )
        .unionByName(
            r.select(
                F.concat(F.lit("R"), F.col("r_regionkey")).alias("id"),
                F.lit("Region").alias("label"),
                F.col("r_name").alias("name"),
            )
        )
    )
    edges = (
        c.select(
            F.concat(F.lit("C"), F.col("c_custkey")).alias("src"),
            F.concat(F.lit("N"), F.col("c_nationkey")).alias("dst"),
            F.lit("IN_NATION").alias("rel_type"),
        )
        .unionByName(
            s.select(
                F.concat(F.lit("S"), F.col("s_suppkey")).alias("src"),
                F.concat(F.lit("N"), F.col("s_nationkey")).alias("dst"),
                F.lit("LOCATED_IN").alias("rel_type"),
            )
        )
        .unionByName(
            n.select(
                F.concat(F.lit("N"), F.col("n_nationkey")).alias("src"),
                F.concat(F.lit("R"), F.col("n_regionkey")).alias("dst"),
                F.lit("IN_REGION").alias("rel_type"),
            )
        )
    )
    return PropertyGraph(vertices=vertices, edges=edges)
