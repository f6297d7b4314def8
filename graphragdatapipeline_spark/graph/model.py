"""DataFrame-native property graph (SURVEY §1.1).

The reference materializes its graph into Neo4j (5 node labels, 5 edge
types — ingest_graph_db.py:62-333) and pulls it back out for analytics
(detect_communities.py:43-97). Here the graph *is* two DataFrames —
``vertices(id, label, name, …)`` and ``edges(src, dst, rel_type)`` —
so "ingestion" is a parquet write and every traversal is a Catalyst-
planned join. No external round-trip, no driver bottleneck.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class PropertyGraph:
    vertices: DataFrame  # id, label, name, ...
    edges: DataFrame  # src, dst, rel_type

    def validate_edges(self) -> DataFrame:
        """G2 — drop edges whose endpoints are unknown (reference drops
        them while building the igraph at neo4j_helpers.py:196-234).
        Two left-semi joins; Catalyst broadcasts the vertex side when
        small."""
        v_ids = self.vertices.select(F.col("id"))
        e = self.edges
        e = e.join(v_ids.withColumnRenamed("id", "src"), "src", "left_semi")
        e = e.join(v_ids.withColumnRenamed("id", "dst"), "dst", "left_semi")
        return e

    def filter_label(self, label: str) -> DataFrame:
        """G1 — node pull by label (Cypher `MATCH (n:Label)`)."""
        return self.vertices.filter(F.col("label") == label)

    def filter_rel(self, rel_type: str) -> DataFrame:
        return self.edges.filter(F.col("rel_type") == rel_type)

    def undirected_edges(self) -> DataFrame:
        """Symmetrize for undirected algorithms (reference builds an
        undirected igraph — neo4j_helpers.py:228-230). Self-loops are
        dropped; duplicate (src,dst) pairs collapse."""
        e = self.edges.select("src", "dst")
        sym = e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        return sym.filter(F.col("src") != F.col("dst")).distinct()

    def label_counts(self) -> DataFrame:
        """A14 — row-count validation per label (reference
        ingest_graph_db.py:336-363)."""
        return self.vertices.groupBy("label").count()
