"""The reference's full asset DAG (README.md:282-295, 12 assets) as an
engine Pipeline over the domain tables — discovery → enrichment →
dims → graph → communities → articles → chunks → vector collection.

Each stage body is the Spark re-expression of the named reference
asset; together they prove the engine runs the reference's workload
end-to-end, not just operator-by-operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphragdatapipeline_spark import checks as ck
from graphragdatapipeline_spark import functions as ef
from graphragdatapipeline_spark import llm
from graphragdatapipeline_spark.graph import algorithms as ga
from graphragdatapipeline_spark.graph import build as gb
from graphragdatapipeline_spark.operators import relational as rel
from graphragdatapipeline_spark.pipeline import Pipeline, Stage
from graphragdatapipeline_spark.text import chunking as tc
from graphragdatapipeline_spark.vector import similarity as vs


def build_domain_pipeline(
    warehouse: str,
    artist_index_raw: DataFrame,
    artists_raw: DataFrame,
    genres_raw: DataFrame,
    countries_raw: DataFrame,
    releases_raw: DataFrame,
    tracks_raw: DataFrame,
    articles_raw: DataFrame,
) -> Pipeline:
    """Wire the 12-asset DAG. Raw inputs are captured in closures (in
    production they are parquet scans; in tests, in-memory fixtures)."""

    # 1. build_artist_index (build_artist_index.py:171-197): decade
    # partition + dedup-by-priority on (artist_uri, name) by start_date.
    def artist_index(spark, cat):
        decade = F.concat(
            (F.substring("start_date", 1, 3)), F.lit("0s")
        ).alias("decade")
        deduped = rel.dedup_by_priority(
            artist_index_raw,
            unique_cols=["artist_uri", "name"],
            sort_col="start_date",
            tiebreakers=["artist_uri", "name"],
        )
        return deduped.select("*", decade)

    # 2. extract_artists (extract_artists.py:261-321): latin-name filter
    # + validation predicate (mbid AND country present).
    def artists(spark, cat):
        return artists_raw.filter(
            ef.is_latin_script(F.col("name"))
            & F.col("mbid").isNotNull()
            & F.col("country").isNotNull()
        )

    # 3/4. dims (extract_genres.py / extract_countries.py)
    def genres(spark, cat):
        return genres_raw

    def countries(spark, cat):
        return countries_raw

    # 5. extract_releases + best-release pick (musicbrainz_helpers.py:280-308)
    def releases(spark, cat):
        return rel.best_row_per_group(
            releases_raw,
            ["id"],
            [F.coalesce(F.col("year"), F.lit(9999)).asc(), F.asc("title")],
        )

    # 6. tracks with ordinal positions (ingest_graph_db.py:90-107)
    def tracks_rolled(spark, cat):
        from pyspark.sql import Window

        w = Window.partitionBy("album_id").orderBy("src_order", "id")
        positioned = tracks_raw.withColumn(
            "entry", ef.positioned_entry(F.row_number().over(w), F.col("title"))
        ).withColumn("pos", F.row_number().over(w))
        return rel.collect_list_sorted(
            positioned, ["album_id"], "pos", F.col("entry"), alias="tracks"
        )

    # 7. graph_db (ingest_graph_db.py:62-333): vertices + 5 edge types.
    def graph_vertices(spark, cat):
        g = gb.build_domain_graph(
            cat["artists"], cat["genres"], cat["countries"], cat["releases"]
        )
        return g.vertices

    def graph_edges(spark, cat):
        g = gb.build_domain_graph(
            cat["artists"], cat["genres"], cat["countries"], cat["releases"]
        )
        from graphragdatapipeline_spark.graph.model import PropertyGraph

        return PropertyGraph(vertices=cat["graph_vertices"], edges=g.edges).validate_edges()

    # 8. detect_communities (detect_communities.py:177-333)
    def communities(spark, cat):
        artist_ids = cat["graph_vertices"].filter(F.col("label") == "Artist").select("id")
        assign = ga.detect_communities(
            cat["graph_vertices"].select("id"),
            cat["graph_edges"].filter(
                F.col("rel_type").isin("SIMILAR_TO", "PLAYS_GENRE")
            ),
            seed=42,
        )
        return assign.join(artist_ids, "id", "left_semi")

    # 9. community metadata + naming/summaries (template generator)
    def community_summaries(spark, cat):
        members = cat["communities"].join(
            cat["artists"].select(F.col("id"), "country", "genres"), "id"
        )
        base = members.groupBy(F.col("community_L1").alias("community_id")).agg(
            F.count(F.lit(1)).alias("member_count"),
            F.array_sort(F.collect_list("id")).alias("member_ids"),
        )
        top_countries = rel.top_n_frequency(
            members.select(F.col("community_L1").alias("cid"), "country"),
            "cid",
            "country",
            n=3,
        )
        meta = base.join(
            top_countries.withColumnRenamed("cid", "community_id"), "community_id", "left"
        ).select(
            "community_id",
            "member_count",
            "member_ids",
            F.coalesce("top_country", F.array().cast("array<string>")).alias(
                "top_countries"
            ),
        )
        named = meta.withColumn(
            "name",
            llm.community_name(F.col("top_countries"), F.array().cast("array<string>")),
        )
        return llm.generate_summaries(
            named.select("community_id", "member_count", "name")
        )

    # 10/11. articles → merge → chunks (extract_*_articles.py + merge)
    def article_chunks(spark, cat):
        sections = tc.parse_sections(articles_raw, "text")
        docs = sections.select(
            F.col("qid"),
            F.concat_ws(
                " ",
                F.lit("search_document: Topic:"),
                F.col("title"),
                F.lit("(Section:"),
                F.concat(F.col("section_name"), F.lit(")")),
                F.lit("|"),
                ef.normalize_text(F.col("section_content")),
            ).alias("document"),
        )
        return tc.chunked_documents(docs, "qid", "document", size=400, overlap=100)

    # 12. vector collection (ingest_vector_db.py): embed + upsert-dedup.
    def vector_collection(spark, cat):
        embed = vs.embed_text_udf(dim=32)
        chunks = cat["article_chunks"]
        new = chunks.select(
            F.col("chunk_id").alias("id"),
            F.col("chunk_text").alias("document"),
            embed(F.col("chunk_text")).alias("embedding"),
        )
        empty = new.limit(0)
        return vs.upsert_dedup(new, empty, "id")

    return Pipeline(
        warehouse=warehouse,
        stages=[
            Stage("artist_index", artist_index, partition_by=["decade"], checks=[
                lambda df: ck.check_no_nulls(df, ["artist_uri", "name"], "index_keys"),
                lambda df: ck.check_no_duplicates(df, ["artist_uri"], "index_unique"),
            ]),
            Stage("artists", artists, checks=[
                lambda df: ck.check_no_nulls(df, ["id", "name"], "artist_keys"),
            ]),
            Stage("genres", genres, checks=[
                lambda df: ck.check_no_nulls(df, ["name"], "genre_names"),
            ]),
            Stage("countries", countries),
            Stage("releases", releases, checks=[
                lambda df: ck.check_no_duplicates(df, ["id"], "release_unique"),
            ]),
            Stage("tracks_rolled", tracks_rolled),
            Stage("graph_vertices", graph_vertices,
                  deps=["artists", "genres", "countries", "releases"]),
            Stage("graph_edges", graph_edges,
                  deps=["artists", "genres", "countries", "releases", "graph_vertices"]),
            Stage("communities", communities, deps=["graph_vertices", "graph_edges"]),
            Stage("community_summaries", community_summaries,
                  deps=["communities", "artists"]),
            Stage("article_chunks", article_chunks),
            Stage("vector_collection", vector_collection, deps=["article_chunks"]),
        ],
    )
