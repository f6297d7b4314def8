"""LLM-adjacent operators (SURVEY §2.11 V5–V7): community naming,
prompt construction, and per-row generation with a pluggable
generator.

The reference generates community summaries with a local MLX model
(~45-70 s/community — docs/graphrag_community_workplan.md:132); the
engine treats generation as an injectable mapPartitions kernel so the
dataflow (prompt building, batching, joins) is testable with the
deterministic template stub while a real endpoint slots in unchanged.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def community_name(top_countries: Column, top_genres: Column) -> Column:
    """V6 — '{top_country} {top_genre}' with 'Electronic' fallback
    (reference generate_community_summaries.py:28-49)."""
    return F.concat_ws(
        " ",
        F.try_element_at(top_countries, F.lit(1)),
        F.coalesce(F.try_element_at(top_genres, F.lit(1)), F.lit("Electronic")),
    )


def build_prompt(
    name: Column, member_count: Column, top_tags: Column, representatives: Column
) -> Column:
    """V7 — prompt construction with [:7]/[:4] truncation
    (reference generate_community_summaries.py:52-83)."""
    return F.format_string(
        "Community: %s. Members: %d. Tags: %s. Representative artists: %s.",
        name,
        member_count.cast("int"),
        F.array_join(F.slice(top_tags, 1, 7), ", "),
        F.array_join(F.slice(representatives, 1, 4), ", "),
    )


def template_generator(rows: Iterator[dict]) -> Iterator[str]:
    """Deterministic stand-in for the LLM: a template summary derived
    from the prompt (keeps correctness gates meaningful)."""
    for row in rows:
        yield f"Summary of {row['name']}: a community of {row['member_count']} members."


def generate_summaries(
    df: DataFrame,
    generator: Callable[[Iterator[dict]], Iterator[str]] = template_generator,
) -> DataFrame:
    """V5 — per-row text generation via mapInPandas with an injected
    generator (reference llm_helpers.py:20-112 sequential loop becomes
    partition-parallel Arrow batches; a real model is loaded once per
    partition)."""
    from pyspark.sql.types import StringType, StructField, StructType

    out_schema = StructType(list(df.schema.fields) + [StructField("summary", StringType())])

    def run(batches):
        for pdf in batches:
            out = pdf.copy()
            out["summary"] = list(generator(iter(pdf.to_dict("records"))))
            yield out

    return df.mapInPandas(run, out_schema)
