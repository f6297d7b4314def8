"""Property-based tests (hypothesis) — randomized inputs against
independent Python reference implementations. Exceeds the reference's
test strategy (SURVEY §5: no property-based testing there); catches
the edge classes hand fixtures miss (empty strings, ties, unicode,
single-element lists).

Spark jobs per example are expensive, so examples are capped and
deadline disabled; the data shapes stay tiny."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SET = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

words = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd")), min_size=1, max_size=8
)


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 100), st.integers(0, 1000)),
        min_size=1,
        max_size=40,
    )
)
@SET
def test_dedup_by_priority_matches_reference(spark, rows):
    """Keep-first-per-key after priority sort == Python min-by."""
    from graphragdatapipeline_spark.operators.relational import dedup_by_priority

    df = spark.createDataFrame(rows, "k INT, prio INT, uid INT")
    got = dedup_by_priority(
        df, unique_cols=["k"], sort_col="prio", tiebreakers=["uid"]
    ).collect()
    expect = {}
    for k, prio, uid in rows:
        cur = expect.get(k)
        if cur is None or (prio, uid) < cur:
            expect[k] = (prio, uid)
    assert {(r.k, (r.prio, r.uid)) for r in got} == set(expect.items())
    assert len(got) == len(expect)


@given(items=st.lists(words, min_size=0, max_size=6))
@SET
def test_oxford_comma_matches_reference(spark, items):
    """F2 formatter == the reference algorithm (ordered dedup, Oxford
    comma at 3+, 'and' at 2, bare item at 1, '' at 0)."""
    from graphragdatapipeline_spark.functions import format_list_natural_language

    df = spark.createDataFrame([(items,)], "xs ARRAY<STRING>")
    got = df.select(format_list_natural_language(F.col("xs")).alias("s")).first().s
    deduped = list(dict.fromkeys(items))
    if not deduped:
        want = ""
    elif len(deduped) == 1:
        want = deduped[0]
    elif len(deduped) == 2:
        want = f"{deduped[0]} and {deduped[1]}"
    else:
        want = ", ".join(deduped[:-1]) + f", and {deduped[-1]}"
    assert got == want


@given(
    text=st.text(
        alphabet=st.characters(blacklist_categories=("Cs",)), min_size=1, max_size=300
    ),
    size=st.integers(20, 80),
    overlap=st.integers(0, 19),
)
@SET
def test_chunking_invariants(spark, text, size, overlap):
    """Chunks cover the text, each ≤ size chars, and stitching chunk
    i's non-overlap suffix reconstructs the document."""
    from graphragdatapipeline_spark.text.chunking import chunked_documents

    df = spark.createDataFrame([(1, text)], "doc_id INT, text STRING")
    rows = sorted(
        chunked_documents(df, "doc_id", "text", size=size, overlap=overlap).collect(),
        key=lambda r: r.chunk_index,
    )
    assert rows, "at least one chunk for non-empty text"
    step = size - overlap
    assert all(len(r.chunk_text) <= size for r in rows)
    rebuilt = rows[0].chunk_text
    for r in rows[1:]:
        rebuilt += r.chunk_text[overlap:] if len(r.chunk_text) > overlap else ""
    assert rebuilt == text
    assert rows[0].total_chunks == len(rows)
    starts = [(r.chunk_index - 1) * step for r in rows]
    assert all(s < len(text) for s in starts)


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 8), words), min_size=1, max_size=30
    )
)
@SET
def test_top_n_frequency_matches_reference(spark, rows):
    """A10 top-N frequency per group == Counter.most_common with the
    deterministic (count desc, item asc) tie-break."""
    from collections import Counter, defaultdict

    from graphragdatapipeline_spark.operators.relational import top_n_frequency

    df = spark.createDataFrame(rows, "g INT, item STRING")
    got = {
        r.g: list(r.top_item)
        for r in top_n_frequency(df, "g", "item", n=2).collect()
    }
    by_group = defaultdict(list)
    for g, item in rows:
        by_group[g].append(item)
    for g, items in by_group.items():
        counts = Counter(items)
        ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:2]
        assert got[g] == [k for k, _ in ranked], (g, counts)
