"""Engine-side invariants of the composed GraphRAG pipeline query —
independent of the DuckDB oracle (which pins exact values at sf0.01),
these pin the structural contract of the pack stage and the stage
composition at the smallest fixture."""

from __future__ import annotations

from graphragdatapipeline_spark.registry import REGISTRY


def test_graphrag_end_to_end_pack_invariants(spark, sf_dir):
    rows = (
        REGISTRY["graphrag_end_to_end"]
        .fn(spark, sf_dir)
        .orderBy("position")
        .collect()
    )
    assert rows, "composed pipeline returned no packed context at fixture scale"
    # schema contract (the driver hashes these names — drift here breaks
    # the oracle silently-later; break it loudly here instead)
    assert list(rows[0].asDict()) == [
        "community", "member_count", "mention_count", "relevance",
        "n_tokens", "cum_tokens", "position", "context_block",
    ]
    # positions contiguous from 1, cum_tokens = prefix sums, budget held
    running = 0
    for i, r in enumerate(rows, start=1):
        assert r.position == i
        assert r.relevance >= 1
        assert r.member_count >= 1 and r.mention_count >= r.member_count
        running += r.n_tokens
        assert r.cum_tokens == running
        assert r.cum_tokens <= 400
        # the block is the rendered report of ITS community
        assert f"Community {r.community}:" in r.context_block
        # n_tokens is the block's whitespace token count
        assert r.n_tokens == len(r.context_block.split())
    # greedy packing is maximal: the next report (if any) would overflow —
    # implied by the filter; assert the packed set is non-trivial instead
    assert running <= 400
