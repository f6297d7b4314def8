"""Measure the vendored pure-Python Leiden at REFERENCE scale.

The reference runs leidenalg (C core) over its full entity graph —
~99k nodes / ~124k edges — at resolutions 2.0 / 0.5 / 0.1, seed 42,
with a documented end-to-end budget of ~5-10 minutes for the whole
3-level ladder (reference docs/graphrag_community_workplan.md:68,
utils/neo4j_helpers.py:237-268). This script builds a deterministic
synthetic graph with those exact dimensions and community structure
(planted partition: Zipf-ish community sizes, intra spanning trees +
extra intra edges, sparse inter-community edges — the shape of an
entity co-mention graph) and times `leiden_membership` at each
resolution, printing one JSON line for SCALE.md.

Run: python scripts/bench_leiden_scale.py [n_nodes n_edges]
"""

from __future__ import annotations

import json
import random
import sys
import time

sys.path.insert(0, ".")

from graphragdatapipeline_spark.graph.leiden import leiden_membership, rb_quality


def make_entity_graph(
    n_nodes: int = 99_000, n_edges: int = 124_000, seed: int = 42
) -> list[tuple[int, int, float]]:
    """Deterministic planted-partition graph at entity-graph sparsity
    (avg degree ~2.5): communities sized 3..~600 (heavy-tailed), each
    internally connected by a random spanning tree plus extra intra
    edges, with the remaining budget spent on inter-community edges."""
    rng = random.Random(seed)
    sizes: list[int] = []
    total = 0
    while total < n_nodes:
        # heavy-tailed sizes: mostly small entities clusters, a few hubs
        s = min(3 + int(rng.paretovariate(1.3)), 600, n_nodes - total)
        if n_nodes - total - s < 3:
            s = n_nodes - total
        sizes.append(s)
        total += s

    edges: set[tuple[int, int]] = set()
    comm_nodes: list[tuple[int, int]] = []  # (start, size)
    start = 0
    for s in sizes:
        comm_nodes.append((start, s))
        for i in range(start + 1, start + s):  # spanning tree
            j = rng.randrange(start, i)
            edges.add((j, i))
        start += s

    # extra intra edges: densify communities until ~85% of the budget
    intra_budget = int(n_edges * 0.85)
    attempts = 0
    while len(edges) < intra_budget and attempts < n_edges * 20:
        attempts += 1
        cs, csz = comm_nodes[rng.randrange(len(comm_nodes))]
        if csz < 3:
            continue
        u = rng.randrange(cs, cs + csz)
        v = rng.randrange(cs, cs + csz)
        if u != v:
            edges.add((min(u, v), max(u, v)))

    # inter-community edges for the rest
    while len(edges) < n_edges:
        u = rng.randrange(n_nodes)
        v = rng.randrange(n_nodes)
        if u != v:
            edges.add((min(u, v), max(u, v)))
    return [(u, v, 1.0) for u, v in sorted(edges)]


def main() -> None:
    n_nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 99_000
    n_edges = int(sys.argv[2]) if len(sys.argv) > 2 else 124_000
    t0 = time.perf_counter()
    edges = make_entity_graph(n_nodes, n_edges)
    gen_s = time.perf_counter() - t0

    out: dict[str, object] = {
        "n_nodes": n_nodes,
        "n_edges": len(edges),
        "gen_sec": round(gen_s, 2),
        "resolutions": {},
    }
    total = 0.0
    for gamma in (2.0, 0.5, 0.1):  # the reference's 3-level ladder
        t0 = time.perf_counter()
        memb = leiden_membership(n_nodes, edges, gamma=gamma, seed=42)
        dt = time.perf_counter() - t0
        total += dt
        q = rb_quality(n_nodes, edges, memb, gamma)
        out["resolutions"][str(gamma)] = {
            "sec": round(dt, 2),
            "n_communities": len(set(memb)),
            "rb_quality": round(q, 1),
        }
    out["total_sec"] = round(total, 2)
    out["reference_budget_sec"] = [300, 600]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
