#!/usr/bin/env python
"""Broadcast-shape audit at the NON-degenerate decade: run registry
queries against a mutate-mode 100x documents fixture and report every
BroadcastExchange in the EXECUTED plan together with what it builds
from — the r8/r11 OOM class is a corpus-sized build side chosen off
untrustworthy statistics (checkpointed ExistingRDD scans lose stats;
compressed shuffle estimates undershoot), and only a fixture whose
corpus does NOT collapse at exact-dedup makes the hazard visible.

A broadcast is flagged SUSPECT when its subtree row estimate is
missing AND its subtree mentions a corpus payload column (text/
shingle/_w/_cov/embedding) — slim dimension/aggregate broadcasts are
the point of AQE and stay unflagged.

Usage: python scripts/audit_broadcast_at_scale.py [FIXTURE_DIR] [query ...]
Defaults: /tmp/sfmut100 + the dedup/curation/text checkpoint-heavy set.
Prints one line per broadcast and a JSON summary; forces execution
with a noop write so AQE's final (runtime) plan is what gets audited.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from graphragdatapipeline_spark.registry import REGISTRY  # noqa: E402
from graphragdatapipeline_spark.session import get_session  # noqa: E402

DEFAULT_QUERIES = [
    "dedup_minhash_lsh",
    "dedup_corpus_verified",
    "dedup_cluster_assignments",
    "dedup_keep_best_by_quality",
    "dedup_containment",
    "dedup_ngram_jaccard",
    "dedup_simhash_pairs",
    "dedup_substring_removal",
    "dedup_exact",
    "curation_end_to_end",
    "curation_quality_classifier",
    "curation_decontaminate",
    "text_lm_quality_score",
    "text_lm_bigram_score",
    "text_tfidf_top_terms",
    "fulltext_bm25_topk",
]

PAYLOAD_MARKERS = ("text#", "shingle#", "_w#", "_cov#", "embedding#", "tok#")


def audit_plan(plan: str) -> list[dict]:
    """Extract each BroadcastExchange block and classify it."""
    lines = plan.splitlines()
    out = []
    for i, ln in enumerate(lines):
        if "BroadcastExchange" not in ln:
            continue
        indent = len(ln) - len(ln.lstrip(" :+-"))
        block = [ln]
        for nxt in lines[i + 1 : i + 12]:
            nindent = len(nxt) - len(nxt.lstrip(" :+-"))
            if nindent <= indent and ("+-" in nxt or ":-" in nxt):
                break
            block.append(nxt)
        text = "\n".join(block)
        payload = [m for m in PAYLOAD_MARKERS if m in text]
        out.append(
            {
                "build_head": block[1].strip()[:120] if len(block) > 1 else "",
                "payload_cols": payload,
                "suspect": bool(payload),
            }
        )
    return out


def main() -> None:
    fixture = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfmut100"
    names = sys.argv[2:] or DEFAULT_QUERIES
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
    spark = get_session(
        "bcast-audit", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    spark.sparkContext.setLogLevel("ERROR")
    summary = {}
    for name in names:
        if name not in REGISTRY:
            print(f"## {name}: NOT REGISTERED", flush=True)
            continue
        t0 = time.time()
        try:
            df = REGISTRY[name].fn(spark, fixture)
            df.write.format("noop").mode("overwrite").save()
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001 — audit must report, not die
            print(f"## {name}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
            summary[name] = "FAILED"
            continue
        rows = audit_plan(plan)
        suspects = [r for r in rows if r["suspect"]]
        summary[name] = {
            "wall_s": round(time.time() - t0, 1),
            "broadcasts": len(rows),
            "suspects": len(suspects),
        }
        print(f"## {name}: {len(rows)} broadcasts, {len(suspects)} suspect, "
              f"{summary[name]['wall_s']}s", flush=True)
        for r in rows:
            tag = "SUSPECT" if r["suspect"] else "ok"
            print(f"   [{tag}] {r['build_head']} {r['payload_cols']}", flush=True)
    print(json.dumps({"fixture": fixture, "summary": summary}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
