"""Shared SQL-oracle fragments and engine constants of the production
near-dup flow (MinHash chain, shingle CTE, verified-pair CTEs, the
bucket-cap guardrail). LEAF module by design: imported by BOTH
dedup_queries and curation_queries, so it must not import the registry
(or anything that triggers registry submodule loading) — a direct
`import registries.dedup_queries` used to deadlock in a circular
import when curation_queries' composed-pipeline oracle pulled these
names out of the partially-initialized dedup_queries module."""

from __future__ import annotations

NUM_HASHES = 16
BANDS = 4
_ROWS = NUM_HASHES // BANDS

_SHINGLES_CTE = r"""
toks AS (
  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS w
  FROM documents
), sh AS (
  SELECT doc_id, unnest(list_distinct(
    CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
         ELSE list_transform(generate_series(1, len(w) - 2),
              i -> concat_ws(' ', w[i], w[i+1], w[i+2])) END)) AS shingle
  FROM toks
)"""


def _minhash_oracle(max_bucket: int | None = None) -> str:
    n_salts = (NUM_HASHES + 3) // 4
    md5_cols = ", ".join(
        f"md5(concat('{g}|', shingle)) AS m{g}" for g in range(n_salts)
    )
    sig_cols = ",\n         ".join(
        f"min(substr(m{i // 4}, {1 + 8 * (i % 4)}, 8)) AS h{i}"
        for i in range(NUM_HASHES)
    )
    band_selects = []
    for b in range(BANDS):
        cols = ", ".join(f"h{b * _ROWS + r}" for r in range(_ROWS))
        band_selects.append(
            f"SELECT doc_id, {b} AS band_idx, md5(concat_ws('|', {cols})) AS band_hash FROM sig"
        )
    bands_sql = "\n  UNION ALL\n  ".join(band_selects)
    # The production guardrail mirrored in SQL: buckets above the cap
    # are excluded from pairwise candidate generation (a mega-bucket is
    # a duplicate CLUSTER, not a pair-scoring problem).
    bucket_filter = (
        ""
        if max_bucket is None
        else f"""QUALIFY count(*) OVER (PARTITION BY band_idx, band_hash) <= {max_bucket}"""
    )
    return f"""
WITH {_SHINGLES_CTE},
hashed AS (
  SELECT doc_id, {md5_cols} FROM sh
), sig AS (
  SELECT doc_id,
         {sig_cols}
  FROM hashed GROUP BY doc_id
), bands_all AS (
  {bands_sql}
), bands AS (
  SELECT * FROM bands_all
  {bucket_filter}
)
SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
FROM bands a JOIN bands b USING (band_idx, band_hash)
WHERE a.doc_id < b.doc_id
"""


def _verified_flow_ctes(
    threshold: float = 0.2, max_bucket: int | None = None
) -> str:
    """Shared CTE body for the production near-dup flow, through the
    `verified` pair set: minhash chain → (bucket-capped) candidate
    pairs → exact-Jaccard verification. Reused by the cleaned-corpus,
    cluster-assignment and keep-best oracles so all three gates verify
    the IDENTICAL pipeline."""
    base = _minhash_oracle(max_bucket=max_bucket).strip()
    body = base[len("WITH "):]
    head, final_select = body.rsplit("SELECT DISTINCT", 1)
    return f"""{head.rstrip().rstrip(",")},
cands AS (
  SELECT DISTINCT {final_select}
), sizes AS (
  SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id
), common AS (
  SELECT s1.doc_id AS a, s2.doc_id AS b, count(*) AS common
  FROM sh s1 JOIN sh s2 USING (shingle)
  WHERE s1.doc_id < s2.doc_id
  GROUP BY 1, 2
), verified AS (
  SELECT c.a, c.b
  FROM common c
  JOIN cands k ON c.a = k.a AND c.b = k.b
  JOIN sizes sa ON c.a = sa.doc_id
  JOIN sizes sb ON c.b = sb.doc_id
  WHERE c.common / (sa.sz + sb.sz - c.common) >= {threshold}
)"""


# Registered guardrail for the corpus-verified flow: honest-scale band
# buckets top out at 3–4 members (sf0.01 max 3 / sf0.1 max 4, p99.9 = 3
# at both), so >8 docs agreeing on a FULL band is a duplicate cluster,
# not a pair-scoring problem. Same philosophy as graph_triangle_count's
# max_forward_degree=160 default; the oracle mirrors the cap exactly.
MAX_BUCKET = 8
