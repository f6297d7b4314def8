#!/usr/bin/env python
"""Deterministic CLUSTERED embeddings fixture for ANN recall curves.

The driver fixture's embeddings are hash-derived i.i.d.-uniform — the
no-structure worst case where bucketed ANN provably cannot be
sublinear, so the r9 recall curves (SCALE.md) are LOWER bounds. Real
corpora embed into clusters (near-duplicate-rich text, topical
manifolds); this generator produces the matching BEST-understood case:
a mixture of Gaussians on the unit sphere, so the r10 curves bracket
reality from the other side.

Shape: n vectors, 64-dim, n_clusters centers drawn uniformly on the
sphere, per-cluster sigma drawn log-uniform in [0.05, 0.25] (tight
near-dup clusters AND diffuse topics), cluster sizes Zipf-ish (s=1.2)
— hot topics dominate, matching web-corpus topic frequency. All
randomness from one seeded NumPy Generator; output is byte-stable for
a given (n, n_clusters, seed).

Schema matches the driver fixture exactly (vec_id int64,
embedding list<float>, label int32 = cluster id), so every registry
query and scripts/ann_recall_curves.py run on it unchanged.

Usage: python scripts/make_clustered_embeddings.py OUT_DIR [N] [C] [SEED]
Defaults: /tmp/emb-clustered 20000 64 7
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def make(out_dir: str, n: int = 20000, n_clusters: int = 64, seed: int = 7) -> str:
    rng = np.random.default_rng(seed)
    dim = 64
    centers = rng.standard_normal((n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    sigmas = np.exp(rng.uniform(np.log(0.05), np.log(0.25), n_clusters))
    # Zipf-ish cluster sizes: weight 1/rank^1.2, largest first.
    w = 1.0 / np.arange(1, n_clusters + 1) ** 1.2
    sizes = np.maximum(1, np.floor(w / w.sum() * n).astype(np.int64))
    sizes[0] += n - sizes.sum()  # exact total
    labels = np.repeat(np.arange(n_clusters, dtype=np.int32), sizes)
    noise = rng.standard_normal((n, dim))
    vecs = centers[labels] + noise * sigmas[labels, None]
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    # Shuffle so vec_id order carries no cluster signal (the recall
    # script uses vec_id 1..8 as LSH planes and 100..115 as queries —
    # they must be a random sample of the mixture, not one cluster).
    perm = rng.permutation(n)
    vecs, labels = vecs[perm], labels[perm]
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(1, n + 1), pa.int64()),
            "embedding": pa.array(
                [row for row in vecs.astype(np.float32)],
                pa.list_(pa.float32()),
            ),
            "label": pa.array(labels, pa.int32()),
        }
    )
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "embeddings.parquet")
    pq.write_table(tbl, path)
    return path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/emb-clustered"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 20000
    c = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    seed = int(sys.argv[4]) if len(sys.argv) > 4 else 7
    print(make(out, n, c, seed))
