#!/usr/bin/env python
"""Materialize an sf1.0-scale fixture by disjoint key-shifted 10×
replication of sf0.1 — the SCALE.md methodology, now covering every
driver table so the full headline bench can run at 10× data.

Each fact replica i shifts its keys by i × (max_key + 1), so joins
stay consistent inside a replica and NEVER match across replicas
(result cardinalities scale exactly 10×). Dimension tables
(nation/region) are copied 1× — at 100 TB dims stay small and
broadcast; inflating them would distort the join shapes the bench is
meant to measure. The embeddings query vector (vec_id = 0) exists
only in replica 0, keeping k-NN queries well-defined.

Usage: python scripts/make_scale_fixture.py [SRC_SF_DIR] [DST_DIR] [FACTOR]
Defaults: /root/testdata/sf0.1 → /tmp/sf1.0 × 10.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F  # noqa: E402

from graphragdatapipeline_spark.io import read_table  # noqa: E402
from graphragdatapipeline_spark.session import get_session  # noqa: E402

# table -> columns to shift (each by its own max+1 per replica)
SHIFT_COLS: dict[str, list[str]] = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "nation": [],  # dims: copied once, never replicated
    "region": [],
}

# shared key domains must shift by the SAME base in every table that
# carries them, or cross-table joins break
KEY_DOMAIN = {
    "c_custkey": "custkey",
    "o_custkey": "custkey",
    "o_orderkey": "orderkey",
    "l_orderkey": "orderkey",
    "l_partkey": "partkey",
    "p_partkey": "partkey",
    "l_suppkey": "suppkey",
    "s_suppkey": "suppkey",
}


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1.0"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_session(
        "scale-fixture", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    spark.sparkContext.setLogLevel("ERROR")

    # one pass to learn every shared key-domain base
    bases: dict[str, int] = {}
    for table, cols in SHIFT_COLS.items():
        if not cols:
            continue
        df = read_table(spark, src, table)
        maxes = df.agg(*[F.max(c).alias(c) for c in cols]).first()
        for c in cols:
            domain = KEY_DOMAIN.get(c, c)
            bases[domain] = max(bases.get(domain, 0), int(maxes[c]) + 1)

    for table, cols in SHIFT_COLS.items():
        df = read_table(spark, src, table)
        out = os.path.join(dst, table)
        if not cols:
            df.write.mode("overwrite").parquet(out)
            continue
        parts = []
        for i in range(factor):
            rep = df
            for c in cols:
                base = bases[KEY_DOMAIN.get(c, c)]
                rep = rep.withColumn(c, (F.col(c) + i * base).cast(df.schema[c].dataType))
            parts.append(rep)
        whole = parts[0]
        for p in parts[1:]:
            whole = whole.unionByName(p)
        whole.write.mode("overwrite").parquet(out)
        print(f"{table}: {factor}x -> {out}")
    spark.stop()


if __name__ == "__main__":
    main()
