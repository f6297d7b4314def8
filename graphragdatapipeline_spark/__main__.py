"""CLI entry point — the engine as an operable product.

The reference is driven through the Dagster CLI/UI ("Materialize
all", per-asset runs — README.md:735). The Spark engine's equivalent:

    python -m graphragdatapipeline_spark query <name> [--sf-dir DIR] [-n 20]
    python -m graphragdatapipeline_spark list
    python -m graphragdatapipeline_spark checks [--sf-dir DIR]
    python -m graphragdatapipeline_spark bench

`query` runs any registered query and shows rows; `checks` runs the
data-quality gates (reference defs/checks.py) and exits non-zero on
failure — the CI shape of Dagster's asset checks.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="graphragdatapipeline_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    q = sub.add_parser("query", help="run a registered query and print rows")
    q.add_argument("name")
    q.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    q.add_argument("-n", type=int, default=20, help="rows to show")

    sub.add_parser("list", help="list registered queries")

    c = sub.add_parser("checks", help="run data-quality gates (exit 1 on failure)")
    c.add_argument("--sf-dir", default="/root/testdata/sf0.01")

    sub.add_parser("bench", help="run the benchmark (one JSON line)")

    comp = sub.add_parser(
        "compact", help="compact small parquet files (optional clustering)"
    )
    comp.add_argument("src_dir")
    comp.add_argument("dst_dir")
    comp.add_argument(
        "--target-mb", type=int, default=128, help="target MB per output file"
    )
    comp.add_argument(
        "--cluster-by", default=None, help="comma-separated range-cluster columns"
    )
    comp.add_argument(
        "--zorder-by", default=None, help="comma-separated Z-order columns"
    )

    ci = sub.add_parser(
        "compact-index",
        help="compact a streaming index's committed epochs into one "
        "pre-aggregated generation (substring | cooccurrence | neardup | vector)",
    )
    ci.add_argument("kind", choices=["substring", "cooccurrence", "neardup", "vector"])
    ci.add_argument("index_dir")
    ci.add_argument(
        "--corpus-dir",
        default=None,
        help="neardup only: the corpus dir whose _commits govern the band index",
    )
    ci.add_argument(
        "--id-col",
        default="vec_id",
        help="vector only: the upsert id column (latest-wins key)",
    )
    ci.add_argument(
        "--vec-col",
        default="embedding",
        help="vector only: the vector column (NULL marks a tombstone)",
    )
    ci.add_argument(
        "--gc",
        action="store_true",
        help="delete superseded epoch dirs + the previous generation "
        "(run quiesced — same contract as compact)",
    )

    sk = sub.add_parser(
        "skew", help="profile key skew of a table column (top-k heavy keys)"
    )
    sk.add_argument("table")
    sk.add_argument("key")
    sk.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    sk.add_argument("-k", type=int, default=10)

    args = p.parse_args(argv)

    if args.cmd == "bench":
        import bench  # repo-root harness

        bench.main()
        return 0

    from graphragdatapipeline_spark.registry import REGISTRY

    if args.cmd == "list":
        for name, qd in sorted(REGISTRY.items()):
            kind = "oracle" if qd.oracle else "rows-only"
            star = " *" if qd.headline else ""
            print(f"{name}  [{kind}]{star}")
        return 0

    from graphragdatapipeline_spark.session import get_session

    spark = get_session("graphragdatapipeline-cli")
    spark.sparkContext.setLogLevel("ERROR")

    if args.cmd == "query":
        if args.name not in REGISTRY:
            print(f"unknown query: {args.name}", file=sys.stderr)
            return 2
        REGISTRY[args.name].fn(spark, args.sf_dir).show(args.n, truncate=60)
        return 0

    if args.cmd == "checks":
        rows = REGISTRY["quality_check_gates"].fn(spark, args.sf_dir).collect()
        failed = [r for r in rows if not r.passed]
        for r in rows:
            print(f"{'PASS' if r.passed else 'FAIL'}  {r.check_name}")
        return 1 if failed else 0

    if args.cmd == "compact":
        from graphragdatapipeline_spark.io import compact_parquet

        n = compact_parquet(
            spark,
            args.src_dir,
            args.dst_dir,
            target_bytes_per_file=args.target_mb * 1024 * 1024,
            cluster_by=args.cluster_by.split(",") if args.cluster_by else None,
            zorder_by=args.zorder_by.split(",") if args.zorder_by else None,
        )
        print(f"wrote {n} files to {args.dst_dir}")
        return 0

    if args.cmd == "compact-index":
        from graphragdatapipeline_spark.streaming import ops as so

        if args.kind == "substring":
            upto = so.compact_substring_index(spark, args.index_dir, gc=args.gc)
        elif args.kind == "cooccurrence":
            upto = so.compact_cooccurrence_index(spark, args.index_dir, gc=args.gc)
        elif args.kind == "vector":
            upto = so.compact_vector_index(
                spark,
                args.index_dir,
                id_col=args.id_col,
                vec_col=args.vec_col,
                gc=args.gc,
            )
        else:
            if not args.corpus_dir:
                print("neardup requires --corpus-dir", file=sys.stderr)
                return 2
            upto = so.compact_neardup_band_index(
                spark, args.index_dir, args.corpus_dir, gc=args.gc
            )
        print(f"compacted {args.index_dir} up to epoch {upto}")
        return 0

    if args.cmd == "skew":
        from graphragdatapipeline_spark.io import read_table
        from graphragdatapipeline_spark.operators.relational import key_skew_profile

        key_skew_profile(
            read_table(spark, args.sf_dir, args.table), args.key, top_k=args.k
        ).show(args.k, truncate=False)
        return 0

    return 2


if __name__ == "__main__":
    raise SystemExit(main())
