"""Pipeline runner (SURVEY §3.1 mapping).

The reference's orchestration layer is a Dagster asset DAG: assets
declare dependencies via parameters, the I/O manager persists each
output, checks gate quality (definitions.py:10-32). Here the DAG is
explicit and runs inside ONE SparkSession: stages are named
(spark, catalog) → DataFrame functions, outputs land as parquet
tables in a warehouse dir, checks are assertion queries. Dagster's
10-process decade fan-out collapses into Spark task parallelism; a
`partition_by` on a stage gives Hive-partitioned output (the decade
layout) with pruning for free."""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from graphragdatapipeline_spark.io import write_parquet


@dataclass
class Stage:
    name: str
    fn: Callable[[SparkSession, dict[str, DataFrame]], DataFrame]
    deps: list[str] = field(default_factory=list)
    partition_by: list[str] | None = None
    checks: list[Callable[[DataFrame], DataFrame]] = field(default_factory=list)


class CheckFailure(RuntimeError):
    pass


@dataclass
class Pipeline:
    stages: list[Stage]
    warehouse: str

    def _topo_order(self) -> list[Stage]:
        by_name = {s.name: s for s in self.stages}
        seen: dict[str, int] = {}
        order: list[Stage] = []

        def visit(s: Stage) -> None:
            state = seen.get(s.name, 0)
            if state == 1:
                raise ValueError(f"cycle at stage {s.name}")
            if state == 2:
                return
            seen[s.name] = 1
            for d in s.deps:
                if d not in by_name:
                    raise ValueError(f"stage {s.name} depends on unknown {d}")
                visit(by_name[d])
            seen[s.name] = 2
            order.append(s)

        for s in self.stages:
            visit(s)
        return order

    def table_path(self, name: str) -> str:
        return os.path.join(self.warehouse, name)

    def run(self, spark: SparkSession) -> dict[str, str]:
        """Execute topologically; returns stage → output path. Each
        stage reads upstream outputs from the warehouse (fresh lazy
        scans — lineage stays shallow, like the reference's
        materialize-then-rescan I/O managers)."""
        results: dict[str, str] = {}
        for stage in self._topo_order():
            catalog = {
                d: spark.read.parquet(self.table_path(d)) for d in stage.deps
            }
            out = stage.fn(spark, catalog)
            path = self.table_path(stage.name)
            write_parquet(out, path, partition_by=stage.partition_by)
            materialized = spark.read.parquet(path)
            for check in stage.checks:
                verdicts = check(materialized).collect()
                for row in verdicts:
                    if not row.passed:
                        raise CheckFailure(
                            f"stage {stage.name}: check {row.check_name} failed "
                            f"(observed={row.observed})"
                        )
            results[stage.name] = path
        return results
