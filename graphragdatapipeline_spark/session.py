"""SparkSession factory with scale-oriented defaults.

The reference pipeline relies on Polars' lazy engine for pushdown and
streaming sinks (reference: defs/io_managers.py:96-140). On Spark the
equivalent work is Catalyst's — we only need to turn the right knobs:

- AQE on (runtime coalescing, skew-join splitting),
- Arrow on (vectorized pandas-UDF boundary for the few Python kernels),
- UTC session timezone so parquet NTZ/LTZ wall-clock values are stable
  across engines (the DuckDB oracle reads naive timestamps),
- shuffle partition count sized for the local harness but overridable
  via env for cluster deployment.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults tuned for the local[32] harness; on a real cluster these are
# overridden by spark-submit conf (documented in README).
_DEFAULTS = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # 96 MiB input splits: big enough to amortize task overhead locally,
    # small enough that a 100 TB table still yields ~1M tasks, not 10M.
    "spark.sql.files.maxPartitionBytes": "96m",
    "spark.sql.autoBroadcastJoinThreshold": "64m",
    "spark.sql.shuffle.partitions": "32",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    "spark.ui.enabled": "false",
}


def get_session(
    app_name: str = "graphragdatapipeline-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` locally; on a
    cluster, leave it unset and let spark-submit decide.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    builder = builder.master(master)
    conf = dict(_DEFAULTS)
    if shuffle_partitions is not None:
        conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
