from graphragdatapipeline_spark.sources.cache import incremental_fetch  # noqa: F401
