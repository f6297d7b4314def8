"""graphragdatapipeline_spark — a PySpark-native analytics engine.

A brand-new engine re-expressing the query and data-processing
capabilities of the reference GraphRAG data pipeline
(pacoreyes/GraphRagDataPipeline) as idiomatic Spark:

- relational core (scan/filter/join/agg/window/topk/set-ops) on the
  DataFrame API, planned by Catalyst,
- a DataFrame-native property graph layer (vertices/edges tables) with
  edge derivation, motifs, transitive closure and community detection,
- text chunking / analysis, deduplication (exact, MinHash-LSH, SimHash,
  n-gram Jaccard), vector similarity search,
- a Structured Streaming layer over event tables,
- data-quality checks and a topological pipeline runner.

Everything is designed for a multi-executor cluster at ~100 TB scale:
broadcast joins for dimensions, partial aggregation, salting-free
explode+window top-k patterns, checkpointed iterative fixpoints.
"""

__version__ = "0.1.0"

from graphragdatapipeline_spark.session import get_session  # noqa: F401
